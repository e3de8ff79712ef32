"""MFU probe round 3: CLEAN harness.

mfu_probe2's mm1 came out at 0.11 of peak -- impossible for the MXU and exactly
the HBM-bandwidth + harness cost: the scan harness perturbed the [589824,256]
bf16 input (0.74 ms/iter of HBM traffic) and reduced the [589824,256] f32
OUTPUT outside the kernel (another 0.74 ms), swamping the 0.39 ms matmul. The
chain numbers carried the same ~1.5 ms pollution -> "0.60 of peak" was a
HARNESS artifact, not kernel inefficiency.

This probe perturbs a TINY operand (the first weight, 128 KB) and reduces
outputs IN-KERNEL to [1, tile] rows, so the timed loop carries only the real
kernel traffic: stream the input tiles once, write ~2.3 MB of row-sums.

Variants (tile 4096, P = 589824):
  chain8      - 8-layer relu chain, in-kernel rowsum out. Input h0 streams
                302 MB (0.37 ms at 819 GB/s, overlappable with 3.14 ms MXU).
  full        - production kernel_t forward, REAL [P,37] f32 out (as shipped).
  full_rowsum - same compute, rowsum out (isolates the 87 MB out DMA).
  trunkpe     - PE + trunk only, rowsum out.
  headsonly   - heads only from a [P,256] bf16 input, rowsum out.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev/mfu_probe3.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmnerf_tpu.core.mlp import init_dm_nerf
from dmnerf_tpu.kernels import fused_mlp as FM

P_TOTAL = 589824
W = 256
INS = 32
PEAK = 197e12
TILE = 4096
N_RAYS, N_SAMP = 3072, 192

rng = np.random.RandomState(0)
params = init_dm_nerf(jax.random.PRNGKey(0), ins_num=INS)
kinds = tuple(FM._layer_kinds(8, (4,)))
flat = FM._pack(params, 10, 4, 8, (4,))
layout = FM._fuse_layout([w.shape for w in flat[::2]])
fused = [w.astype(jnp.bfloat16) if i % 2 == 0 else w
         for i, w in enumerate(FM._fuse_ops(flat, layout))]
n_pairs = len(flat) // 2
C4 = INS + 1 + 4
FpT = jnp.asarray(FM._freq_matrix(10).T)

xT = jnp.asarray(rng.randn(3, P_TOTAL).astype(np.float32))
edT = jnp.asarray(rng.randn(FM._emb_dim(4), P_TOTAL)
                  .astype(np.float32)).astype(jnp.bfloat16)
h0 = jnp.asarray(rng.randn(P_TOTAL, W).astype(np.float32)).astype(jnp.bfloat16)


def scan_time_smallperturb(fn, ops, pidx, R=20, iters=4):
    """ms/call; perturbs ONLY ops[pidx] (keep it tiny) with the zero carry."""

    @jax.jit
    def run(*ops):
        def body(c, _):
            o = list(ops)
            o[pidx] = o[pidx] + c.astype(o[pidx].dtype)
            out = fn(*o)
            return jnp.sum(out).astype(jnp.float32) * 0.0, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=R)
        return c

    _ = float(run(*ops))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(*ops)
    _ = float(out)
    return (time.perf_counter() - t0) / (iters * R) * 1e3


def report(name, ms, flops):
    tf = flops / (ms * 1e-3) / 1e12
    print(f"  {name:12s}: {ms:7.3f} ms  {tf:6.1f} TF/s  ({tf/(PEAK/1e12):.3f} of peak)")


def colspec(width, tile=TILE):
    return pl.BlockSpec((width, tile), lambda i: (0, i), memory_space=pltpu.VMEM)


def rowspec(width, tile=TILE):
    return pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM)


def constspec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


# ---- chain8 with in-kernel rowsum out -------------------------------------

ws8 = [jnp.asarray(rng.randn(W, W).astype(np.float32) * 0.05).astype(jnp.bfloat16)
       for _ in range(8)]
bs8 = [jnp.asarray(rng.randn(1, W).astype(np.float32) * 0.05) for _ in range(8)]
wops8 = []
for w, b in zip(ws8, bs8):
    wops8 += [w, b]


def k_chain_rowsum(*refs):
    w0_ref, h_ref, wrefs, out_ref = refs[0], refs[1], refs[2:17], refs[17]
    h = h_ref[:]
    h = jnp.maximum(jax.lax.dot_general(
        h, w0_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + refs[2][:], 0.0).astype(jnp.bfloat16)
    for l in range(1, 8):
        pre = jax.lax.dot_general(h, wrefs[2 * l - 1][:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        h = jnp.maximum(pre + wrefs[2 * l][:], 0.0).astype(jnp.bfloat16)
    out_ref[:] = jnp.sum(h.astype(jnp.float32), axis=1, keepdims=True)


def chain_call(w0, h):
    # w0 first (the perturbed operand), then h tiles, then remaining 15 wops
    return pl.pallas_call(
        k_chain_rowsum,
        out_shape=jax.ShapeDtypeStruct((P_TOTAL, 1), jnp.float32),
        grid=(P_TOTAL // TILE,),
        in_specs=[constspec(w0.shape), rowspec(W)] + [constspec(o.shape)
                                                      for o in wops8[1:]],
        out_specs=rowspec(1),
        compiler_params=FM._COMPILER_PARAMS,
    )(w0, h, *wops8[1:])


print("== clean harness (perturb 128 KB weight, in-kernel reductions) ==")
ms = scan_time_smallperturb(chain_call, (ws8[0], h0), pidx=0)
report("chain8", ms, 2 * P_TOTAL * 8 * W * W)

# ---- full production forward: real out vs rowsum out ----------------------

FULL_FLOPS = P_TOTAL * 2 * (63 * W + 6 * W * W + (W + 63) * W + W * (2 * W + 1)
                            + (W + 27) * (W // 2) + (W // 2) * 3 + W * (W // 2)
                            + (W // 2) * (INS + 1))

kern_full = functools.partial(FM._fwd_kernel_pet, kinds, layout, n_pairs, W, W,
                              jnp.bfloat16, 10, False)


def full_call(FpT_op, xT_op, edT_op):
    return pl.pallas_call(
        kern_full,
        out_shape=jax.ShapeDtypeStruct((P_TOTAL, C4), jnp.float32),
        grid=(P_TOTAL // TILE,),
        in_specs=[colspec(3), colspec(edT.shape[0]), constspec(FpT.shape)]
        + [constspec(o.shape) for o in fused],
        out_specs=rowspec(C4),
        compiler_params=FM._COMPILER_PARAMS,
    )(xT_op, edT_op, FpT_op, *fused)


ms = scan_time_smallperturb(full_call, (FpT, xT, edT), pidx=0)
report("full", ms, FULL_FLOPS)


def k_full_rowsum(*refs):
    n_ops = 2 * len(layout)
    (xT_ref, edT_ref, FpT_ref), wrefs, (out_ref,) = \
        refs[:3], refs[3:3 + n_ops], refs[3 + n_ops:]
    eT = FM._pe_transposed(xT_ref[:], FpT_ref[:], 10, False).astype(jnp.bfloat16)
    out, _ = FM._forward_core(eT, edT_ref[:], FM._load_wv(wrefs, layout, n_pairs),
                              kinds, W, W, jnp.bfloat16, want_cache=False,
                              transposed=True)
    out_ref[:] = jnp.sum(out, axis=1, keepdims=True)


def full_rowsum_call(FpT_op, xT_op, edT_op):
    return pl.pallas_call(
        k_full_rowsum,
        out_shape=jax.ShapeDtypeStruct((P_TOTAL, 1), jnp.float32),
        grid=(P_TOTAL // TILE,),
        in_specs=[colspec(3), colspec(edT.shape[0]), constspec(FpT.shape)]
        + [constspec(o.shape) for o in fused],
        out_specs=rowspec(1),
        compiler_params=FM._COMPILER_PARAMS,
    )(xT_op, edT_op, FpT_op, *fused)


ms = scan_time_smallperturb(full_rowsum_call, (FpT, xT, edT), pidx=0)
report("full_rowsum", ms, FULL_FLOPS)

# ---- trunk+PE only / heads only -------------------------------------------

TRUNK_FLOPS = P_TOTAL * 2 * (63 * W + 6 * W * W + (W + 63) * W)
HEAD_FLOPS = FULL_FLOPS - TRUNK_FLOPS


def k_trunkpe(*refs):
    n_ops = 2 * len(layout)
    (xT_ref, FpT_ref), wrefs, (out_ref,) = refs[:2], refs[2:2 + n_ops], refs[2 + n_ops:]
    eT = FM._pe_transposed(xT_ref[:], FpT_ref[:], 10, False).astype(jnp.bfloat16)
    wv = FM._load_wv(wrefs, layout, n_pairs)
    it = iter(wv)
    h = None
    for kind in kinds:
        w, b = next(it), next(it)
        if kind == "emb0":
            pre = FM._dot_te(eT, w)
        elif kind == "split":
            hw = w.shape[0] - eT.shape[0]
            pre = FM._dot(h, w[:hw]) + FM._dot_te(eT, w[hw:])
        else:
            pre = FM._dot(h, w)
        h = jnp.maximum(pre + b, 0.0).astype(jnp.bfloat16)
    out_ref[:] = jnp.sum(h.astype(jnp.float32), axis=1, keepdims=True)


def trunkpe_call(FpT_op, xT_op):
    return pl.pallas_call(
        k_trunkpe,
        out_shape=jax.ShapeDtypeStruct((P_TOTAL, 1), jnp.float32),
        grid=(P_TOTAL // TILE,),
        in_specs=[colspec(3), constspec(FpT.shape)] + [constspec(o.shape)
                                                       for o in fused],
        out_specs=rowspec(1),
        compiler_params=FM._COMPILER_PARAMS,
    )(xT_op, FpT_op, *fused)


ms = scan_time_smallperturb(trunkpe_call, (FpT, xT), pidx=0)
report("trunkpe", ms, TRUNK_FLOPS)


def k_headsonly(*refs):
    n_ops = 2 * len(layout)
    (h_ref, edT_ref), wrefs, (out_ref,) = refs[:2], refs[2:2 + n_ops], refs[2 + n_ops:]
    wv = FM._load_wv(wrefs, layout, n_pairs)
    h = h_ref[:]
    it = iter(wv)
    for _ in kinds:
        next(it), next(it)
    whead, bhead = next(it), next(it)
    head = FM._dot(h, whead) + bhead
    rf, fi, sigma = head[:, :W], head[:, W:2 * W], head[:, 2 * W:]
    rf, fi = rf.astype(jnp.bfloat16), fi.astype(jnp.bfloat16)
    wrh, brh = next(it), next(it)
    pre_rh = FM._dot(rf, wrh[:W]) + FM._dot_te(edT_ref[:], wrh[W:])
    rh = jnp.maximum(pre_rh + brh, 0.0).astype(jnp.bfloat16)
    wro, bro = next(it), next(it)
    rgb = FM._dot(rh, wro) + bro
    wih, bih = next(it), next(it)
    ih = jnp.maximum(FM._dot(fi, wih) + bih, 0.0).astype(jnp.bfloat16)
    wio, bio = next(it), next(it)
    ins = FM._dot(ih, wio) + bio
    out = jnp.concatenate([rgb, sigma, ins], axis=-1)
    out_ref[:] = jnp.sum(out, axis=1, keepdims=True)


def heads_call(edT_op, h_op):
    return pl.pallas_call(
        k_headsonly,
        out_shape=jax.ShapeDtypeStruct((P_TOTAL, 1), jnp.float32),
        grid=(P_TOTAL // TILE,),
        in_specs=[rowspec(W), colspec(edT.shape[0])] + [constspec(o.shape)
                                                        for o in fused],
        out_specs=rowspec(1),
        compiler_params=FM._COMPILER_PARAMS,
    )(h_op, edT_op, *fused)


ms = scan_time_smallperturb(heads_call, (edT, h0), pidx=0)
report("headsonly", ms, HEAD_FLOPS)
