"""Forward-kernel MFU anatomy (VERDICT r4 next-round #1).

The fused forward runs at ~0.8 of its padded-peak MFU and bounds the render,
the backward recompute, and the train forward. This probe decomposes the gap
with compiled kernels at the fine-pass shape, timed by an IN-GRAPH lax.scan of
R calls per dispatch (the ~1 ms tunnel floor makes single-dispatch timing of
sub-ms kernels meaningless).

Variants (all bf16 compute, f32 accumulate, tile sweep):
  chain8_pure  - 8x [T,256]@[256,256], output rounded to bf16 by the MXU
                 (preferred_element_type=bf16), NO epilogue at all: the pure
                 MXU-chain speed of light for this dependency pattern.
  chain8_relu  - same + the real per-layer epilogue (f32 accum + bias + relu +
                 bf16 cast). Difference = VPU epilogue cost / overlap quality.
  chain8_biasK - epilogue relu+cast only, bias folded INTO the matmul as a
                 K+1 ones-row (MXU does the add). Tests trading a VPU pass for
                 0.4% more MXU work.
  full         - the production pe_mode='kernel_t' forward kernel.
  fullsteps    - full kernel at FIXED total points, varying tile => per-grid-
                 step fixed cost (post operand-fusion slope).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev/mfu_probe.py
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

P_TOTAL = 589824  # 3072 rays x 192 samples
INS = 32
W = 256
PEAK = 197e12

params = init_dm_nerf(jax.random.PRNGKey(0), ins_num=INS)
rng = np.random.RandomState(0)


def scan_time(fn, ops, R=20, iters=4):
    """ms per call of fn(*ops), amortized over an in-graph scan of R calls.
    The first operand is perturbed by the (always-zero) carry so XLA cannot
    hoist the call out of the loop."""

    @jax.jit
    def run(*ops):
        def body(c, _):
            o0 = ops[0] + c.astype(ops[0].dtype)
            out = fn(o0, *ops[1:])
            return jnp.sum(out).astype(jnp.float32) * 0.0, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=R)
        return c

    _ = float(run(*ops))  # compile + fence
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(*ops)
    _ = float(out)
    return (time.perf_counter() - t0) / (iters * R) * 1e3


def tile_spec(tile, width):
    return pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM)


def const_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


# ---- chain variants: 8 dependent [T,256]x[256,256] matmuls ----------------

ws8 = [jnp.asarray(rng.randn(W, W).astype(np.float32) * 0.05).astype(jnp.bfloat16)
       for _ in range(8)]
bs8 = [jnp.asarray(rng.randn(1, W).astype(np.float32) * 0.05) for _ in range(8)]
ws8_biasK = [jnp.concatenate([w, b.astype(jnp.bfloat16)], axis=0)
             for w, b in zip(ws8, bs8)]
h0 = jnp.asarray(rng.randn(P_TOTAL, W).astype(np.float32)).astype(jnp.bfloat16)
ones_col = None  # built per-tile in-kernel


def chain_kernel(mode, n_w, *refs):
    h_ref, wrefs, out_ref = refs[0], refs[1:1 + 2 * n_w], refs[-1]
    h = h_ref[:]
    for i in range(n_w):
        w, b = wrefs[2 * i][:], wrefs[2 * i + 1][:]
        if mode == "pure":
            h = jax.lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.bfloat16)
        elif mode == "relu":
            pre = jax.lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            h = jnp.maximum(pre + b, 0.0).astype(jnp.bfloat16)
        elif mode == "biasK":
            hk = jnp.concatenate(
                [h, jnp.ones((h.shape[0], 1), jnp.bfloat16)], axis=1)
            pre = jax.lax.dot_general(hk, w, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            h = jnp.maximum(pre, 0.0).astype(jnp.bfloat16)
    out_ref[:] = h.astype(jnp.float32)


def make_chain(mode, tile):
    if mode == "biasK":
        wops = []
        for w in ws8_biasK:
            wops += [w, jnp.zeros((1, 1), jnp.float32)]  # dummy bias slot
    else:
        wops = []
        for w, b in zip(ws8, bs8):
            wops += [w, b]
    kern = functools.partial(chain_kernel, mode, 8)
    specs = [tile_spec(tile, W)] + [const_spec(w.shape) for w in wops]

    def call(h):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((P_TOTAL, W), jnp.float32),
            grid=(P_TOTAL // tile,),
            in_specs=specs,
            out_specs=tile_spec(tile, W),
            compiler_params=FM._COMPILER_PARAMS,
        )(h, *wops)

    return call


CHAIN_FLOPS = 2 * P_TOTAL * 8 * W * W

print("== chain variants (8x 256x256, P=589824) ==")
for mode in ("pure", "relu", "biasK"):
    for tile in (2048, 4096, 8192):
        try:
            ms = scan_time(make_chain(mode, tile), (h0,))
            tf = CHAIN_FLOPS / (ms * 1e-3) / 1e12
            print(f"  chain8_{mode:5s} tile {tile:5d}: {ms:7.3f} ms  "
                  f"{tf:6.1f} TF/s  ({tf/ (PEAK/1e12):.3f} of peak)")
        except Exception as e:
            print(f"  chain8_{mode:5s} tile {tile:5d}: FAIL {type(e).__name__}: {e}")

# ---- PE-only kernel: the transposed double-angle PE + concat, nothing else ----

xT_full = jnp.asarray(rng.randn(3, P_TOTAL).astype(np.float32))


def pe_kernel(multires, xT_ref, out_ref):
    eT = FM._pe_transposed(xT_ref[:], None, multires, exact=False)
    out_ref[:] = jnp.sum(eT.astype(jnp.bfloat16).astype(jnp.float32), axis=0,
                         keepdims=True)


def make_pe_only(tile):
    def call(xT):
        return pl.pallas_call(
            functools.partial(pe_kernel, 10),
            out_shape=jax.ShapeDtypeStruct((1, P_TOTAL), jnp.float32),
            grid=(P_TOTAL // tile,),
            in_specs=[pl.BlockSpec((3, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            compiler_params=FM._COMPILER_PARAMS,
        )(xT)

    return call


print("== pe_only (transposed double-angle PE + bf16 cast + reduce) ==")
for tile in (2048, 4096, 8192):
    try:
        ms = scan_time(make_pe_only(tile), (xT_full,))
        print(f"  pe_only tile {tile:5d}: {ms:7.3f} ms")
    except Exception as e:
        print(f"  pe_only tile {tile:5d}: FAIL {type(e).__name__}: {e}")

# ---- full production forward (kernel_t), absolute + per-step scaling ------

print("== full kernel_t forward ==")
query = {}
for tile in (2048, 3072, 4096, 6144, 8192):
    try:
        q = FM.make_pallas_query_fn(tile_fwd=tile)
        pts = jnp.asarray(rng.randn(3072, 192, 3).astype(np.float32))
        dirs = jnp.asarray(rng.randn(3072, 3).astype(np.float32))

        def call(p, d, q=q):
            return q(params, p, d)

        ms = scan_time(call, (pts, dirs), R=10)
        # analytic (unpadded) matmul flops for the full net
        per_pt = 2 * (63 * W + 6 * W * W + (W + 63) * W + W * (2 * W + 1)
                      + (W + 27) * (W // 2) + (W // 2) * 3 + W * (W // 2)
                      + (W // 2) * (INS + 1))
        tf = per_pt * P_TOTAL / (ms * 1e-3) / 1e12
        print(f"  full tile {tile:5d}: {ms:7.3f} ms  {tf:6.1f} TF/s analytic "
              f"({tf / (PEAK/1e12):.3f} of peak)")
    except Exception as e:
        print(f"  full tile {tile:5d}: FAIL {type(e).__name__}: {e}")
