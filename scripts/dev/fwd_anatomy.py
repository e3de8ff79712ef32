"""Isolate what makes the fused forward kernel slower per-FLOP than the backward.

Variants of the pe_mode='outside' forward at the flagship fine shape
[589824 pts], tile 2048, bf16 compute:
  full        — the real kernel (trunk + fused head + rgb/ins branches + concat out)
  pad128      — same but output padded to 128 lanes (isolate narrow-out DMA)
  trunk       — trunk only, write h [T, 256]
  trunk+head  — trunk + fused head matmul, write head [T, 513]
  noconcat    — full compute but write rgb/sigma/ins into separate slices of a
                [T, 128] padded out (no 3/1/33 lane concat)
  bwd-only    — time the backward kernel alone via jax.vjp (residuals prebuilt)
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
TILE = 2048
INS = 32
params = init_dm_nerf(jax.random.PRNGKey(0), ins_num=INS)
kinds = tuple(FM._layer_kinds(8, (4,)))
packed_f32 = FM._pack(params, 10, 4, 8, (4,))
packed = [w.astype(jnp.bfloat16) if i % 2 == 0 else w for i, w in enumerate(packed_f32)]
Wf = Wi = 256
C4 = 4 + INS + 1
Ep, Ed = FM._emb_dim(10), FM._emb_dim(4)

rng = np.random.RandomState(0)
e = jnp.asarray(rng.randn(P_TOTAL, Ep).astype(np.float32)).astype(jnp.bfloat16)
ed = jnp.asarray(rng.randn(P_TOTAL, Ed).astype(np.float32)).astype(jnp.bfloat16)


def timeit(f, *a, iters=20):
    # scalar-reduce + float(): under the axon tunnel block_until_ready does not
    # force remote execution; a host-side scalar read does (see profile_step._timer)
    g = jax.jit(lambda *aa: sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(f(*aa))))
    _ = float(g(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*a)
    _ = float(out)
    return (time.perf_counter() - t0) / iters * 1000


def tile_spec(width):
    return pl.BlockSpec((TILE, width), lambda i: (i, 0), memory_space=pltpu.VMEM)


def const_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)


def build(kernel, out_width):
    @jax.jit
    def f(e, ed, *packed):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((P_TOTAL, out_width), jnp.float32),
            grid=(P_TOTAL // TILE,),
            in_specs=[tile_spec(Ep), tile_spec(Ed)] + [const_spec(w.shape) for w in packed],
            out_specs=tile_spec(out_width),
            compiler_params=FM._COMPILER_PARAMS,
        )(e, ed, *packed)
    return f


def k_full(*refs):
    (e_ref, ed_ref), wrefs, (out_ref,) = refs[:2], refs[2:2 + len(packed)], refs[2 + len(packed):]
    wv = [r[:] for r in wrefs]
    out, _ = FM._forward_core(e_ref[:], ed_ref[:], wv, kinds, Wf, Wi, jnp.bfloat16, False)
    out_ref[:] = out


def k_pad128(*refs):
    (e_ref, ed_ref), wrefs, (out_ref,) = refs[:2], refs[2:2 + len(packed)], refs[2 + len(packed):]
    wv = [r[:] for r in wrefs]
    out, _ = FM._forward_core(e_ref[:], ed_ref[:], wv, kinds, Wf, Wi, jnp.bfloat16, False)
    out_ref[:, :C4] = out


def k_trunk(*refs):
    (e_ref, ed_ref), wrefs, (out_ref,) = refs[:2], refs[2:2 + len(packed)], refs[2 + len(packed):]
    it = iter([r[:] for r in wrefs])
    h = None
    ee = e_ref[:]
    for kind in kinds:
        w, b = next(it), next(it)
        inp = ee if kind == "emb0" else (jnp.concatenate([h, ee], -1) if kind == "split" else h)
        h = (jnp.maximum(FM._dot(inp, w) + b, 0.0)).astype(jnp.bfloat16)
    out_ref[:] = h.astype(jnp.float32)


def k_trunk_head(*refs):
    (e_ref, ed_ref), wrefs, (out_ref,) = refs[:2], refs[2:2 + len(packed)], refs[2 + len(packed):]
    wv = [r[:] for r in wrefs]
    it = iter(wv)
    h = None
    ee = e_ref[:]
    for kind in kinds:
        w, b = next(it), next(it)
        inp = ee if kind == "emb0" else (jnp.concatenate([h, ee], -1) if kind == "split" else h)
        h = (jnp.maximum(FM._dot(inp, w) + b, 0.0)).astype(jnp.bfloat16)
    whead, bhead = next(it), next(it)
    out_ref[:] = FM._dot(h, whead) + bhead


def k_noconcat(*refs):
    (e_ref, ed_ref), wrefs, (out_ref,) = refs[:2], refs[2:2 + len(packed)], refs[2 + len(packed):]
    wv = [r[:] for r in wrefs]
    it = iter(wv)
    h = None
    ee, edd = e_ref[:], ed_ref[:]
    for kind in kinds:
        w, b = next(it), next(it)
        inp = ee if kind == "emb0" else (jnp.concatenate([h, ee], -1) if kind == "split" else h)
        h = (jnp.maximum(FM._dot(inp, w) + b, 0.0)).astype(jnp.bfloat16)
    whead, bhead = next(it), next(it)
    head = FM._dot(h, whead) + bhead
    rf = head[:, :Wf].astype(jnp.bfloat16)
    fi = head[:, Wf:Wf + Wi].astype(jnp.bfloat16)
    wrh, brh = next(it), next(it)
    rh = (jnp.maximum(FM._dot(jnp.concatenate([rf, edd], -1), wrh) + brh, 0.0)).astype(jnp.bfloat16)
    wro, bro = next(it), next(it)
    rgb = FM._dot(rh, wro) + bro
    wih, bih = next(it), next(it)
    ih = (jnp.maximum(FM._dot(fi, wih) + bih, 0.0)).astype(jnp.bfloat16)
    wio, bio = next(it), next(it)
    ins = FM._dot(ih, wio) + bio
    out_ref[:, 0:3] = rgb
    out_ref[:, 3:4] = head[:, Wf + Wi:]
    out_ref[:, 4:4 + INS + 1] = ins


for name, kern, width in [
    ("full (real fwd, out 37)", k_full, C4),
    ("pad128 out", k_pad128, 128),
    ("noconcat (sliced writes, out 128)", k_noconcat, 128),
    ("trunk only (out 256)", k_trunk, 256),
    ("trunk+fused head (out 513)", k_trunk_head, 513),
]:
    f = build(kern, width)
    ms = timeit(f, e, ed, *packed)
    print(f"{name:38s} {ms:7.2f} ms", flush=True)

# backward alone via vjp (residuals = (params, e, ed); bwd pallas_call only)
q = FM.make_pallas_query_fn()
pts = jnp.asarray(rng.uniform(-3, 3, (3072, 192, 3)).astype(np.float32))
dirs = rng.randn(3072, 3).astype(np.float32)
dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))
g = jnp.asarray(rng.randn(3072, 192, C4).astype(np.float32))


@jax.jit
def bwd_only(params, pts, dirs, g):
    _, vjp = jax.vjp(lambda p: q(p, pts, dirs), params)
    return vjp(g)


@jax.jit
def fwd_real(params, pts, dirs):
    return q(params, pts, dirs)


print(f"{'REAL fwd (query path, incl PE)':38s} {timeit(fwd_real, params, pts, dirs):7.2f} ms", flush=True)
print(f"{'fwd+bwd via vjp':38s} {timeit(bwd_only, params, pts, dirs, g):7.2f} ms", flush=True)
