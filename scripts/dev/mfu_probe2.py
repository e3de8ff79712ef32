"""MFU probe round 2: is the forward gap MXU/VPU serialization, and does
row-chunk interleaving unlock overlap?

mfu_probe.py established: per-grid-step overhead is NOT the issue (chain time
tile-independent 2048..8192), and the dependent 8x256x256 chain with the
standard epilogue (f32 acc + bias + relu + bf16 cast) runs at 0.603 of peak
(5.21 ms vs 3.14 analytic). Hypothesis: the per-layer VPU epilogue serializes
against the MXU because each layer's matmul depends on the previous layer's
epilogue over the SAME rows. Different row-chunks are independent -> splitting
the tile into C in-kernel chunks gives the static scheduler freedom to overlap
chunk j's epilogue with chunk j+-1's matmul.

Variants:
  mm1        - ONE [T,256]@[256,256], no epilogue, f32 out: per-matmul ceiling.
  mm1_n512   - ONE [T,256]@[256,512]: N-block scaling of the ceiling.
  mm1_epi    - mm1 + bias/relu/cast epilogue: single-layer serialization cost.
  chain8 xC  - the 8-layer relu chain split into C independent row-chunks,
               sequential program order (C=1 is mfu_probe's chain8_relu).
  chain8 x2il- 2 chunks explicitly interleaved (mm/epi alternating) in case
               the scheduler's lookahead window is short.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev/mfu_probe2.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmnerf_tpu.kernels import fused_mlp as FM
from scripts.dev.mfu_probe import scan_time  # noqa: E402  (same harness)

P_TOTAL = 589824
W = 256
PEAK = 197e12
TILE = 4096

rng = np.random.RandomState(0)
h0 = jnp.asarray(rng.randn(P_TOTAL, W).astype(np.float32)).astype(jnp.bfloat16)
ws8 = [jnp.asarray(rng.randn(W, W).astype(np.float32) * 0.05).astype(jnp.bfloat16)
       for _ in range(8)]
bs8 = [jnp.asarray(rng.randn(1, W).astype(np.float32) * 0.05) for _ in range(8)]
w512 = jnp.asarray(rng.randn(W, 512).astype(np.float32) * 0.05).astype(jnp.bfloat16)


def tile_spec(tile, width, dtype_width=None):
    return pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM)


def const_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _mm(h, w):
    return jax.lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _epi(pre, b):
    return jnp.maximum(pre + b, 0.0).astype(jnp.bfloat16)


def run_kernel(kern, wops, out_width, out_dtype=jnp.float32, tile=TILE):
    specs = [tile_spec(tile, W)] + [const_spec(w.shape) for w in wops]

    def call(h):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((P_TOTAL, out_width), out_dtype),
            grid=(P_TOTAL // tile,),
            in_specs=specs,
            out_specs=tile_spec(tile, out_width),
            compiler_params=FM._COMPILER_PARAMS,
        )(h, *wops)

    return call


def report(name, ms, flops):
    tf = flops / (ms * 1e-3) / 1e12
    print(f"  {name:16s}: {ms:7.3f} ms  {tf:6.1f} TF/s  ({tf/(PEAK/1e12):.3f} of peak)")


print("== single-matmul ceilings (tile 4096) ==")


def k_mm1(h_ref, w_ref, out_ref):
    out_ref[:] = _mm(h_ref[:], w_ref[:])


ms = scan_time(run_kernel(k_mm1, [ws8[0]], W), (h0,))
report("mm1", ms, 2 * P_TOTAL * W * W)


def k_mm1_n512(h_ref, w_ref, out_ref):
    out_ref[:] = _mm(h_ref[:], w_ref[:])


ms = scan_time(run_kernel(k_mm1_n512, [w512], 512), (h0,))
report("mm1_n512", ms, 2 * P_TOTAL * W * 512)


def k_mm1_epi(h_ref, w_ref, b_ref, out_ref):
    out_ref[:] = _epi(_mm(h_ref[:], w_ref[:]), b_ref[:]).astype(jnp.float32)


ms = scan_time(run_kernel(k_mm1_epi, [ws8[0], bs8[0]], W), (h0,))
report("mm1_epi", ms, 2 * P_TOTAL * W * W)

print("== 8-layer relu chain, C independent row-chunks (tile 4096) ==")
CHAIN_FLOPS = 2 * P_TOTAL * 8 * W * W
wops8 = []
for w, b in zip(ws8, bs8):
    wops8 += [w, b]


def k_chain_chunks(C, *refs):
    h_ref, wrefs, out_ref = refs[0], refs[1:17], refs[17]
    sub = TILE // C
    for c in range(C):
        h = h_ref[c * sub:(c + 1) * sub, :]
        for l in range(8):
            h = _epi(_mm(h, wrefs[2 * l][:]), wrefs[2 * l + 1][:])
        out_ref[c * sub:(c + 1) * sub, :] = h.astype(jnp.float32)


for C in (1, 2, 4, 8):
    ms = scan_time(run_kernel(functools.partial(k_chain_chunks, C), wops8, W), (h0,))
    report(f"chain8 x{C}", ms, CHAIN_FLOPS)


def k_chain_2il(*refs):
    """2 chunks, explicitly interleaved: mm(b,l) issued between mm(a,l)'s
    result use and a's epilogue, softening the dependency chain."""
    h_ref, wrefs, out_ref = refs[0], refs[1:17], refs[17]
    sub = TILE // 2
    a = h_ref[:sub, :]
    b = h_ref[sub:, :]
    pre_a = _mm(a, wrefs[0][:])
    for l in range(8):
        pre_b = _mm(b, wrefs[2 * l][:])
        a = _epi(pre_a, wrefs[2 * l + 1][:])
        if l < 7:
            pre_a = _mm(a, wrefs[2 * (l + 1)][:])
        b = _epi(pre_b, wrefs[2 * l + 1][:])
    out_ref[:sub, :] = a.astype(jnp.float32)
    out_ref[sub:, :] = b.astype(jnp.float32)


ms = scan_time(run_kernel(k_chain_2il, wops8, W), (h0,))
report("chain8 x2il", ms, CHAIN_FLOPS)
