"""Probe: bf16 vs f32 trunk epilogue (bias+relu+cast) — r5."""
import functools, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from dmnerf_tpu.kernels import fused_mlp as FM

P_TOTAL, W, TILE, PEAK = 589824, 256, 4096, 197e12
rng = np.random.RandomState(0)
h0 = jnp.asarray(rng.randn(P_TOTAL, W).astype(np.float32)).astype(jnp.bfloat16)
ws8 = [jnp.asarray(rng.randn(W, W).astype(np.float32) * 0.05).astype(jnp.bfloat16) for _ in range(8)]
bs8 = [jnp.asarray(rng.randn(1, W).astype(np.float32) * 0.05) for _ in range(8)]
bs8_bf = [b.astype(jnp.bfloat16) for b in bs8]

def scan_time(fn, ops, pidx=0, R=20, iters=4):
    @jax.jit
    def run(*ops):
        def body(c, _):
            o = list(ops); o[pidx] = o[pidx] + c.astype(o[pidx].dtype)
            out = fn(*o)
            return jnp.sum(out).astype(jnp.float32) * 0.0, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=R)
        return c
    _ = float(run(*ops))
    t0 = time.perf_counter()
    for _ in range(iters): out = run(*ops)
    _ = float(out)
    return (time.perf_counter() - t0) / (iters * R) * 1e3

def k_chain(mode, *refs):
    w0_ref, h_ref, rest, out_ref = refs[0], refs[1], refs[2:17], refs[17]
    ws = [w0_ref] + [rest[2*l-1] for l in range(1, 8)]
    bs = [rest[0]] + [rest[2*l] for l in range(1, 8)]
    h = h_ref[:]
    for l in range(8):
        pre = jax.lax.dot_general(h, ws[l][:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if mode == "f32":
            h = jnp.maximum(pre + bs[l][:], 0.0).astype(jnp.bfloat16)
        else:  # bf16 epilogue: round first, then add/relu in bf16
            h = jnp.maximum(pre.astype(jnp.bfloat16) + bs[l][:], jnp.bfloat16(0.0))
    out_ref[:] = jnp.sum(h.astype(jnp.float32), axis=1, keepdims=True)

def call(mode, bias_list):
    wops = []
    for w, b in zip(ws8, bs8 if mode == "f32" else bias_list):
        wops += [w, b]
    def f(w0, h):
        return pl.pallas_call(
            functools.partial(k_chain, mode),
            out_shape=jax.ShapeDtypeStruct((P_TOTAL, 1), jnp.float32),
            grid=(P_TOTAL // TILE,),
            in_specs=[pl.BlockSpec(ws8[0].shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM)]
                     + [pl.BlockSpec(o.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for o in wops[1:]],
            out_specs=pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            compiler_params=FM._COMPILER_PARAMS,
        )(w0, h, *wops[1:])
    return f

FL = 2 * P_TOTAL * 8 * W * W
for mode, bl in (("f32", bs8), ("bf16", bs8_bf)):
    try:
        ms = scan_time(call(mode, bl), (ws8[0], h0))
        tf = FL / (ms * 1e-3) / 1e12
        print(f"chain8 epi={mode:4s}: {ms:7.3f} ms  {tf:6.1f} TF/s  ({tf/(PEAK/1e12):.3f} of peak)")
    except Exception as e:
        print(f"chain8 epi={mode}: FAIL {type(e).__name__}: {str(e)[:200]}")
