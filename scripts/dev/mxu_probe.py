"""Probe practical MXU throughput for chained [T,256]x[256,256] layers on v5e."""
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P_TOTAL = 589824  # fine-pass point count
W = 256
L = 8

keys = jax.random.split(jax.random.PRNGKey(0), L + 1)
x = jax.random.normal(keys[0], (P_TOTAL, W), jnp.float32) * 0.1
ws_f32 = [jax.random.normal(keys[i + 1], (W, W), jnp.float32) * 0.05 for i in range(L)]


def timeit(f, *a, iters=30):
    out = f(*a); _ = float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    _ = float(out)
    return (time.perf_counter() - t0) / iters * 1000


def run(tile, relu, dtype, iters=30):
    ws = [w.astype(dtype) for w in ws_f32]
    xx = x.astype(dtype)

    def kern(*refs):
        x_ref, wrefs, out_ref = refs[0], refs[1:1 + L], refs[1 + L]
        h = x_ref[:]
        for i in range(L):
            h = jnp.dot(h, wrefs[i][:], preferred_element_type=jnp.float32)
            if relu:
                h = jnp.maximum(h, 0.0)
            h = h.astype(dtype)
        out_ref[:] = h.astype(jnp.float32)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def f(xx, *ws):
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((P_TOTAL, W), jnp.float32),
            grid=(P_TOTAL // tile,),
            in_specs=[pl.BlockSpec((tile, W), lambda i: (i, 0), memory_space=pltpu.VMEM)]
                     + [const_spec(w.shape) for w in ws],
            out_specs=pl.BlockSpec((tile, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(xx, *ws)
        return jnp.sum(out)

    ms = timeit(f, xx, *ws, iters=iters)
    tflop = 2 * P_TOTAL * W * W * L / 1e12
    print(f"pallas tile={tile:5d} relu={int(relu)} {str(dtype.__name__ if hasattr(dtype,'__name__') else dtype):9s}"
          f" {ms:7.2f} ms  {tflop/ms*1000:6.1f} TFLOP/s", flush=True)


def run_xla(dtype, relu=True, iters=30):
    ws = [w.astype(dtype) for w in ws_f32]
    xx = x.astype(dtype)

    @jax.jit
    def f(xx, *ws):
        h = xx
        for i in range(L):
            h = jnp.dot(h, ws[i], preferred_element_type=jnp.float32)
            if relu:
                h = jnp.maximum(h, 0.0)
            h = h.astype(dtype)
        return jnp.sum(h)

    ms = timeit(f, xx, *ws, iters=iters)
    tflop = 2 * P_TOTAL * W * W * L / 1e12
    print(f"xla              relu={int(relu)} {str(dtype.__name__):9s} {ms:7.2f} ms  {tflop/ms*1000:6.1f} TFLOP/s", flush=True)


for dtype in (jnp.float32, jnp.bfloat16):
    run_xla(dtype)
for tile in (512, 1024, 2048, 4096):
    for dtype in (jnp.float32, jnp.bfloat16):
        run(tile, True, dtype)
run(2048, False, jnp.bfloat16)
run(2048, False, jnp.float32)
