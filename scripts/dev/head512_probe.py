"""Micro-probe: is the fused-head 513->640 lane padding worth removing?

Kernels at the fine-pass scale (P=786k pts/call, tile 4096, grid like the
render chunk): 8-layer 256-wide trunk followed by
  a) head [256, 513]   (pads to 640 on the MXU — today's layout)
  b) head [256, 512]   + sigma via VPU lane-reduce dot (proposed)
  c) head [256, 512]   (no sigma at all — the overlap-free lower bound)

If (b) ~= (c), the VPU dot hides under the MXU and the refactor buys the full
pad-waste back; if (b) ~= (a), there is no overlap and the refactor is churn.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev/head512_probe.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 786432
TILE = 4096
D = 8
W = 256
REPS = 20
_CP = pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timer(f, *args):
    g = jax.jit(lambda *a: sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(f(*a))))
    _ = float(g(*args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = g(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / REPS * 1e3


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def kernel(mode, x_ref, *wrefs_and_out):
    wrefs, out_ref = wrefs_and_out[:-1], wrefs_and_out[-1]
    h = x_ref[:]
    it = iter(wrefs)
    for _ in range(D):
        h = jnp.maximum(_dot(h, next(it)[:]), 0.0).astype(jnp.bfloat16)
    whead = next(it)[:]
    head = _dot(h, whead)
    if mode == "b":
        wdT = next(it)[:]
        sigma = jnp.sum(h.astype(jnp.float32) * wdT[:].astype(jnp.float32),
                        axis=1, keepdims=True)
        out_ref[:] = jnp.concatenate([head[:, :31], sigma], axis=1)
    else:
        out_ref[:] = head[:, :32]


def build(mode):
    rng = np.random.RandomState(0)
    ws = [jnp.asarray(rng.randn(W, W).astype(np.float32) * 0.05, jnp.bfloat16)
          for _ in range(D)]
    head_w = 513 if mode == "a" else 512
    ws.append(jnp.asarray(rng.randn(W, head_w).astype(np.float32) * 0.05,
                          jnp.bfloat16))
    if mode == "b":
        ws.append(jnp.asarray(rng.randn(1, W).astype(np.float32) * 0.05,
                              jnp.bfloat16))
    kern = functools.partial(kernel, mode)

    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((P, 32), jnp.float32),
            grid=(P // TILE,),
            in_specs=[pl.BlockSpec((TILE, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
               for w in ws],
            out_specs=pl.BlockSpec((TILE, 32), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=_CP,
        )(x, *ws)

    return run


def main():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(P, W).astype(np.float32), jnp.bfloat16)
    for mode, desc in [("a", "head 513 (pad 640)"),
                       ("b", "head 512 + VPU sigma"),
                       ("c", "head 512 only")]:
        ms = timer(build(mode), x)
        log(f"{mode}: {desc}: {ms:.2f} ms")


if __name__ == "__main__":
    main()
