"""Scratch: sweep Pallas kernel tile sizes on the real chip."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from dmnerf_tpu.kernels.fused_mlp import make_pallas_query_fn
from dmnerf_tpu.core.mlp import init_dm_nerf

N, S = 3072, 192
key = jax.random.PRNGKey(0)
params = init_dm_nerf(key, ins_num=32)
rng = np.random.RandomState(0)
pts = jnp.asarray(rng.uniform(-3, 3, (N, S, 3)).astype(np.float32))
dirs = jnp.asarray(rng.uniform(-1, 1, (N, 3)).astype(np.float32))
dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)


def bench(q, iters=20):
    C = int(q(params, pts[:8], dirs[:8]).shape[-1])
    w = jnp.asarray(np.linspace(0.5, 1.5, C), jnp.float32)
    f = jax.jit(lambda p: jnp.sum(jnp.tanh(q(p, pts, dirs)) * w))
    g = jax.jit(lambda p: sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(jax.grad(lambda pp: jnp.sum(jnp.tanh(q(pp, pts, dirs)) * w))(p))))
    fv = float(f(params)); gv = float(g(params))
    t0 = time.perf_counter()
    for _ in range(iters): out = f(params)
    ff = float(out); tf = (time.perf_counter() - t0) / iters * 1000
    t0 = time.perf_counter()
    for _ in range(iters): out = g(params)
    gg = float(out); tg = (time.perf_counter() - t0) / iters * 1000
    return tf, tg, fv, gv


for tf_, tb in [(2048, 1024), (4096, 2048), (8192, 4096), (16384, 8192),
                (8192, 2048), (4096, 4096)]:
    try:
        q = make_pallas_query_fn(tile_fwd=tf_, tile_bwd=tb)
        t_f, t_g, fv, gv = bench(q)
        print(f"tile_fwd={tf_:5d} tile_bwd={tb:5d}  fwd {t_f:7.2f} ms  grad {t_g:7.2f} ms  (f={fv:.2f} g={gv:.2f})", flush=True)
    except Exception as e:
        print(f"tile_fwd={tf_:5d} tile_bwd={tb:5d}  FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
