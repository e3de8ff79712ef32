import sys, time
import numpy as np
import jax, jax.numpy as jnp
from dmnerf_tpu.kernels.fused_mlp import make_pallas_query_fn
from dmnerf_tpu.core.mlp import init_dm_nerf

N, S = 3072, 192
params = init_dm_nerf(jax.random.PRNGKey(0), ins_num=32)
rng = np.random.RandomState(0)
pts = jnp.asarray(rng.uniform(-3, 3, (N, S, 3)).astype(np.float32))
dirs = jnp.asarray(rng.uniform(-1, 1, (N, 3)).astype(np.float32))
dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

mode = sys.argv[1] if len(sys.argv) > 1 else "fwd_f32"
cd = jnp.float32 if mode.endswith("f32") else jnp.bfloat16
q = make_pallas_query_fn(tile_fwd=1024, tile_bwd=512, cache_dtype=cd)
if mode.startswith("fwd"):
    f = jax.jit(lambda p: jnp.sum(q(p, pts, dirs)))
else:
    f = jax.jit(lambda p: sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(
        jax.grad(lambda pp: jnp.sum(jnp.tanh(q(pp, pts, dirs))))(p))))
print(mode, float(f(params)))
