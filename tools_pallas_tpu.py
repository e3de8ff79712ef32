"""Scratch: compiled-on-TPU parity + timing for the fused Pallas kernel."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from dmnerf_tpu.core.mlp import init_dm_nerf
from dmnerf_tpu.core.pipeline import make_xla_query_fn
from dmnerf_tpu.kernels.fused_mlp import make_pallas_query_fn

# flagship shapes: fine pass of the train step
N, S, INS = 3072, 192, 32
params = init_dm_nerf(jax.random.PRNGKey(0), ins_num=INS)
rng = np.random.RandomState(0)
pts = jnp.asarray(rng.randn(N, S, 3).astype(np.float32))
dirs = rng.randn(N, 3).astype(np.float32)
dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))

q_xla = make_xla_query_fn()
q_pal = make_pallas_query_fn()

# ---- parity (compiled) ----
w = jnp.linspace(0.5, 1.5, 4 + INS + 1)


def loss(q):
    return lambda p: jnp.sum(jnp.tanh(q(p, pts, dirs)) * w)


vx, gx = jax.jit(jax.value_and_grad(loss(q_xla)))(params)
vp, gp = jax.jit(jax.value_and_grad(loss(q_pal)))(params)
print(f"fwd value: xla={float(vx):.6f} pallas={float(vp):.6f}", flush=True)
worst = 0.0
for k in sorted(gx):
    a, b = np.asarray(gx[k]), np.asarray(gp[k])
    rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-12)
    worst = max(worst, rel)
    if rel > 1e-4:
        print(f"  grad {k}: rel={rel:.2e}", flush=True)
print(f"worst grad rel err: {worst:.2e}", flush=True)


# ---- timing ----
def t(name, f, *args, iters=30):
    g = jax.jit(lambda *a: sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(f(*a))))
    out = g(*args); _ = float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    _ = float(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)


t("fwd xla  [3072x192]", q_xla, params, pts, dirs)
t("fwd pallas [3072x192]", q_pal, params, pts, dirs)
t("grad xla", lambda p: jax.grad(loss(q_xla))(p), params)
t("grad pallas", lambda p: jax.grad(loss(q_pal))(p), params)
