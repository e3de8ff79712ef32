"""Scratch: time forward stages jitted separately (outputs reduced to scalars —
the axon tunnel eagerly materializes large jit outputs host-side, poisoning timings)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from dmnerf_tpu.configs import Config
from dmnerf_tpu.core.compositor import composite
from dmnerf_tpu.core.embedding import positional_encoding
from dmnerf_tpu.core.mlp import dm_nerf_apply
from dmnerf_tpu.core.sampling import sample_pdf, z_val_sample
from dmnerf_tpu.render.trainstep import create_train_state

N, S, SF = 3072, 64, 192
cfg = Config(N_train=N, N_samples=S, N_importance=128, near=2.0, far=7.0, ins_num=32)
state = create_train_state(cfg, jax.random.PRNGKey(0))
rng = np.random.RandomState(0)
rays_d = jnp.asarray(rng.randn(N, 3).astype(np.float32))
rays_o = jnp.zeros((N, 3))
z_c = z_val_sample(N, cfg.near, cfg.far, S)
z_f = jnp.sort(jnp.asarray(rng.rand(N, SF).astype(np.float32)) * 5 + 2, axis=-1)
pts_f = rays_o[:, None, :] + rays_d[:, None, :] * z_f[..., None]
viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
emb_p = positional_encoding(pts_f, 10)
emb_d = jnp.broadcast_to(positional_encoding(viewdirs, 4)[:, None, :], (N, SF, 27))
raw = jnp.asarray(rng.randn(N, SF, 4 + 33).astype(np.float32))
weights = jnp.asarray(rng.rand(N, S).astype(np.float32))


def t(name, f, *args, iters=30):
    g = jax.jit(lambda *a: jnp.sum(jax.tree_util.tree_leaves(f(*a))[0]))
    out = g(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    _ = float(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)


t("PE (fine pts 3072x192)", lambda p: positional_encoding(p, 10), pts_f)
t("MLP fine (pre-embedded)", dm_nerf_apply, state.params_fine, emb_p, emb_d)
t("PE+MLP fine", lambda pr, p, d: dm_nerf_apply(pr, positional_encoding(p, 10),
    jnp.broadcast_to(positional_encoding(d, 4)[:, None, :], p.shape[:-1] + (27,))), state.params_fine, pts_f, viewdirs)
t("composite fine", composite, raw, z_f, rays_d)
t("sample_pdf (128 from 63 bins)", lambda w: sample_pdf(
    0.5 * (z_c[:, 1:] + z_c[:, :-1]), w[:, 1:-1], 128, key=jax.random.PRNGKey(0)), weights)
t("sort union z (3072x192)", lambda a: jnp.sort(a, axis=-1), jnp.concatenate([z_c, z_f[:, :128]], -1))

x = jnp.asarray(rng.randn(N * SF, 256).astype(np.float32))
w = jnp.asarray(rng.randn(256, 256).astype(np.float32))
t("single matmul [589824,256]x[256,256]", lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32), x, w)
t("13x chained matmul+relu 256x256", lambda x, w: jax.lax.fori_loop(
    0, 13, lambda i, h: jnp.maximum(jnp.dot(h, w, preferred_element_type=jnp.float32), 0.0), x), x, w)
