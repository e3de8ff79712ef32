"""Scratch: backward-pass breakdown after the sample_pdf fix."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from dmnerf_tpu.configs import Config
from dmnerf_tpu.core.pipeline import make_xla_query_fn, render_rays
from dmnerf_tpu.core.sampling import z_val_sample
from dmnerf_tpu.objfield.losses import img2mse, ins_criterion
from dmnerf_tpu.objfield.penalizer import ins_penalizer
from dmnerf_tpu.render.trainstep import Batch, create_train_state, make_train_step

N = 3072
cfg = Config(N_train=N, N_samples=64, N_importance=128, near=2.0, far=7.0,
             ins_num=32, perturb=1.0, penalize=True, tolerance=0.05, deta_w=0.05)
state = create_train_state(cfg, jax.random.PRNGKey(0))
rng = np.random.RandomState(0)
rays_d = rng.randn(N, 3).astype(np.float32); rays_d[:, 2] = np.abs(rays_d[:, 2]) + 1.0
batch = Batch(jnp.zeros((N, 3)), jnp.asarray(rays_d),
              jnp.asarray(rng.rand(N, 3).astype(np.float32)),
              jnp.asarray(rng.randint(0, cfg.ins_num, size=N)))
query = make_xla_query_fn(cfg.multires, cfg.multires_views, cfg.netdepth, tuple(cfg.skips))
query_remat = jax.checkpoint(query)
z = z_val_sample(N, cfg.near, cfg.far, cfg.N_samples)
key = jax.random.PRNGKey(1)


def t(name, f, *args, iters=30):
    g = jax.jit(lambda *a: sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(f(*a))))
    out = g(*args); _ = float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    _ = float(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)


def make_loss(q, parts):
    def loss(ps):
        info = render_rays(ps[0], ps[1], batch.rays_o, batch.rays_d, z, q,
                           N_importance=128, perturb=True, key=key)
        l = jnp.zeros(())
        if "rgb" in parts:
            l += img2mse(info["rgb_fine"], batch.target_c) + img2mse(info["rgb_coarse"], batch.target_c)
        if "ins" in parts:
            l += ins_criterion(info["ins_coarse"], batch.target_i, 32)[0]
            l += ins_criterion(info["ins_fine"], batch.target_i, 32)[0]
        if "pen" in parts:
            l += ins_penalizer(info["raw_coarse"], info["z_vals_coarse"], info["depth_coarse"], batch.rays_d, 0.05, 0.05)
            l += ins_penalizer(info["raw_fine"], info["z_vals_fine"], info["depth_fine"], batch.rays_d, 0.05, 0.05)
        return l
    return loss


t("fwd only", lambda pc, pf: make_loss(query, ("rgb",))((pc, pf)), state.params_coarse, state.params_fine)
t("grad rgb", lambda pc, pf: jax.grad(make_loss(query, ("rgb",)))((pc, pf)), state.params_coarse, state.params_fine)
t("grad rgb+ins", lambda pc, pf: jax.grad(make_loss(query, ("rgb", "ins")))((pc, pf)), state.params_coarse, state.params_fine)
t("grad rgb+ins+pen", lambda pc, pf: jax.grad(make_loss(query, ("rgb", "ins", "pen")))((pc, pf)), state.params_coarse, state.params_fine)
t("grad rgb+ins+pen REMAT", lambda pc, pf: jax.grad(make_loss(query_remat, ("rgb", "ins", "pen")))((pc, pf)), state.params_coarse, state.params_fine)

# full step with and without donation already measured: 77ms.

def query_bf16(params, pts, viewdirs):
    from dmnerf_tpu.core.embedding import positional_encoding
    from dmnerf_tpu.core.mlp import dm_nerf_apply
    ep = positional_encoding(pts, cfg.multires).astype(jnp.bfloat16)
    ed = positional_encoding(viewdirs, cfg.multires_views)
    ed = jnp.broadcast_to(ed[:, None, :], pts.shape[:-1] + ed.shape[-1:]).astype(jnp.bfloat16)
    pb = {k: v.astype(jnp.bfloat16) for k, v in params.items()}
    return dm_nerf_apply(pb, ep, ed).astype(jnp.float32)

t("grad full REMAT (rerun)", lambda pc, pf: jax.grad(make_loss(query_remat, ("rgb", "ins", "pen")))((pc, pf)), state.params_coarse, state.params_fine)
t("grad full bf16", lambda pc, pf: jax.grad(make_loss(query_bf16, ("rgb", "ins", "pen")))((pc, pf)), state.params_coarse, state.params_fine)
t("grad full bf16+REMAT", lambda pc, pf: jax.grad(make_loss(jax.checkpoint(query_bf16), ("rgb", "ins", "pen")))((pc, pf)), state.params_coarse, state.params_fine)
