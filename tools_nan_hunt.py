"""Scratch: replay CPU training to the first NaN-gradient step, then decompose."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.configs import load_config
from dmnerf_tpu.core.pipeline import make_xla_query_fn, render_rays
from dmnerf_tpu.core.sampling import z_val_sample
from dmnerf_tpu.data.samplers import make_full_sampler
from dmnerf_tpu.data.scene import load_scene
from dmnerf_tpu.objfield.losses import img2mse, ins_criterion
from dmnerf_tpu.objfield.penalizer import ins_penalizer
from dmnerf_tpu.render.trainstep import create_train_state, make_train_step, make_optimizer

cfg = load_config("/tmp/vtrain_short.txt")
scene = load_scene(cfg)
cfg = cfg.replace(ins_num=scene.ins_num)
key = jax.random.PRNGKey(cfg.seed)
key, init_key = jax.random.split(key)
state = create_train_state(cfg, init_key)
sampler = make_full_sampler(scene.images, scene.gt_labels, scene.poses, scene.K, scene.i_train, cfg.N_train)
step = jax.jit(make_train_step(cfg, jit=False))  # no donation: we inspect pre-step state


def has_nan(tree):
    return any(bool(jnp.any(~jnp.isfinite(l))) for l in jax.tree_util.tree_leaves(tree))


prev_state = state
prev = None
for i in range(150):
    key, k_batch, k_step = jax.random.split(key, 3)
    batch = sampler(k_batch)
    new_state, aux = step(state, batch, k_step)
    if not np.isfinite(float(aux["total_loss"])) or has_nan((new_state.params_coarse, new_state.params_fine)):
        print(f"first bad step: {i}, total={float(aux['total_loss'])}", flush=True)
        prev = (state, batch, k_step)
        break
    state = new_state
else:
    print("no NaN in 150 steps?!")
    raise SystemExit

state, batch, k_step = prev
query = make_xla_query_fn(cfg.multires, cfg.multires_views, cfg.netdepth, tuple(cfg.skips))
z = z_val_sample(cfg.N_train, cfg.near, cfg.far, cfg.N_samples)

# wait: state itself may already carry NaN params (bad update applied earlier w/ finite loss)
print("state params finite:", not has_nan((state.params_coarse, state.params_fine)), flush=True)

def render(ps):
    return render_rays(ps[0], ps[1], batch.rays_o, batch.rays_d, z, query,
                       N_importance=cfg.N_importance, perturb=cfg.perturb > 0, key=k_step)

info = render((state.params_coarse, state.params_fine))
for k, v in info.items():
    print(f"  fwd {k}: finite={bool(jnp.all(jnp.isfinite(v)))}", flush=True)

COMPONENTS = {
    "rgb": lambda info: img2mse(info["rgb_coarse"], batch.target_c) + img2mse(info["rgb_fine"], batch.target_c),
    "ins_coarse": lambda info: ins_criterion(info["ins_coarse"], batch.target_i, cfg.ins_num)[0],
    "ins_fine": lambda info: ins_criterion(info["ins_fine"], batch.target_i, cfg.ins_num)[0],
    "pen_coarse": lambda info: ins_penalizer(info["raw_coarse"], info["z_vals_coarse"], info["depth_coarse"], batch.rays_d, cfg.tolerance, cfg.deta_w),
    "pen_fine": lambda info: ins_penalizer(info["raw_fine"], info["z_vals_fine"], info["depth_fine"], batch.rays_d, cfg.tolerance, cfg.deta_w),
}
for name, fn in COMPONENTS.items():
    val, grads = jax.value_and_grad(lambda ps: fn(render(ps)))((state.params_coarse, state.params_fine))
    bad = [jax.tree_util.tree_flatten_with_path(grads)[0][j][0]
           for j, (p, l) in enumerate(jax.tree_util.tree_flatten_with_path(grads)[0])
           if bool(jnp.any(~jnp.isfinite(l)))]
    print(f"{name}: value={float(val):.4f} nan_grads={[str(b) for b in bad][:6]}", flush=True)

# ---- dump repro state for fast iteration ----
import pickle
with open("/tmp/nan_repro.pkl", "wb") as f:
    pickle.dump(jax.tree_util.tree_map(np.asarray, ((state.params_coarse, state.params_fine), batch, k_step, info)), f)
print("dumped /tmp/nan_repro.pkl", flush=True)

# ---- penalizer internals on the fine bundle ----
import math
raw = info["raw_fine"]; z_vals = info["z_vals_fine"]; depth = info["depth_fine"]; rays_d = batch.rays_d
tolerance, deta_w = cfg.tolerance, cfg.deta_w
depth_ = jax.lax.stop_gradient(depth)[..., None]
norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
dists_before = (depth_ - tolerance) * norm
dists_after = (depth_ + tolerance) * norm
depth_dist = depth_ * norm
p_dists = z_vals * norm
delta = depth_dist - p_dists
gauss = jnp.exp(-(delta ** 2) / (2.0 * deta_w ** 2)) / (0.4 * math.sqrt(2.0 * math.pi)) + 1e-8
gauss_air = 1.0 - gauss
mask_before = (p_dists < dists_before).astype(raw.dtype)
mask_after = (p_dists > dists_after).astype(raw.dtype)
mask_middle = 1.0 - (mask_after + mask_before)
pred_ins = jax.nn.sigmoid(raw[..., 4:])
n_ch = pred_ins.shape[-1]
air = jnp.zeros((n_ch,), raw.dtype).at[-1].set(1.0)
bce_before = -air * jnp.log(jnp.maximum(pred_ins, 1e-8)) - (1.0 - air) * jnp.log(jnp.maximum(1.0 - pred_ins, 1e-8))
w_before = gauss_air * mask_before
loss_before_num = jnp.sum(bce_before * w_before[..., None])
loss_before_den = n_ch * jnp.maximum(jnp.sum(mask_before), 1e-8)
air_prob = pred_ins[..., -1]
bce_middle = -jnp.log(jnp.maximum(1.0 - air_prob, 1e-8))
w_middle = gauss * mask_middle
loss_middle_num = jnp.sum(bce_middle * w_middle)
loss_middle_den = jnp.maximum(jnp.sum(mask_middle), 1e-8)
for name, v in [("depth", depth), ("norm", norm), ("delta", delta), ("gauss", gauss),
                ("mask_before", mask_before), ("mask_middle", mask_middle),
                ("pred_ins", pred_ins), ("bce_before", bce_before), ("w_before", w_before),
                ("num_b", loss_before_num), ("den_b", loss_before_den),
                ("bce_middle", bce_middle), ("w_middle", w_middle),
                ("num_m", loss_middle_num), ("den_m", loss_middle_den)]:
    v = jnp.asarray(v)
    print(f"  {name:12s} finite={bool(jnp.all(jnp.isfinite(v)))} min={float(jnp.min(v)):.3e} max={float(jnp.max(v)):.3e}", flush=True)
