"""NaN bisection workflow: replay training to the first non-finite step, then
decompose the failing step by loss component and dump a pickled repro state.

Why not jax_debug_nans: enabling it changes compilation (disables fusions), which
can HIDE fusion-induced NaNs — the class of bug this tool exists for (a fused
`1 - p + eps` reassociating to `1 - p` produced log(0)*0 = NaN only under jit; see
objfield/penalizer.py). The workflow here re-runs the real compiled step and then
re-jits per-component subgraphs on the captured pre-failure state.

CLI:
  python -m dmnerf_tpu.tools.nan_hunt --config cfg.txt [--max-steps 500]
                                      [--repro-out /tmp/nan_repro.pkl]

The pickle holds ((params_coarse, params_fine), batch, step_key, all_info) as
numpy — reload it to iterate on a suspect subgraph without retraining.
"""

from __future__ import annotations

import argparse
import pickle


def has_nan(tree) -> bool:
    import jax
    import jax.numpy as jnp

    return any(bool(jnp.any(~jnp.isfinite(l))) for l in jax.tree_util.tree_leaves(tree))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", required=True, help="training config txt")
    ap.add_argument("--max-steps", type=int, default=500)
    ap.add_argument("--repro-out", default="/tmp/nan_repro.pkl")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args(argv)

    if args.cpu:
        import os

        os.environ.setdefault("JAX_PLATFORMS", "cpu")

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
    from dmnerf_tpu.render.trainstep import create_train_state, make_train_step

    cfg = load_config(args.config)
    scene = load_scene(cfg)
    cfg = cfg.replace(ins_num=scene.ins_num)
    key = jax.random.PRNGKey(cfg.seed)
    key, init_key = jax.random.split(key)
    state = create_train_state(cfg, init_key)
    sampler = make_full_sampler(scene.images, scene.gt_labels, scene.poses,
                                scene.K, scene.i_train, cfg.N_train)
    step = jax.jit(make_train_step(cfg, jit=False))  # no donation: we inspect pre-step state

    prev = None
    for i in range(args.max_steps):
        key, k_batch, k_step = jax.random.split(key, 3)
        batch = sampler(k_batch)
        new_state, aux = step(state, batch, k_step)
        if not np.isfinite(float(aux["total_loss"])) or has_nan(
                (new_state.params_coarse, new_state.params_fine)):
            print(f"first bad step: {i}, total={float(aux['total_loss'])}", flush=True)
            prev = (state, batch, k_step)
            break
        state = new_state
    else:
        print(f"no NaN in {args.max_steps} steps — nothing to bisect")
        return 0

    state, batch, k_step = prev
    query = make_xla_query_fn(cfg.multires, cfg.multires_views, cfg.netdepth, tuple(cfg.skips))
    z = z_val_sample(cfg.N_train, cfg.near, cfg.far, cfg.N_samples)
    print("pre-step params finite:",
          not has_nan((state.params_coarse, state.params_fine)), flush=True)

    def render(ps):
        return render_rays(ps[0], ps[1], batch.rays_o, batch.rays_d, z, query,
                           N_importance=cfg.N_importance, perturb=cfg.perturb > 0, key=k_step)

    info = render((state.params_coarse, state.params_fine))
    for k, v in info.items():
        print(f"  fwd {k}: finite={bool(jnp.all(jnp.isfinite(v)))}", flush=True)

    components = {
        "rgb": lambda info: img2mse(info["rgb_coarse"], batch.target_c)
                            + img2mse(info["rgb_fine"], batch.target_c),
        "ins_coarse": lambda info: ins_criterion(info["ins_coarse"], batch.target_i, cfg.ins_num)[0],
        "ins_fine": lambda info: ins_criterion(info["ins_fine"], batch.target_i, cfg.ins_num)[0],
        "pen_coarse": lambda info: ins_penalizer(info["raw_coarse"], info["z_vals_coarse"],
                                                 info["depth_coarse"], batch.rays_d,
                                                 cfg.tolerance, cfg.deta_w),
        "pen_fine": lambda info: ins_penalizer(info["raw_fine"], info["z_vals_fine"],
                                               info["depth_fine"], batch.rays_d,
                                               cfg.tolerance, cfg.deta_w),
    }
    for name, fn in components.items():
        val, grads = jax.value_and_grad(lambda ps: fn(render(ps)))(
            (state.params_coarse, state.params_fine))
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        bad = [str(p) for p, l in flat if bool(jnp.any(~jnp.isfinite(l)))]
        print(f"{name}: value={float(val):.4f} nan_grads={bad[:6]}", flush=True)

    with open(args.repro_out, "wb") as f:
        pickle.dump(jax.tree_util.tree_map(
            np.asarray, ((state.params_coarse, state.params_fine), batch, k_step, info)), f)
    print(f"dumped {args.repro_out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
