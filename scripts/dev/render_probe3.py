"""Round-4 render probe 3: monolithic (chunk-free) render structure.

Hypothesis: the residual render slack is lax.map loop structure + per-call grid
fixed overhead, not glue math. Variants:
  mono_fine      ONE Pallas call over all 65536x192 points (vs 127.6 ms chunked)
  mono_full      chunk-free renderer: coarse one call -> full-array glue ->
                 fine one call -> full-array composite
  tile sweep     tile_fwd 4096 vs 8192 for the monolithic calls

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev/render_probe3.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from dmnerf_tpu.configs import Config
from dmnerf_tpu.core.compositor import composite, exclusive_cumprod_one_minus
from dmnerf_tpu.core.mlp import sigma_stub_params
from dmnerf_tpu.core.rays import rays_from_K
from dmnerf_tpu.core.sampling import sample_pdf, z_val_sample
from dmnerf_tpu.kernels.fused_mlp import make_pallas_query_fn
from dmnerf_tpu.render.trainstep import create_train_state

H = W = 256
REPS = 5


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


def weights_from(raw_sigma, z_vals, rays_d):
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    alpha = 1.0 - jnp.exp(-jax.nn.relu(raw_sigma) * dists)
    return alpha * exclusive_cumprod_one_minus(alpha)


def make_mono_renderer(cfg, tile_fwd):
    q = make_pallas_query_fn(cfg.multires, cfg.multires_views, cfg.netdepth,
                             tuple(cfg.skips), tile_fwd=tile_fwd)

    @jax.jit
    def render(pc, pf, ro, rd):
        n = ro.shape[0]
        d = jnp.where(jnp.sum(rd * rd, -1, keepdims=True) > 0, rd, jnp.ones_like(rd))
        vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        pcs = sigma_stub_params(pc)
        z_c = z_val_sample(n, cfg.near, cfg.far, cfg.N_samples)
        pts_c = ro[..., None, :] + d[..., None, :] * z_c[..., :, None]
        raw_c = q(pcs, pts_c, vd)
        w = weights_from(raw_c[..., 3], z_c, d)
        z_mid = 0.5 * (z_c[..., 1:] + z_c[..., :-1])
        z_s = sample_pdf(z_mid, w[..., 1:-1], cfg.N_importance, key=None)
        z_f = jnp.sort(jnp.concatenate([z_c, z_s], -1), -1)
        pts_f = ro[..., None, :] + d[..., None, :] * z_f[..., :, None]
        raw_f = q(pf, pts_f, vd)
        wf = weights_from(raw_f[..., 3], z_f, d)
        rgb = jnp.sum(wf[..., None] * jax.nn.sigmoid(raw_f[..., :3]), -2)
        depth = jnp.sum(wf * z_f, -1)
        ins = jax.nn.sigmoid(jnp.sum(wf[..., None] * raw_f[..., 4:], -2))[..., :-1]
        return {"rgb": rgb, "ins": ins, "depth": depth}

    return render


def main():
    cfg = Config(N_train=3072, N_samples=64, N_importance=128, N_test=4096,
                 near=2.0, far=7.0, ins_num=32)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    K = jnp.asarray([[300.0, 0, W / 2], [0, -300.0, H / 2], [0, 0, -1.0]])
    ro, rd = rays_from_K(H, W, K, jnp.eye(4))
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    pc, pf = state.params_coarse, state.params_fine

    for tile in (4096, 8192):
        q = make_pallas_query_fn(cfg.multires, cfg.multires_views, cfg.netdepth,
                                 tuple(cfg.skips), tile_fwd=tile)
        z_f = z_val_sample(ro.shape[0], cfg.near, cfg.far,
                           cfg.N_samples + cfg.N_importance)

        def mono_fine(pf_, o, d):
            d = jnp.where(jnp.sum(d * d, -1, keepdims=True) > 0, d, jnp.ones_like(d))
            vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            pts = o[..., None, :] + d[..., None, :] * z_f[..., :, None]
            return jnp.sum(q(pf_, pts, vd))

        ms = timer(mono_fine, pf, ro, rd)
        log(f"mono_fine tile={tile}: {ms:.1f} ms")

    for tile in (4096, 8192):
        r = make_mono_renderer(cfg, tile)
        ms = timer(r, pc, pf, ro, rd)
        log(f"mono_full tile={tile}: {ms:.1f} ms")

    # parity vs production renderer
    from dmnerf_tpu.render.renderer import make_image_renderer

    prod = make_image_renderer(cfg)
    a = prod(pc, pf, ro, rd)
    b = make_mono_renderer(cfg, 4096)(pc, pf, ro, rd)
    for k in ("rgb", "ins", "depth"):
        log(f"  mono vs prod max|d{k}| = {float(jnp.max(jnp.abs(a[k] - b[k]))):.2e}")


if __name__ == "__main__":
    main()
