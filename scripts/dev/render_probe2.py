"""Round-4 render-variant probe: einsum compositor + finer chunk sweep, in-render
(differencing against render_probe.py's attribution; standalone glue timings sit
at the tunnel dispatch floor and are meaningless).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev/render_probe2.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from dmnerf_tpu.configs import Config
from dmnerf_tpu.core.compositor import exclusive_cumprod_one_minus
from dmnerf_tpu.core.mlp import sigma_stub_params
from dmnerf_tpu.core.pipeline import make_query_fn
from dmnerf_tpu.core.rays import rays_from_K
from dmnerf_tpu.core.sampling import sample_pdf, z_val_sample
from dmnerf_tpu.render.renderer import make_image_renderer
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


def make_variant_renderer(cfg, q, einsum_comp: bool):
    chunk = cfg.N_test
    z_c = z_val_sample(chunk, cfg.near, cfg.far, cfg.N_samples)

    def one_chunk(pcs, pf, args):
        o, d = args
        d = jnp.where(jnp.sum(d * d, -1, keepdims=True) > 0, d, jnp.ones_like(d))
        vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        pts_c = o[..., None, :] + d[..., None, :] * z_c[..., :, None]
        raw_c = q(pcs, pts_c, vd)
        w = weights_from(raw_c[..., 3], z_c, d)
        z_mid = 0.5 * (z_c[..., 1:] + z_c[..., :-1])
        z_s = sample_pdf(z_mid, w[..., 1:-1], cfg.N_importance, key=None)
        z_f = jnp.sort(jnp.concatenate(
            [jnp.broadcast_to(z_c, z_s.shape[:-1] + z_c.shape[-1:]), z_s], -1), -1)
        pts_f = o[..., None, :] + d[..., None, :] * z_f[..., :, None]
        raw_f = q(pf, pts_f, vd)
        wf = weights_from(raw_f[..., 3], z_f, d)
        if einsum_comp:
            vals = jnp.concatenate(
                [jax.nn.sigmoid(raw_f[..., :3]), z_f[..., None], raw_f[..., 4:]], -1)
            acc = jnp.einsum("ns,nsc->nc", wf, vals)
            return {"rgb": acc[..., :3], "ins": jax.nn.sigmoid(acc[..., 4:]),
                    "depth": acc[..., 3]}
        rgb = jnp.sum(wf[..., None] * jax.nn.sigmoid(raw_f[..., :3]), -2)
        depth = jnp.sum(wf * z_f, -1)
        ins = jax.nn.sigmoid(jnp.sum(wf[..., None] * raw_f[..., 4:], -2))
        return {"rgb": rgb, "ins": ins, "depth": depth}

    @jax.jit
    def render(pc, pf, ro, rd):
        n = ro.shape[0]
        pad = (-n) % chunk
        if pad:
            ro = jnp.concatenate([ro, jnp.zeros((pad, 3), ro.dtype)])
            rd = jnp.concatenate([rd, jnp.zeros((pad, 3), rd.dtype)])
        pcs = sigma_stub_params(pc)
        out = jax.lax.map(lambda a: one_chunk(pcs, pf, a),
                          (ro.reshape(-1, chunk, 3), rd.reshape(-1, chunk, 3)))
        return {k: v.reshape(-1, *v.shape[2:])[:n] for k, v in out.items()}

    return render


def main():
    base = Config(N_train=3072, N_samples=64, N_importance=128, N_test=4096,
                  near=2.0, far=7.0, ins_num=32)
    state = create_train_state(base, jax.random.PRNGKey(0))
    q = make_query_fn(base)
    K = jnp.asarray([[300.0, 0, W / 2], [0, -300.0, H / 2], [0, 0, -1.0]])
    ro, rd = rays_from_K(H, W, K, jnp.eye(4))
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    pc, pf = state.params_coarse, state.params_fine

    for chunk in (1024, 2048, 4096):
        cfg = base.replace(N_test=chunk)
        for einsum_comp in (False, True):
            r = make_variant_renderer(cfg, q, einsum_comp)
            ms = timer(r, pc, pf, ro, rd)
            log(f"variant chunk={chunk} einsum={einsum_comp}: {ms:.1f} ms")

    # sanity: production renderer at 1024/2048 for an apples-to-apples row
    for chunk in (1024,):
        r = make_image_renderer(base.replace(N_test=chunk))
        ms = timer(r, pc, pf, ro, rd)
        log(f"full_{chunk}: {ms:.1f} ms")


if __name__ == "__main__":
    main()
