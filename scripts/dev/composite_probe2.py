"""In-render composite-formulation sweep (standalone timings sit at the dispatch
floor — only full-render differences are trustworthy).

Variants over the fine composite + coarse weights chain, at chunk 2048:
  v1  production: broadcast multiply + reduce over the MIDDLE axis [N,S,C]
  v2  transpose-minor: swapaxes to [N,C,S], elementwise, reduce over MINOR axis
  v3  cumsum-as-matmul: strictly-lower-triangular ones on the MXU for the
      exclusive transmittance log-sum (both passes)
  v23 v2 + v3

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev/composite_probe2.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from dmnerf_tpu.configs import Config
from dmnerf_tpu.core.mlp import sigma_stub_params
from dmnerf_tpu.core.pipeline import make_query_fn
from dmnerf_tpu.core.rays import rays_from_K
from dmnerf_tpu.core.sampling import sample_pdf, z_val_sample
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


def weights_v(sigma, z_vals, rays_d, matmul_cumsum: bool):
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    lg = jnp.log(jnp.maximum(1.0 - alpha, 1e-10))
    if matmul_cumsum:
        S = lg.shape[-1]
        # exclusive cumsum: strictly-lower-triangular ones, contracted on the MXU
        tri = jnp.asarray((jnp.arange(S)[:, None] > jnp.arange(S)[None, :]),
                          lg.dtype)
        t = jnp.exp(jax.lax.dot_general(
            lg, tri, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST))
    else:
        log_t = jnp.cumsum(lg, axis=-1)
        t = jnp.concatenate(
            [jnp.ones_like(log_t[..., :1]), jnp.exp(log_t)[..., :-1]], axis=-1)
    return alpha * t


def make_variant(cfg, q, reduce_minor: bool, matmul_cumsum: bool):
    chunk = cfg.N_test
    z_c = z_val_sample(chunk, cfg.near, cfg.far, cfg.N_samples)

    def one_chunk(pcs, pf, args):
        o, d = args
        d = jnp.where(jnp.sum(d * d, -1, keepdims=True) > 0, d, jnp.ones_like(d))
        vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        pts_c = o[..., None, :] + d[..., None, :] * z_c[..., :, None]
        raw_c = q(pcs, pts_c, vd)
        w = weights_v(raw_c[..., 3], z_c, d, matmul_cumsum)
        z_mid = 0.5 * (z_c[..., 1:] + z_c[..., :-1])
        z_s = sample_pdf(z_mid, w[..., 1:-1], cfg.N_importance, key=None)
        z_f = jnp.sort(jnp.concatenate(
            [jnp.broadcast_to(z_c, z_s.shape[:-1] + z_c.shape[-1:]), z_s], -1), -1)
        pts_f = o[..., None, :] + d[..., None, :] * z_f[..., :, None]
        raw_f = q(pf, pts_f, vd)
        wf = weights_v(raw_f[..., 3], z_f, d, matmul_cumsum)
        vals = jnp.concatenate(
            [jax.nn.sigmoid(raw_f[..., :3]), z_f[..., None], raw_f[..., 4:]], -1)
        if reduce_minor:
            acc = jnp.sum(jnp.swapaxes(vals, -1, -2) * wf[..., None, :], -1)
        else:
            acc = jnp.sum(vals * wf[..., None], -2)
        return {"rgb": acc[..., :3], "depth": acc[..., 3],
                "ins": jax.nn.sigmoid(acc[..., 4:])[..., :-1]}

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
    base = Config(N_train=3072, N_samples=64, N_importance=128, N_test=2048,
                  near=2.0, far=7.0, ins_num=32)
    state = create_train_state(base, jax.random.PRNGKey(0))
    q = make_query_fn(base)
    K = jnp.asarray([[300.0, 0, W / 2], [0, -300.0, H / 2], [0, 0, -1.0]])
    ro, rd = rays_from_K(H, W, K, jnp.eye(4))
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    pc, pf = state.params_coarse, state.params_fine

    results = {}
    for name, rm, mc in [("v1", False, False), ("v2_minor", True, False),
                         ("v3_mxu_cumsum", False, True), ("v23", True, True)]:
        r = make_variant(base, q, rm, mc)
        ms = timer(r, pc, pf, ro, rd)
        results[name] = r
        log(f"{name} chunk=2048: {ms:.1f} ms")

    a = results["v1"](pc, pf, ro[:4096], rd[:4096])
    b = results["v23"](pc, pf, ro[:4096], rd[:4096])
    for k in ("rgb", "ins", "depth"):
        log(f"  v23 vs v1 max|d{k}| = {float(jnp.max(jnp.abs(a[k] - b[k]))):.2e}")


if __name__ == "__main__":
    main()
