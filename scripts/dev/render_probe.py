"""Render-path stage attribution on TPU (round-4 lever: 193 ms -> forward SoL).

Breaks the chunked image render (render/renderer.py) into stages, each timed as
its own lax.map-chunked jit so the deltas attribute the glue between the two
Pallas sweeps:

  full_<chunk>   the production renderer (sigma-stub coarse pass)
  queries        coarse(stub,64) + fine(192) queries at FIXED z — no composite,
                 no sample_pdf, no sort: the pure kernel cost at render chunking
  noglue         queries + coarse-weights + fine composite, fixed fine z — full
                 minus {sample_pdf, union sort, weights->pts serialization}
  merge          renderer variant: union sort replaced by rank-based merge of
                 two sorted sequences (z_coarse is a constant linspace; det-mode
                 sample_pdf output is monotone in u, so both inputs are sorted)

Timing: scalar-reduce + float() fence (the only reliable fence under the axon
tunnel); every number carries the ~1 ms RPC dispatch floor.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev/render_probe.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.configs import Config
from dmnerf_tpu.core.compositor import composite
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


def merge_sorted(a, b):
    """Merge two per-row-sorted arrays [N,Sa]+[N,Sb] -> [N,Sa+Sb] sorted.
    Rank-by-comparison + one-hot contraction (no scatter, no bitonic sort)."""
    Sa, Sb = a.shape[-1], b.shape[-1]
    S = Sa + Sb
    ra = jnp.arange(Sa) + jnp.sum((b[..., None, :] < a[..., :, None]), axis=-1)
    rb = jnp.arange(Sb) + jnp.sum((a[..., None, :] <= b[..., :, None]), axis=-1)
    iota = jnp.arange(S)
    oh_a = (iota == ra[..., None]).astype(a.dtype)
    oh_b = (iota == rb[..., None]).astype(b.dtype)
    return jnp.einsum("nsm,ns->nm", oh_a, a) + jnp.einsum("nsm,ns->nm", oh_b, b)


def chunked(fn, chunk, *ray_arrays):
    """lax.map over ray chunks, summing whatever fn returns (keeps all live)."""
    n = ray_arrays[0].shape[0]
    pad = (-n) % chunk
    arrs = [jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
            if pad else x for x in ray_arrays]
    arrs = [x.reshape(-1, chunk, *x.shape[1:]) for x in arrs]
    out = jax.lax.map(fn, tuple(arrs))
    return out


def main():
    cfg = Config(N_train=3072, N_samples=64, N_importance=128, N_test=4096,
                 near=2.0, far=7.0, ins_num=32)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    q = make_query_fn(cfg)
    K = jnp.asarray([[300.0, 0, W / 2], [0, -300.0, H / 2], [0, 0, -1.0]])
    ro, rd = rays_from_K(H, W, K, jnp.eye(4))
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    pc, pf = state.params_coarse, state.params_fine
    pcs = sigma_stub_params(pc)

    # ---- full renderer at several chunk sizes
    for chunk in (2048, 4096, 8192):
        r = make_image_renderer(cfg.replace(N_test=chunk))
        ms = timer(r, pc, pf, ro, rd)
        log(f"full_{chunk}: {ms:.1f} ms")

    chunk = 4096
    z_c = z_val_sample(chunk, cfg.near, cfg.far, cfg.N_samples)
    z_f_fixed = z_val_sample(chunk, cfg.near, cfg.far,
                             cfg.N_samples + cfg.N_importance)

    def queries(args):
        o, d = args
        d = jnp.where(jnp.sum(d * d, -1, keepdims=True) > 0, d, jnp.ones_like(d))
        vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        pts_c = o[..., None, :] + d[..., None, :] * z_c[..., :, None]
        pts_f = o[..., None, :] + d[..., None, :] * z_f_fixed[..., :, None]
        raw_c = q(pcs, pts_c, vd)
        raw_f = q(pf, pts_f, vd)
        return jnp.sum(raw_c) + jnp.sum(raw_f)

    ms = timer(lambda o, d: chunked(queries, chunk, o, d), ro, rd)
    log(f"queries_{chunk} (fixed z, no glue): {ms:.1f} ms")

    def fine_only(args):
        o, d = args
        d = jnp.where(jnp.sum(d * d, -1, keepdims=True) > 0, d, jnp.ones_like(d))
        vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        pts_f = o[..., None, :] + d[..., None, :] * z_f_fixed[..., :, None]
        return jnp.sum(q(pf, pts_f, vd))

    ms = timer(lambda o, d: chunked(fine_only, chunk, o, d), ro, rd)
    log(f"fine_only_{chunk}: {ms:.1f} ms")

    def noglue(args):
        o, d = args
        d = jnp.where(jnp.sum(d * d, -1, keepdims=True) > 0, d, jnp.ones_like(d))
        vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        pts_c = o[..., None, :] + d[..., None, :] * z_c[..., :, None]
        raw_c = q(pcs, pts_c, vd)
        w = composite(raw_c, z_c, d).weights
        pts_f = o[..., None, :] + d[..., None, :] * z_f_fixed[..., :, None]
        out_f = composite(q(pf, pts_f, vd), z_f_fixed, d)
        return jnp.sum(w) + jnp.sum(out_f.rgb) + jnp.sum(out_f.ins) + jnp.sum(out_f.depth)

    ms = timer(lambda o, d: chunked(noglue, chunk, o, d), ro, rd)
    log(f"noglue_{chunk} (composites, fixed fine z): {ms:.1f} ms")

    # ---- merge-based renderer (rank merge instead of union sort)
    def merge_chunk(args):
        o, d = args
        d = jnp.where(jnp.sum(d * d, -1, keepdims=True) > 0, d, jnp.ones_like(d))
        vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        pts_c = o[..., None, :] + d[..., None, :] * z_c[..., :, None]
        raw_c = q(pcs, pts_c, vd)
        w = composite(raw_c, z_c, d).weights
        z_mid = 0.5 * (z_c[..., 1:] + z_c[..., :-1])
        z_s = sample_pdf(z_mid, w[..., 1:-1], cfg.N_importance, key=None)
        z_f = merge_sorted(jnp.broadcast_to(z_c, z_s.shape[:-1] + z_c.shape[-1:]), z_s)
        pts_f = o[..., None, :] + d[..., None, :] * z_f[..., :, None]
        out_f = composite(q(pf, pts_f, vd), z_f, d)
        return {"rgb": out_f.rgb, "ins": out_f.ins, "depth": out_f.depth}

    ms = timer(lambda o, d: chunked(merge_chunk, chunk, o, d), ro, rd)
    log(f"full_merge_{chunk}: {ms:.1f} ms")

    # correctness of the merge against jnp.sort on real weights
    def sort_chunk(args):
        o, d = args
        d = jnp.where(jnp.sum(d * d, -1, keepdims=True) > 0, d, jnp.ones_like(d))
        vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        pts_c = o[..., None, :] + d[..., None, :] * z_c[..., :, None]
        raw_c = q(pcs, pts_c, vd)
        w = composite(raw_c, z_c, d).weights
        z_mid = 0.5 * (z_c[..., 1:] + z_c[..., :-1])
        z_s = sample_pdf(z_mid, w[..., 1:-1], cfg.N_importance, key=None)
        return jnp.sort(jnp.concatenate([jnp.broadcast_to(z_c, z_s.shape[:-1] + z_c.shape[-1:]), z_s], -1), -1)

    def merge_z(args):
        o, d = args
        d = jnp.where(jnp.sum(d * d, -1, keepdims=True) > 0, d, jnp.ones_like(d))
        vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        pts_c = o[..., None, :] + d[..., None, :] * z_c[..., :, None]
        raw_c = q(pcs, pts_c, vd)
        w = composite(raw_c, z_c, d).weights
        z_mid = 0.5 * (z_c[..., 1:] + z_c[..., :-1])
        z_s = sample_pdf(z_mid, w[..., 1:-1], cfg.N_importance, key=None)
        return merge_sorted(jnp.broadcast_to(z_c, z_s.shape[:-1] + z_c.shape[-1:]), z_s)

    a = jax.jit(lambda o, d: chunked(sort_chunk, chunk, o, d))(ro[:chunk], rd[:chunk])
    b = jax.jit(lambda o, d: chunked(merge_z, chunk, o, d))(ro[:chunk], rd[:chunk])
    err = float(jnp.max(jnp.abs(a - b)))
    log(f"merge vs sort max|dz| = {err:.2e}")


if __name__ == "__main__":
    main()
