"""Prototype: composite-fused render kernels (probe before integration).

Fine kernel: PE + MLP + volume compositing in ONE pallas_call — raw [T, 37]
never leaves VMEM; outputs [R, 4+C] per tile (rgb, depth, ins). Compositing
in-kernel without reshapes:
  * alpha/transmittance in per-ray [R, S] layout (z ships as an [R, S] block);
    the single [T,1]->[R,S] sigma reshape is a tiny VMEM relayout;
  * exclusive log-transmittance cumsum = [R,S] @ strictly-lower Tri[S,S] (MXU);
  * the per-ray weighted reduction = block-diagonal selector matmul
    Wsel [R, R*S] @ vals [R*S, 3+C] (MXU, HIGHEST) — no batched matvec.
Coarse kernel: same, stops at weights -> out [R, S] (all sample_pdf needs).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev/fused_render_probe.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmnerf_tpu.configs import Config
from dmnerf_tpu.core.mlp import sigma_stub_params
from dmnerf_tpu.core.rays import rays_from_K
from dmnerf_tpu.core.sampling import sample_pdf, z_val_sample
from dmnerf_tpu.kernels.fused_mlp import (
    _COMPILER_PARAMS, _emb_dim, _forward_core, _freq_matrix, _fuse_layout,
    _fuse_ops, _layer_kinds, _load_wv, _pack, _pe_transposed,
)
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


def _hi_dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _render_kernel(kinds, layout, n_pairs, Wf, Wi, cache_dtype, multires,
                   pe_exact, R, S, weights_only, *refs):
    n_ops = 2 * len(layout)
    (xT_ref, edT_ref, z_ref, dn_ref, FpT_ref, tri_ref) = refs[:6]
    wrefs = refs[6:6 + n_ops]
    out_ref = refs[6 + n_ops]
    cast = (lambda a: a.astype(cache_dtype)) if cache_dtype is not None else (lambda a: a)
    eT = cast(_pe_transposed(xT_ref[:], FpT_ref[:], multires, pe_exact))
    wv = _load_wv(wrefs, layout, n_pairs)
    out, _ = _forward_core(eT, edT_ref[:], wv, kinds, Wf, Wi, cache_dtype,
                           want_cache=False, transposed=True)
    z = z_ref[:]
    sigma = out[:, 3:4].reshape(R, S)
    dists = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full((R, 1), 1e10, z.dtype)], axis=1) * dn_ref[:]
    alpha = 1.0 - jnp.exp(-jnp.maximum(sigma, 0.0) * dists)
    lg = jnp.log(jnp.maximum(1.0 - alpha, 1e-10))
    w = alpha * jnp.exp(_hi_dot(lg, tri_ref[:]))
    if weights_only:
        out_ref[:] = w
        return
    depth = jnp.sum(w * z, axis=1, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, (R, R * S), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, R * S), 0)
    wsel = jnp.where(iota // S == row, jnp.tile(w, (1, R)), 0.0)
    vals = jnp.concatenate([jax.nn.sigmoid(out[:, :3]), out[:, 4:]], axis=1)
    acc = _hi_dot(wsel, vals)
    out_ref[:] = jnp.concatenate(
        [acc[:, :3], depth, jax.nn.sigmoid(acc[:, 3:])], axis=1)


def make_fused_pass(params_shape_like, multires=10, multires_views=4, D=8,
                    skips=(4,), R=16, weights_only=False, interpret=False,
                    cache_dtype=jnp.bfloat16):
    kinds = tuple(_layer_kinds(D, tuple(skips)))
    FpT = jnp.asarray(_freq_matrix(multires).T)
    pe_exact = False
    Ed = _emb_dim(multires_views)

    def run(params, rays_o, rays_d, z):
        """rays [N,3] (N % R == 0), z [N, S] -> weights [N,S] or maps [N, 4+C]."""
        N, S = z.shape
        assert N % R == 0, (N, R)
        T = R * S
        flat = _pack(params, multires, multires_views, D, tuple(skips))
        layout = _fuse_layout([w.shape for w in flat[::2]])
        packed = [w.astype(cache_dtype) if i % 2 == 0 else w
                  for i, w in enumerate(_fuse_ops(flat, layout))]
        n_pairs = len(flat) // 2
        Wf = params["rgb_feat_w"].shape[1]
        Wi = params["ins_feat_w"].shape[1]
        C4 = params["ins_out_w"].shape[1] + 4

        d = jnp.where(jnp.sum(rays_d * rays_d, -1, keepdims=True) > 0,
                      rays_d, jnp.ones_like(rays_d))
        vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        dn = jnp.linalg.norm(d, axis=-1, keepdims=True)
        pts = rays_o[..., None, :] + d[..., None, :] * z[..., :, None]
        xT = pts.reshape(N * S, 3).T
        # per-ray viewdir embedding, repeated per sample (as the query path does)
        freqs = jnp.asarray([2.0 ** f for f in range(multires_views)], jnp.float32)
        xs = (vd[:, None, :] * freqs[:, None]).reshape(N, -1)
        edr = jnp.concatenate([vd, jnp.sin(xs), jnp.cos(xs)], axis=-1).astype(cache_dtype)
        edT = jnp.repeat(edr.T, S, axis=1)
        tri = jnp.asarray(np.tril(np.ones((S, S), np.float32), -1).T)  # [s', s] = s' < s

        kern = functools.partial(_render_kernel, kinds, layout, n_pairs, Wf, Wi,
                                 cache_dtype, multires, pe_exact, R, S,
                                 weights_only)
        out_w = S if weights_only else C4
        grid = (N // R,)
        specs = [
            pl.BlockSpec((3, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ed, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(FpT.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tri.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
             for w in packed]
        res = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, out_w), jnp.float32),
            grid=grid,
            in_specs=specs,
            out_specs=pl.BlockSpec((R, out_w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(xT, edT, z, dn, FpT, tri, *packed)
        return res

    return run


def make_fused_renderer(cfg, R=16, chunk=2048):
    coarse = make_fused_pass(None, cfg.multires, cfg.multires_views, cfg.netdepth,
                             tuple(cfg.skips), R=R, weights_only=True)
    fine = make_fused_pass(None, cfg.multires, cfg.multires_views, cfg.netdepth,
                           tuple(cfg.skips), R=R, weights_only=False)
    z_c = z_val_sample(chunk, cfg.near, cfg.far, cfg.N_samples)

    @jax.jit
    def render(pc, pf, ro, rd):
        n = ro.shape[0]
        pad = (-n) % chunk
        if pad:
            ro = jnp.concatenate([ro, jnp.zeros((pad, 3), ro.dtype)])
            rd = jnp.concatenate([rd, jnp.zeros((pad, 3), rd.dtype)])
        pcs = sigma_stub_params(pc)

        def one_chunk(args):
            o, d = args
            w = coarse(pcs, o, d, z_c)
            z_mid = 0.5 * (z_c[..., 1:] + z_c[..., :-1])
            z_s = sample_pdf(z_mid, w[..., 1:-1], cfg.N_importance, key=None)
            z_f = jnp.sort(jnp.concatenate(
                [jnp.broadcast_to(z_c, z_s.shape[:-1] + z_c.shape[-1:]), z_s],
                -1), -1)
            maps = fine(pf, o, d, z_f)
            return {"rgb": maps[:, :3], "depth": maps[:, 3],
                    "ins": maps[:, 4:-1]}  # drop the trailing air channel

        out = jax.lax.map(one_chunk, (ro.reshape(-1, chunk, 3),
                                      rd.reshape(-1, chunk, 3)))
        return {k: v.reshape(-1, *v.shape[2:])[:n] for k, v in out.items()}

    return render


def main():
    cfg = Config(N_train=3072, N_samples=64, N_importance=128, N_test=2048,
                 near=2.0, far=7.0, ins_num=32)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    K = jnp.asarray([[300.0, 0, W / 2], [0, -300.0, H / 2], [0, 0, -1.0]])
    ro, rd = rays_from_K(H, W, K, jnp.eye(4))
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    pc, pf = state.params_coarse, state.params_fine

    from dmnerf_tpu.render.renderer import make_image_renderer

    prod = make_image_renderer(cfg.replace(N_test=2048))
    ref = prod(pc, pf, ro, rd)

    for R in (16, 32):
        r = make_fused_renderer(cfg, R=R, chunk=2048)
        ms = timer(r, pc, pf, ro, rd)
        log(f"fused_render R={R} chunk=2048: {ms:.1f} ms")
        out = r(pc, pf, ro, rd)
        for k in ("rgb", "ins", "depth"):
            err = float(jnp.max(jnp.abs(out[k] - ref[k])))
            log(f"  vs prod max|d{k}| = {err:.2e}")


if __name__ == "__main__":
    main()
