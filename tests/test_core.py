"""Unit tests for core math: positional encoding, MLP, sampling, compositor.

Goldens are hand-derived from the documented reference semantics
(/root/reference/networks/dm_nerf.py, render.py, helpers.py) via independent NumPy
implementations — not traced from the reference code.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmnerf_tpu.core import (
    positional_encoding,
    embed_dim,
    init_dm_nerf,
    dm_nerf_apply,
    z_val_sample,
    sample_pdf,
    composite,
    render_rays,
)
from dmnerf_tpu.core.pipeline import make_xla_query_fn
from dmnerf_tpu.core.rays import rays_from_K, rays_for_pixels


def test_embed_dims():
    assert embed_dim(10) == 63
    assert embed_dim(4) == 27
    assert embed_dim(-1) == 3


def test_positional_encoding_matches_numpy_golden():
    x = np.random.RandomState(0).randn(5, 3).astype(np.float32)
    out = np.asarray(positional_encoding(jnp.asarray(x), 4))
    # reference channel order: [x, sin(x*1), cos(x*1), sin(x*2), cos(x*2), ...]
    blocks = [x]
    for f in [1.0, 2.0, 4.0, 8.0]:
        blocks.append(np.sin(x * f))
        blocks.append(np.cos(x * f))
    golden = np.concatenate(blocks, axis=-1)
    np.testing.assert_allclose(out, golden, atol=1e-6)


def test_mlp_shapes_and_param_count():
    key = jax.random.PRNGKey(0)
    ins_num = 7
    params = init_dm_nerf(key, ins_num=ins_num)
    pts = jnp.ones((4, 6, 63))
    dirs = jnp.ones((4, 6, 27))
    raw = dm_nerf_apply(params, pts, dirs)
    assert raw.shape == (4, 6, 4 + ins_num + 1)
    # 8 trunk layers + heads, matches the reference module structure
    # (dm_nerf.py:64-78): count both w and b per linear.
    n_linear = 8 + 7
    assert len(params) == 2 * n_linear


def test_ins_head_gradient_does_not_reach_trunk():
    """The trunk detach (dm_nerf.py:95): d(ins)/d(trunk weights) must be zero."""
    key = jax.random.PRNGKey(1)
    params = init_dm_nerf(key, ins_num=3)
    pts = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 63))
    dirs = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 27))

    def ins_sum(p):
        raw = dm_nerf_apply(p, pts, dirs)
        return jnp.sum(raw[..., 4:])

    g = jax.grad(ins_sum)(params)
    assert float(jnp.abs(g["trunk_0_w"]).max()) == 0.0
    assert float(jnp.abs(g["density_w"]).max()) == 0.0
    assert float(jnp.abs(g["rgb_out_w"]).max()) == 0.0
    assert float(jnp.abs(g["ins_out_w"]).max()) > 0.0


def test_z_val_sample():
    z = np.asarray(z_val_sample(3, 2.0, 6.0, 5))
    np.testing.assert_allclose(z[0], [2.0, 3.0, 4.0, 5.0, 6.0], atol=1e-6)
    assert z.shape == (3, 5)


def _sample_pdf_numpy(bins, weights, n_samples):
    """Independent NumPy inverse-CDF (deterministic mode), per helpers.py:123-155."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    u = np.broadcast_to(np.linspace(0, 1, n_samples), cdf.shape[:-1] + (n_samples,))
    out = np.empty_like(u)
    for r in range(cdf.shape[0]):
        inds = np.searchsorted(cdf[r], u[r], side="right")
        below = np.maximum(inds - 1, 0)
        above = np.minimum(inds, cdf.shape[-1] - 1)
        cg0, cg1 = cdf[r][below], cdf[r][above]
        bg0, bg1 = bins[r][below], bins[r][above]
        denom = np.where(cg1 - cg0 < 1e-5, 1.0, cg1 - cg0)
        t = (u[r] - cg0) / denom
        out[r] = bg0 + t * (bg1 - bg0)
    return out


def test_sample_pdf_deterministic_matches_numpy():
    rng = np.random.RandomState(0)
    bins = np.sort(rng.rand(4, 9).astype(np.float32) * 10, axis=-1)
    weights = rng.rand(4, 8).astype(np.float32)
    got = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 16))
    golden = _sample_pdf_numpy(bins, weights, 16)
    np.testing.assert_allclose(got, golden, atol=1e-5)


def _composite_numpy(raw, z_vals, rays_d):
    """Independent NumPy compositor per render.py:6-28."""
    dists = np.diff(z_vals, axis=-1)
    dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rgb = 1 / (1 + np.exp(-raw[..., :3]))
    sigma = np.maximum(raw[..., 3], 0)
    alpha = 1 - np.exp(-sigma * dists)
    om = 1 - alpha + 1e-10
    t = np.cumprod(np.concatenate([np.ones_like(om[..., :1]), om], -1), -1)[..., :-1]
    w = alpha * t
    rgb_map = (w[..., None] * rgb).sum(-2)
    depth = (w * z_vals).sum(-1)
    ins = (w[..., None] * raw[..., 4:]).sum(-2)
    ins = 1 / (1 + np.exp(-ins))
    return rgb_map, w, depth, ins[..., :-1]


def test_compositor_matches_numpy():
    rng = np.random.RandomState(1)
    N, S, C = 6, 10, 5
    raw = rng.randn(N, S, 4 + C + 1).astype(np.float32)
    z = np.sort(rng.rand(N, S).astype(np.float32) * 5 + 1, axis=-1)
    rays_d = rng.randn(N, 3).astype(np.float32)
    out = composite(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rays_d))
    g_rgb, g_w, g_depth, g_ins = _composite_numpy(raw, z, rays_d)
    # log-scan cumprod differs from literal cumprod by float round-off only
    np.testing.assert_allclose(np.asarray(out.rgb), g_rgb, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.weights), g_w, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.depth), g_depth, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.ins), g_ins, atol=1e-4)


def test_composite_log_scan_equals_cumprod():
    rng = np.random.RandomState(2)
    raw = jnp.asarray(rng.randn(4, 8, 9).astype(np.float32))
    z = jnp.asarray(np.sort(rng.rand(4, 8).astype(np.float32) * 5, axis=-1))
    d = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    a = composite(raw, z, d, use_log_scan=True)
    b = composite(raw, z, d, use_log_scan=False)
    np.testing.assert_allclose(np.asarray(a.weights), np.asarray(b.weights), atol=1e-5)


def test_rays_from_K_and_pixel_subset_agree():
    H, W = 8, 12
    K = jnp.asarray(np.array([[10.0, 0, 5.5], [0, -10.0, 3.5], [0, 0, -1.0]], np.float32))
    c2w = jnp.asarray(np.eye(4, dtype=np.float32)[:3])
    ro, rd = rays_from_K(H, W, K, c2w)
    ys = jnp.asarray([0, 3, 7])
    xs = jnp.asarray([0, 5, 11])
    so, sd = rays_for_pixels(ys, xs, K, c2w)
    np.testing.assert_allclose(np.asarray(so), np.asarray(ro)[np.asarray(ys), np.asarray(xs)], atol=1e-6)
    np.testing.assert_allclose(np.asarray(sd), np.asarray(rd)[np.asarray(ys), np.asarray(xs)], atol=1e-6)


def test_render_rays_end_to_end_shapes():
    key = jax.random.PRNGKey(0)
    ins_num = 5
    pc = init_dm_nerf(jax.random.PRNGKey(1), ins_num=ins_num)
    pf = init_dm_nerf(jax.random.PRNGKey(2), ins_num=ins_num)
    N, S, NI = 4, 8, 16
    rays_o = jnp.zeros((N, 3))
    rays_d = jnp.asarray(np.random.RandomState(0).randn(N, 3).astype(np.float32))
    z = z_val_sample(N, 2.0, 6.0, S)
    q = make_xla_query_fn()
    info = render_rays(pc, pf, rays_o, rays_d, z, q, N_importance=NI, perturb=True, key=key)
    assert info["rgb_fine"].shape == (N, 3)
    assert info["ins_fine"].shape == (N, ins_num)
    assert info["z_vals_fine"].shape == (N, S + NI)
    assert info["raw_coarse"].shape == (N, S, 4 + ins_num + 1)
    assert info["depth_fine"].shape == (N,)
    # fine z is sorted
    zf = np.asarray(info["z_vals_fine"])
    assert (np.diff(zf, axis=-1) >= 0).all()


def test_render_rays_fine_z_gradient_blocked():
    """The fine-z detach (render.py:68): rgb_fine grads must not flow through
    the importance sampling into the coarse params via z_samples."""
    ins_num = 3
    pc = init_dm_nerf(jax.random.PRNGKey(1), ins_num=ins_num)
    pf = init_dm_nerf(jax.random.PRNGKey(2), ins_num=ins_num)
    rays_o = jnp.zeros((2, 3))
    rays_d = jnp.asarray(np.random.RandomState(0).randn(2, 3).astype(np.float32))
    z = z_val_sample(2, 2.0, 6.0, 6)
    q = make_xla_query_fn()

    def loss_fine_only(pc_):
        info = render_rays(pc_, pf, rays_o, rays_d, z, q, N_importance=4, perturb=False)
        return jnp.sum(info["rgb_fine"])

    g = jax.grad(loss_fine_only)(pc)
    total = sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(g))
    assert total == 0.0


def test_composite_maps_matches_composite():
    """composite_maps (the single-reduction fast path shared by the image
    renderer and the manipulator's final composite) must reproduce composite()'s
    rgb/depth/ins channel-for-channel, for both air modes."""
    from dmnerf_tpu.core.compositor import composite, composite_maps

    rng = np.random.RandomState(0)
    N, S, C = 17, 11, 6
    raw = jnp.asarray(rng.randn(N, S, 4 + C).astype(np.float32))
    z = jnp.sort(jnp.asarray(rng.rand(N, S).astype(np.float32) * 5 + 1), axis=-1)
    d = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    for keep_air in (False, True):
        ref = composite(raw, z, d, keep_air=keep_air, detach_ins_weights=False)
        rgb, ins, depth = composite_maps(raw, z, d, keep_air=keep_air)
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(ref.rgb),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(depth), np.asarray(ref.depth),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ins), np.asarray(ref.ins),
                                   rtol=1e-6, atol=1e-6)
