"""Pallas fused PE+MLP kernel vs the pure-XLA query path (interpret mode on CPU):
forward parity, parameter-gradient parity (incl. the ins-head gradient wall), and
drop-in use inside the full render pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmnerf_tpu.core.mlp import init_dm_nerf
from dmnerf_tpu.core.pipeline import make_xla_query_fn, render_rays
from dmnerf_tpu.core.sampling import z_val_sample
from dmnerf_tpu.kernels.fused_mlp import make_pallas_query_fn

CASES = [
    # (multires, multires_views, D, W, skips, ins_num)
    (4, 2, 2, 32, (0,), 4),     # the tiny test net
    (10, 4, 8, 64, (4,), 8),    # flagship topology, narrow for CPU speed
    (6, 3, 5, 32, (1, 3), 4),   # multiple skips
]


def _setup(multires, multires_views, D, W, skips, ins_num, N=6, S=8, seed=0,
           pe_mode="kernel"):
    params = init_dm_nerf(
        jax.random.PRNGKey(seed), ins_num=ins_num, D=D, W=W,
        input_ch_pts=3 * (1 + 2 * multires), input_ch_views=3 * (1 + 2 * multires_views),
        skips=skips,
    )
    rng = np.random.RandomState(seed)
    pts = jnp.asarray(rng.randn(N, S, 3).astype(np.float32))
    dirs = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    q_xla = make_xla_query_fn(multires, multires_views, D, skips)
    q_pal = make_pallas_query_fn(multires, multires_views, D, skips,
                                 tile_fwd=16, tile_bwd=16, interpret=True,
                                 pe_mode=pe_mode)
    return params, pts, dirs, q_xla, q_pal


@pytest.mark.parametrize("pe_mode", ["kernel", "outside", "kernel_t"])
@pytest.mark.parametrize("case", CASES)
def test_pallas_forward_matches_xla(case, pe_mode):
    params, pts, dirs, q_xla, q_pal = _setup(*case, pe_mode=pe_mode)
    want = np.asarray(q_xla(params, pts, dirs))
    got = np.asarray(q_pal(params, pts, dirs))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("pe_mode", ["kernel", "outside", "kernel_t"])
@pytest.mark.parametrize("case", CASES)
def test_pallas_param_grads_match_xla(case, pe_mode):
    params, pts, dirs, q_xla, q_pal = _setup(*case, pe_mode=pe_mode)

    def loss(q):
        def f(p):
            raw = q(p, pts, dirs)
            # cotangent mixing rgb, sigma and ins channels so every head contributes
            w = jnp.asarray(np.linspace(0.5, 1.5, raw.shape[-1]), raw.dtype)
            return jnp.sum(jnp.tanh(raw) * w)
        return f

    g_xla = jax.grad(loss(q_xla))(params)
    g_pal = jax.grad(loss(q_pal))(params)
    assert set(g_xla) == set(g_pal)
    for k in sorted(g_xla):
        np.testing.assert_allclose(
            np.asarray(g_pal[k]), np.asarray(g_xla[k]), atol=3e-5, rtol=3e-4,
            err_msg=f"grad mismatch for {k}",
        )


def test_pallas_ins_gradient_wall():
    """Instance-head-only loss must produce ZERO trunk gradients (the reference's
    h.detach() at dm_nerf.py:95) — in both paths."""
    params, pts, dirs, q_xla, q_pal = _setup(*CASES[0])
    for q in (q_xla, q_pal):
        g = jax.grad(lambda p: jnp.sum(q(p, pts, dirs)[..., 4:]))(params)
        for k, v in g.items():
            if k.startswith("trunk_") or k.startswith("rgb_") or k.startswith("density"):
                np.testing.assert_allclose(np.asarray(v), 0.0, atol=0.0,
                                           err_msg=f"{k} leaked ins grads")
        assert float(jnp.sum(jnp.abs(g["ins_out_w"]))) > 0.0


def test_pallas_inside_render_pipeline():
    """Padding path: ray count not a multiple of the tile; full coarse+fine render."""
    multires, multires_views, D, W, skips, ins_num = CASES[0]
    params, pts, dirs, q_xla, q_pal = _setup(*CASES[0], N=5, S=7)
    z = z_val_sample(5, 2.0, 6.0, 7)
    rays_o = jnp.zeros((5, 3))
    out_x = render_rays(params, params, rays_o, dirs, z, q_xla, N_importance=6, perturb=False)
    out_p = render_rays(params, params, rays_o, dirs, z, q_pal, N_importance=6, perturb=False)
    for k in ("rgb_fine", "ins_fine", "depth_fine", "rgb_coarse"):
        np.testing.assert_allclose(np.asarray(out_p[k]), np.asarray(out_x[k]),
                                   atol=3e-5, rtol=3e-5, err_msg=k)


@pytest.mark.parametrize("pe_mode", ["kernel", "outside", "kernel_t"])
def test_pallas_shard_map_matches_single_device(pe_mode):
    """The mesh path: GSPMD can't partition a pallas_call, so the kernel is
    shard_map'ed over the ray axis (kernels.fused_mlp mesh=...). One sharded train
    step on the 8-virtual-device CPU mesh must match the single-device XLA step.
    Parametrized over pe_mode so BOTH kernel variants stay covered under shard_map
    (ADVICE r2 item 3)."""
    from dmnerf_tpu.configs import Config
    from dmnerf_tpu.parallel.mesh import make_mesh, make_sharded_train_step, shard_batch
    from dmnerf_tpu.render.trainstep import Batch, create_train_state, make_train_step

    if len(jax.devices("cpu")) < 8:
        pytest.skip("needs 8 virtual CPU devices (conftest sets XLA_FLAGS)")

    multires, multires_views, D, W, skips, ins_num = CASES[0]
    cfg = Config(netdepth=D, netwidth=W, multires=multires, multires_views=multires_views,
                 skips=skips, N_samples=8, N_importance=8, N_train=32,
                 near=2.0, far=7.0, ins_num=ins_num, perturb=1.0,
                 penalize=True, tolerance=0.05, deta_w=0.05)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    rays_d = rng.randn(32, 3).astype(np.float32)
    rays_d[:, 2] = np.abs(rays_d[:, 2]) + 1.0
    batch = Batch(jnp.zeros((32, 3)), jnp.asarray(rays_d),
                  jnp.asarray(rng.rand(32, 3).astype(np.float32)),
                  jnp.asarray(rng.randint(0, ins_num, size=32)))
    key = jax.random.PRNGKey(1)

    ref_step = jax.jit(make_train_step(cfg, jit=False))  # XLA path, single device
    s_ref, aux_ref = ref_step(jax.tree_util.tree_map(lambda x: x.copy(), state), batch, key)

    mesh = make_mesh(n_devices=8, devices=jax.devices("cpu"))
    q_pal = make_pallas_query_fn(multires, multires_views, D, skips,
                                 tile_fwd=16, tile_bwd=16, interpret=True, mesh=mesh,
                                 pe_mode=pe_mode)
    sh_step = make_sharded_train_step(cfg, mesh, query_fn=q_pal)
    s_sh, aux_sh = sh_step(jax.tree_util.tree_map(lambda x: x.copy(), state),
                           shard_batch(mesh, batch), key)

    np.testing.assert_allclose(float(aux_sh["total_loss"]), float(aux_ref["total_loss"]),
                               rtol=1e-4)
    for k in s_ref.params_fine:
        np.testing.assert_allclose(np.asarray(s_sh.params_fine[k]),
                                   np.asarray(s_ref.params_fine[k]),
                                   atol=1e-5, rtol=1e-3, err_msg=k)


def test_kernel_t_double_angle_path_matches_xla_loosely():
    """The production TPU numeric path — double-angle PE under a bf16 activation
    cache — run in interpret mode (cache_dtype=bfloat16 forces pe_exact=False,
    exercising the recursion branch of _pe_transposed that compiled runs use).
    Tolerances are bf16-quantization-loose; an ordering/indexing bug in the
    recursion (e.g. swapped sin/cos blocks, octave-major vs channel-major) moves
    outputs by O(1) and fails this regardless."""
    multires, multires_views, D, W, skips, ins_num = CASES[1]
    params, pts, dirs, q_xla, _ = _setup(*CASES[1], N=8, S=16)
    q_bf16 = make_pallas_query_fn(multires, multires_views, D, skips,
                                  tile_fwd=16, tile_bwd=16, interpret=True,
                                  pe_mode="kernel_t", cache_dtype=jnp.bfloat16)
    want = np.asarray(q_xla(params, pts, dirs))
    got = np.asarray(q_bf16(params, pts, dirs))
    assert got.shape == want.shape
    scale = np.max(np.abs(want))
    np.testing.assert_allclose(got, want, atol=0.03 * scale, rtol=0.05)


@pytest.mark.parametrize("pe_mode", ["kernel", "outside", "kernel_t"])
def test_sigma_stub_params_sigma_exact(pe_mode):
    """sigma_stub_params (the test renderer's sigma-only coarse query): the sigma
    channel must be bit-exact vs the full pytree on BOTH query paths — each
    output column of a matmul is an independent dot product, so stubbing the
    rgb/ins head branches cannot perturb the density column."""
    from dmnerf_tpu.core.mlp import sigma_stub_params

    params, pts, dirs, q_xla, q_pal = _setup(*CASES[1], pe_mode=pe_mode)
    stub = sigma_stub_params(params)
    for q in (q_xla, q_pal):
        full_sigma = np.asarray(q(params, pts, dirs)[..., 3])
        stub_raw = np.asarray(q(stub, pts, dirs))
        assert stub_raw.shape[-1] == 5  # rgb(3) + sigma + 1 stub ins channel
        np.testing.assert_array_equal(stub_raw[..., 3], full_sigma)


@pytest.mark.parametrize("pe_mode", ["kernel", "outside", "kernel_t"])
def test_rgb_stub_params_sigma_and_ins_exact(pe_mode):
    """rgb_stub_params (the manipulator's pass-1 label queries): sigma AND every
    instance-logit channel must be bit-exact vs the full pytree on BOTH query
    paths — the ins branch is untouched and sigma is an independent matmul
    column; only the (unconsumed) rgb channels may differ. This is the first
    ASYMMETRIC head-width pytree the fused kernel executes (rgb 8-wide,
    ins 256-wide), so it exercises fused-operand grouping the symmetric
    sigma_stub cannot."""
    from dmnerf_tpu.core.mlp import rgb_stub_params

    params, pts, dirs, q_xla, q_pal = _setup(*CASES[1], pe_mode=pe_mode)
    stub = rgb_stub_params(params)
    for q in (q_xla, q_pal):
        full = np.asarray(q(params, pts, dirs))
        stub_raw = np.asarray(q(stub, pts, dirs))
        assert stub_raw.shape == full.shape  # ins head intact -> same channels
        np.testing.assert_array_equal(stub_raw[..., 3:], full[..., 3:])
