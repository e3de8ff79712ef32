"""Numerical parity vs the actual PyTorch reference (BASELINE.md north star).

The reference implementation at /root/reference is imported IN PLACE (never copied)
and driven on CPU torch with identical inputs and identical parameters: the model
forward, the full coarse->fine deterministic pipeline, the Hungarian instance loss,
the emptiness penalizer, and full-loss parameter gradients must all agree with the
JAX framework to float32 tolerances.

Skipped automatically when the reference checkout or torch is unavailable.
"""

import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference"
torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REF, "networks")):
    pytest.skip("reference checkout not available", allow_module_level=True)
if REF not in sys.path:
    sys.path.insert(0, REF)

from networks.dm_nerf import DM_NeRF, get_embedder          # noqa: E402  (reference)
from networks.render import dm_nerf as ref_dm_nerf          # noqa: E402
from networks.evaluator import ins_criterion as ref_ins_criterion  # noqa: E402
from networks.penalizer import ins_penalizer as ref_ins_penalizer  # noqa: E402

from dmnerf_tpu.core.mlp import init_dm_nerf                # noqa: E402
from dmnerf_tpu.core.pipeline import make_xla_query_fn, render_rays  # noqa: E402
from dmnerf_tpu.core.sampling import z_val_sample           # noqa: E402
from dmnerf_tpu.objfield.losses import img2mse, ins_criterion  # noqa: E402
from dmnerf_tpu.objfield.penalizer import ins_penalizer     # noqa: E402

D, W, MULTIRES, MULTIRES_VIEWS, SKIPS, INS = 4, 64, 6, 3, (2,), 6
CH_PTS, CH_VIEWS = 3 * (1 + 2 * MULTIRES), 3 * (1 + 2 * MULTIRES_VIEWS)


def _to_torch_model(params) -> DM_NeRF:
    """Copy our pytree into the reference module (torch Linear stores [out, in])."""
    m = DM_NeRF(D=D, W=W, input_ch_pts=CH_PTS, input_ch_views=CH_VIEWS,
                skips=list(SKIPS), ins_num=INS)
    t = lambda a: torch.from_numpy(np.asarray(a).T.copy())
    v = lambda a: torch.from_numpy(np.asarray(a).copy())
    with torch.no_grad():
        for i in range(D):
            m.mlps[i].weight.copy_(t(params[f"trunk_{i}_w"]))
            m.mlps[i].bias.copy_(v(params[f"trunk_{i}_b"]))
        m.rgb_feature_linear.weight.copy_(t(params["rgb_feat_w"]))
        m.rgb_feature_linear.bias.copy_(v(params["rgb_feat_b"]))
        m.rgb_feature_linears[0].weight.copy_(t(params["rgb_hid_w"]))
        m.rgb_feature_linears[0].bias.copy_(v(params["rgb_hid_b"]))
        m.rgb_linear.weight.copy_(t(params["rgb_out_w"]))
        m.rgb_linear.bias.copy_(v(params["rgb_out_b"]))
        m.ins_feature_linear.weight.copy_(t(params["ins_feat_w"]))
        m.ins_feature_linear.bias.copy_(v(params["ins_feat_b"]))
        m.ins_feature_linears[0].weight.copy_(t(params["ins_hid_w"]))
        m.ins_feature_linears[0].bias.copy_(v(params["ins_hid_b"]))
        m.ins_linear.weight.copy_(t(params["ins_out_w"]))
        m.ins_linear.bias.copy_(v(params["ins_out_b"]))
        m.density_linear.weight.copy_(t(params["density_w"]))
        m.density_linear.bias.copy_(v(params["density_b"]))
    return m


@pytest.fixture(scope="module")
def setup():
    params = init_dm_nerf(jax.random.PRNGKey(7), ins_num=INS, D=D, W=W,
                          input_ch_pts=CH_PTS, input_ch_views=CH_VIEWS, skips=SKIPS)
    rng = np.random.RandomState(3)
    n, s = 24, 9
    rays_o = rng.randn(n, 3).astype(np.float32) * 0.1
    rays_d = rng.randn(n, 3).astype(np.float32)
    rays_d[:, 2] = np.abs(rays_d[:, 2]) + 0.5
    return params, _to_torch_model(params), rays_o, rays_d, n, s


def _args_ns(**kw):
    import types
    ns = types.SimpleNamespace(perturb=0.0, N_importance=8, is_train=False, N_ins=None,
                               tolerance=0.05, deta_w=0.05)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def _run_reference(model, rays_o, rays_d, n, s, n_importance=8):
    pe, _ = get_embedder(MULTIRES)
    ve, _ = get_embedder(MULTIRES_VIEWS)
    # bit-identical z for both frameworks: torch.linspace and jnp.linspace disagree
    # in the last ulp, which the 2^5-scaled frequency encoding amplifies to ~1e-4
    z = torch.from_numpy(np.asarray(z_val_sample(n, 2.0, 6.0, s)).copy())
    rays = (torch.from_numpy(rays_o), torch.from_numpy(rays_d))
    return ref_dm_nerf(rays, pe, ve, model, model, z, _args_ns(N_importance=n_importance))


def _run_ours(params, rays_o, rays_d, n, s, n_importance=8):
    q = make_xla_query_fn(MULTIRES, MULTIRES_VIEWS, D, SKIPS)
    z = z_val_sample(n, 2.0, 6.0, s)
    return render_rays(params, params, jnp.asarray(rays_o), jnp.asarray(rays_d), z, q,
                       N_importance=n_importance, perturb=False, key=None)


def test_full_pipeline_matches_reference(setup):
    """Deterministic coarse->fine render: rgb/ins/depth and the fine z-set must
    match the reference's all_info (render.py:31-96)."""
    params, model, rays_o, rays_d, n, s = setup
    with torch.no_grad():
        ref = _run_reference(model, rays_o, rays_d, n, s)
    ours = _run_ours(params, rays_o, rays_d, n, s)
    # coarse bundle: tight f32 tolerance. fine bundle: torch.cumsum and XLA cumsum
    # round the inverse-CDF differently in the last ulp, which can shift an importance
    # sample by ~1e-6; the 2^(multires-1)-scaled frequency encoding amplifies that to
    # ~1e-3 in raw space on a handful of elements — inherent cross-framework noise,
    # not a semantic difference (coarse path and all pure-function goldens are tight).
    for k, atol in (("rgb_coarse", 2e-5), ("ins_coarse", 2e-5), ("depth_coarse", 2e-5)):
        np.testing.assert_allclose(
            np.asarray(ours[k]), ref[k].detach().numpy(), atol=atol, rtol=1e-4,
            err_msg=f"all_info[{k}] diverges from the reference")
    # Fine bundle: tie-aware comparison. The inverse-CDF rank is a discontinuous
    # function of the f32 cumsum; torch and XLA can round the CDF differently in
    # the last ulp, which at an exact tie (deterministic linspace u hitting a CDF
    # value) shifts that importance sample by exactly one bin (observed: 1/408
    # z samples, |dz| ~ 1.1e-3). Everything computed from the fine z-set (depth,
    # rgb, raw) inherits a bounded glitch on the affected rays. So: require tight
    # agreement on the vast majority of elements, and bound the outliers by the
    # one-bin-shift envelope instead of failing on isolated tie flips.
    zc = ref["z_vals_coarse"].detach().numpy()
    bin_w = float(np.max(np.diff(zc, axis=-1)))  # coarse bin width bounds one-bin z shifts
    for k, atol, bound, min_tight in (
        ("z_vals_fine", 2e-5, bin_w + 1e-5, 0.97),
        ("rgb_fine", 2e-3, 2e-2, 0.97),
        ("ins_fine", 2e-3, 2e-2, 0.97),
        ("depth_fine", 2e-3, bin_w + 1e-3, 0.90),   # 24 rays; one tie flip = 4%
        ("raw_fine", 2e-2, 2e-1, 0.97),
    ):
        a = np.asarray(ours[k])
        b = ref[k].detach().numpy()
        err = np.abs(a - b)
        assert np.max(err) <= bound, (
            f"all_info[{k}]: max err {np.max(err):.3e} exceeds the one-bin-shift "
            f"envelope {bound:.3e} — this is a real divergence, not a tie flip")
        frac_tight = float(np.mean(err <= atol))
        assert frac_tight >= min_tight, (
            f"all_info[{k}]: only {frac_tight:.1%} of elements within {atol} of the "
            "reference (bin-edge ties should affect isolated elements only)")


def test_ins_criterion_matches_reference(setup):
    rng = np.random.RandomState(11)
    pred = 1.0 / (1.0 + np.exp(-rng.randn(50, INS).astype(np.float32)))
    for labels in (rng.randint(0, INS, size=50), np.full(50, 2),
                   rng.randint(0, 3, size=50)):
        ref = ref_ins_criterion(torch.from_numpy(pred), torch.from_numpy(labels).float(), INS)
        ours = ins_criterion(jnp.asarray(pred), jnp.asarray(labels), INS)
        for name, a, b in zip(("total", "valid_ce", "invalid_ce", "valid_siou"), ours, ref):
            np.testing.assert_allclose(float(a), float(b), atol=1e-5, rtol=1e-4,
                                       err_msg=f"{name} (labels={labels[:4]}...)")


def test_penalizer_matches_reference(setup):
    params, model, rays_o, rays_d, n, s = setup
    ours_info = _run_ours(params, rays_o, rays_d, n, s)
    raw = np.asarray(ours_info["raw_fine"])
    z = np.asarray(ours_info["z_vals_fine"])
    depth = np.asarray(ours_info["depth_fine"])
    ref = ref_ins_penalizer(torch.from_numpy(raw), torch.from_numpy(z),
                            torch.from_numpy(depth), torch.from_numpy(rays_d),
                            _args_ns())
    ours = ins_penalizer(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(depth),
                         jnp.asarray(rays_d), 0.05, 0.05)
    np.testing.assert_allclose(float(ours), float(ref), atol=1e-5, rtol=1e-4)


def test_full_loss_param_grads_match_reference(setup):
    """End-to-end gradient parity: rgb MSE + Hungarian instance loss + emptiness
    penalizer on both bundles, gradients w.r.t. the (shared) model parameters."""
    params, model, rays_o, rays_d, n, s = setup
    rng = np.random.RandomState(5)
    target_c = rng.rand(n, 3).astype(np.float32)
    target_i = rng.randint(0, INS, size=n)

    # ---- reference loss & grads
    model.zero_grad()
    info = _run_reference(model, rays_o, rays_d, n, s)
    tc = torch.from_numpy(target_c)
    ti = torch.from_numpy(target_i).float()
    loss_ref = (torch.mean((info["rgb_coarse"] - tc) ** 2)
                + torch.mean((info["rgb_fine"] - tc) ** 2)
                + ref_ins_criterion(info["ins_coarse"], ti, INS)[0]
                + ref_ins_criterion(info["ins_fine"], ti, INS)[0]
                + ref_ins_penalizer(info["raw_coarse"], info["z_vals_coarse"],
                                    info["depth_coarse"], torch.from_numpy(rays_d), _args_ns())
                + ref_ins_penalizer(info["raw_fine"], info["z_vals_fine"],
                                    info["depth_fine"], torch.from_numpy(rays_d), _args_ns()))
    loss_ref.backward()

    # ---- ours (model shared coarse==fine exactly like the reference call above)
    def loss_fn(p):
        o = _run_ours(p, rays_o, rays_d, n, s)
        return (img2mse(o["rgb_coarse"], jnp.asarray(target_c))
                + img2mse(o["rgb_fine"], jnp.asarray(target_c))
                + ins_criterion(o["ins_coarse"], jnp.asarray(target_i), INS)[0]
                + ins_criterion(o["ins_fine"], jnp.asarray(target_i), INS)[0]
                + ins_penalizer(o["raw_coarse"], o["z_vals_coarse"], o["depth_coarse"],
                                jnp.asarray(rays_d), 0.05, 0.05)
                + ins_penalizer(o["raw_fine"], o["z_vals_fine"], o["depth_fine"],
                                jnp.asarray(rays_d), 0.05, 0.05))

    loss_ours, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_ours), float(loss_ref), atol=1e-5, rtol=1e-4)

    ref_grads = {
        "trunk_0_w": model.mlps[0].weight.grad.numpy().T,
        f"trunk_{D-1}_w": model.mlps[D - 1].weight.grad.numpy().T,
        "density_w": model.density_linear.weight.grad.numpy().T,
        "rgb_out_w": model.rgb_linear.weight.grad.numpy().T,
        "rgb_hid_w": model.rgb_feature_linears[0].weight.grad.numpy().T,
        "ins_out_w": model.ins_linear.weight.grad.numpy().T,
        "ins_feat_w": model.ins_feature_linear.weight.grad.numpy().T,
        "ins_hid_b": model.ins_feature_linears[0].bias.grad.numpy(),
    }
    # the model is used as BOTH coarse and fine in the reference call; our grads
    # arrive on one shared pytree as well since params are passed for both slots —
    # jax sums the two contributions automatically, exactly like torch autograd.
    # Tie-aware: the one-bin inverse-CDF tie flip (see the pipeline test) moves a
    # single fine sample, perturbing fine-bundle gradients slightly; allow isolated
    # normalized-grad outliers up to 5e-3 while requiring 99% within 5e-4.
    for k, rg in ref_grads.items():
        og = np.asarray(grads[k])
        scale = np.abs(rg).max() + 1e-12
        err = np.abs(og - rg) / scale
        assert np.max(err) <= 5e-3, (
            f"grad {k}: max normalized err {np.max(err):.2e} > 5e-3 — real divergence")
        frac_tight = float(np.mean(err <= 5e-4))
        assert frac_tight >= 0.99, (
            f"grad {k}: only {frac_tight:.1%} of elements within 5e-4 of the reference")
