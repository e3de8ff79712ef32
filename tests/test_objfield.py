"""Tests for the object-field machinery: in-graph Hungarian vs SciPy, instance loss
vs an independent NumPy golden, penalizer regions, AP metrics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from dmnerf_tpu.objfield.hungarian import linear_sum_assignment_jax, masked_assignment
from dmnerf_tpu.objfield.losses import (
    compact_one_hot,
    img2mse,
    ins_criterion,
    mse2psnr,
    pairwise_costs,
)
from dmnerf_tpu.objfield.metrics import calculate_ap, compact_gt_one_hot_np, ins_eval
from dmnerf_tpu.objfield.penalizer import emptiness_penalizer


@pytest.mark.parametrize("n", [2, 5, 16, 32])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lsa_matches_scipy_cost(n, seed):
    rng = np.random.RandomState(seed)
    cost = rng.rand(n, n).astype(np.float32)
    col4row = np.asarray(linear_sum_assignment_jax(jnp.asarray(cost)))
    # valid permutation
    assert sorted(col4row.tolist()) == list(range(n))
    ours = cost[np.arange(n), col4row].sum()
    r, c = linear_sum_assignment(cost)
    theirs = cost[r, c].sum()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


@pytest.mark.parametrize("valid", [0, 1, 3, 7, 8])
def test_masked_assignment_matches_scipy_rectangular(valid):
    rng = np.random.RandomState(7)
    n = 8
    cost = rng.rand(n, n).astype(np.float32)
    col4row = np.asarray(masked_assignment(jnp.asarray(cost), jnp.asarray(valid)))
    r, c = linear_sum_assignment(cost[:valid])
    ours = cost[np.arange(valid), col4row[:valid]].sum()
    theirs = cost[r, c].sum()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)
    assert sorted(col4row.tolist()) == list(range(n))


def test_compact_one_hot():
    gt = jnp.asarray([3, 3, 0, 5])
    one_hot, valid, present = compact_one_hot(gt, 8)
    assert int(valid) == 3
    golden = np.zeros((4, 8), np.float32)
    golden[0, 1] = 1  # label 3 -> rank 1
    golden[1, 1] = 1
    golden[2, 0] = 1  # label 0 -> rank 0
    golden[3, 2] = 1  # label 5 -> rank 2
    np.testing.assert_allclose(np.asarray(one_hot), golden)


def _ins_criterion_numpy(pred, gt_labels, ins_num):
    """Independent NumPy implementation of the reference loss (evaluator.py:19-74)."""
    valid_labels = np.unique(gt_labels)
    valid = len(valid_labels)
    N = gt_labels.shape[0]
    gt_ins = np.zeros((N, ins_num), np.float32)
    for j, lab in enumerate(valid_labels):
        gt_ins[gt_labels == lab, j] = 1.0
    # pairwise costs, gt rows x pred cols
    cost_ce = np.zeros((ins_num, ins_num))
    cost_siou = np.zeros((ins_num, ins_num))
    for i in range(ins_num):
        for j in range(ins_num):
            g, p = gt_ins[:, i], pred[:, j]
            cost_ce[i, j] = np.mean(-g * np.log(p + 1e-8) - (1 - g) * np.log(1 - p + 1e-8))
            tp = np.sum(p * g)
            cost_siou[i, j] = 1 - tp / (tp + (p.sum() - tp) + (g.sum() - tp) + 1e-6)
    row, col = linear_sum_assignment((cost_ce + cost_siou)[:valid])
    valid_ce = cost_ce[row, col].mean()
    valid_siou = cost_siou[row, col].mean()
    unmatched = sorted(set(range(ins_num)) - set(col.tolist()))
    invalid_ce = pred[:, unmatched].mean() if unmatched else 0.0
    return valid_ce + invalid_ce + valid_siou, valid_ce, invalid_ce, valid_siou


@pytest.mark.parametrize("seed", [0, 3])
def test_ins_criterion_matches_numpy_golden(seed):
    rng = np.random.RandomState(seed)
    N, C = 64, 8
    pred = rng.rand(N, C).astype(np.float32) * 0.98 + 0.01
    gt = rng.randint(0, 5, size=N)
    total, vce, ice, vsiou = ins_criterion(jnp.asarray(pred), jnp.asarray(gt), C)
    g_total, g_vce, g_ice, g_vsiou = _ins_criterion_numpy(pred, gt, C)
    np.testing.assert_allclose(float(vce), g_vce, rtol=1e-4)
    np.testing.assert_allclose(float(vsiou), g_vsiou, rtol=1e-4)
    np.testing.assert_allclose(float(ice), g_ice, rtol=1e-4)
    np.testing.assert_allclose(float(total), g_total, rtol=1e-4)


def test_ins_criterion_all_columns_matched_gives_zero_invalid():
    rng = np.random.RandomState(0)
    N, C = 32, 4
    pred = rng.rand(N, C).astype(np.float32) * 0.9 + 0.05
    gt = np.arange(N) % C  # all labels present -> valid == ins_num
    _, _, ice, _ = ins_criterion(jnp.asarray(pred), jnp.asarray(gt), C)
    assert float(ice) == 0.0


def test_ins_criterion_grad_flows_to_pred():
    rng = np.random.RandomState(0)
    N, C = 32, 6
    pred = jnp.asarray(rng.rand(N, C).astype(np.float32) * 0.9 + 0.05)
    gt = jnp.asarray(rng.randint(0, 4, size=N))
    g = jax.grad(lambda p: ins_criterion(p, gt, C)[0])(pred)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_penalizer_regions_and_finiteness():
    rng = np.random.RandomState(0)
    N, S, C = 8, 16, 5
    raw = jnp.asarray(rng.randn(N, S, 4 + C + 1).astype(np.float32))
    z = jnp.asarray(np.tile(np.linspace(2, 6, S, dtype=np.float32), (N, 1)))
    depth = jnp.asarray(np.full(N, 4.0, np.float32))
    rays_d = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    loss = emptiness_penalizer(raw, z, depth, rays_d, tolerance=0.05, deta_w=0.05)
    assert np.isfinite(float(loss))
    assert float(loss) > 0

    # penalizer must not push gradients into density/rgb channels
    def f(r):
        return emptiness_penalizer(r, z, depth, rays_d, 0.05, 0.05)

    g = np.asarray(jax.grad(f)(raw))
    assert np.abs(g[..., :4]).max() == 0.0
    assert np.abs(g[..., 4:]).max() > 0.0


def test_penalizer_jit_saturated_logits_no_nan():
    """Regression: with saturated ins logits (sigmoid == 1.0 exactly in f32), XLA used
    to reassociate `1 - pred + 1e-8` to `1 - pred`, giving log(0) = -inf and
    0-weight * inf = NaN in the masked sum — ONLY under jit (eager kept the literal
    order). Value and grad must stay finite and match eager."""
    rng = np.random.RandomState(3)
    N, S, C = 16, 16, 6
    raw = rng.randn(N, S, 4 + C + 1).astype(np.float32)
    raw[..., 4:] = rng.choice([-40.0, 20.0, 0.3], size=(N, S, C + 1))  # saturate sigmoid
    raw = jnp.asarray(raw)
    z = jnp.asarray(np.tile(np.linspace(1, 8, S, dtype=np.float32), (N, 1)))
    depth = jnp.asarray(rng.uniform(2.5, 6.0, N).astype(np.float32))
    rays_d = jnp.asarray(rng.randn(N, 3).astype(np.float32))

    def f(r):
        return emptiness_penalizer(r, z, depth, rays_d, tolerance=0.05, deta_w=0.05)

    eager_val = float(f(raw))
    jit_val, jit_grad = jax.jit(jax.value_and_grad(f))(raw)
    assert np.isfinite(eager_val)
    np.testing.assert_allclose(float(jit_val), eager_val, rtol=1e-5)
    assert np.all(np.isfinite(np.asarray(jit_grad)))


def test_ins_criterion_jit_saturated_probs_no_nan():
    """Same reassociation hazard in the pairwise BCE cost matrix (losses.py)."""
    from dmnerf_tpu.objfield.losses import ins_criterion

    rng = np.random.RandomState(0)
    N, C = 64, 6
    pred = jnp.asarray(rng.choice([0.0, 1.0, 0.4], size=(N, C)).astype(np.float32))
    gt = jnp.asarray(rng.randint(0, C, N))

    def f(p):
        return ins_criterion(p, gt, C)[0]

    eager_val = float(f(pred))
    jit_val, jit_grad = jax.jit(jax.value_and_grad(f))(pred)
    assert np.isfinite(eager_val)
    np.testing.assert_allclose(float(jit_val), eager_val, rtol=1e-5)
    assert np.all(np.isfinite(np.asarray(jit_grad)))


def test_mse_psnr():
    x = jnp.asarray([[0.5, 0.5]])
    y = jnp.asarray([[0.0, 0.0]])
    mse = img2mse(x, y)
    np.testing.assert_allclose(float(mse), 0.25)
    np.testing.assert_allclose(float(mse2psnr(mse)), -10 * np.log10(0.25), rtol=1e-5)


def test_calculate_ap_perfect_and_worst():
    ious = np.array([0.9, 0.85, 0.95])
    conf = np.array([0.9, 0.8, 0.7])
    ap = calculate_ap(ious, 3, confidence=conf)
    assert ap[0] == 1.0            # all > 0.5
    assert ap[-1] == 0.0           # strict >: 0.95 > 0.95 is a miss
    # thre=0.9: only the conf-last 0.95 hits -> prec 1/3 at rec 1/3 -> COCO AP 1/9
    assert ap[4] == pytest.approx(1.0 / 9.0, rel=1e-6)
    ap_zero = calculate_ap(np.array([0.1, 0.2]), 2, confidence=np.array([1.0, 0.5]))
    assert ap_zero[0] == 0.0


def test_ins_eval_identity_prediction():
    H, W, C = 16, 16, 6
    rng = np.random.RandomState(0)
    gt_label = rng.randint(0, 4, size=(H, W))
    gt_ins, valid_num, valid_labels = compact_gt_one_hot_np(gt_label, C)
    # a perfect prediction: probability ~1 on the GT label channel
    pred = np.full((H, W, C), 0.01, np.float32)
    for lab in np.unique(gt_label):
        pred[gt_label == lab, lab] = 0.99
    pred_label, ap, matched = ins_eval(pred, gt_ins, valid_num, C)
    assert all(a == 1.0 for a in ap)
    np.testing.assert_array_equal(matched, valid_labels)
    np.testing.assert_array_equal(pred_label, gt_label)
