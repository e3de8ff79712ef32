"""Instance (object-field) losses: Hungarian-matched CE + soft-IoU, and RGB metrics.

Behavioral parity with /root/reference/networks/evaluator.py:
 * img2mse / mse2psnr  (evaluator.py:11,15)
 * ins_criterion       (evaluator.py:19-37): GT labels -> compacted one-hot over the
   image's valid instances; pairwise cost = pixel-mean BCE + (1 - soft IoU); optimal
   row->column matching; loss = mean matched CE + mean of unmatched-column predictions
   + mean matched soft-IoU. The matching itself carries no gradient (the reference
   solves it under no_grad on the CPU); gradients flow through the matched cost
   entries only.

TPU-first design:
 * the reference's dynamic ``torch.unique`` + fancy-indexed one-hot (evaluator.py:21-25)
   becomes a static-shape rank-compaction: presence scatter -> cumsum ranks -> one_hot.
 * both cost matrices are computed as two [C, N] x [N, C] matmuls (BCE) plus one for TP
   (soft-IoU) — MXU work instead of the reference's [C, C, N] broadcast materialization.
 * assignment runs in-graph (see dmnerf_tpu.objfield.hungarian) — no host sync.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from dmnerf_tpu.objfield.hungarian import masked_assignment


def img2mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def compact_one_hot(gt_labels: jnp.ndarray, ins_num: int, ray_mask=None) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Static-shape equivalent of the reference's unique+one_hot compaction
    (evaluator.py:21-25).

    Returns (gt_ins [N, ins_num], valid_ins_num scalar, present [ins_num] bool).
    Column j of gt_ins is the mask of the j-th smallest label present in gt_labels;
    columns >= valid_ins_num are zero. ray_mask [N] bool excludes padded rays (the
    crop sampler's under-labeled slots) from presence counting and from gt_ins rows.
    """
    gt_labels = gt_labels.astype(jnp.int32)
    if ray_mask is None:
        present = jnp.zeros((ins_num,), bool).at[gt_labels].set(True)
    else:
        present = jnp.zeros((ins_num,), bool).at[gt_labels].max(ray_mask.astype(bool))
    valid_ins_num = jnp.sum(present).astype(jnp.int32)
    rank = jnp.cumsum(present.astype(jnp.int32)) - 1          # rank of each present label
    gt_compact = rank[gt_labels]                               # [N], in [0, valid)
    gt_ins = jax.nn.one_hot(gt_compact, ins_num, dtype=jnp.float32)
    if ray_mask is not None:
        gt_ins = gt_ins * ray_mask.astype(gt_ins.dtype)[:, None]
    return gt_ins, valid_ins_num, present


def pairwise_costs(pred_ins: jnp.ndarray, gt_ins: jnp.ndarray, ray_mask=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cost_ce[i, j] = mean_n BCE(pred[:, j]; gt[:, i]);
    cost_siou[i, j] = 1 - TP/(TP+FP+FN+1e-6).  (evaluator.py:54-68)
    ray_mask [N] excludes padded rays from all sums and from the BCE mean."""
    if ray_mask is None:
        w = None
        n = jnp.asarray(pred_ins.shape[0], jnp.float32)
    else:
        w = ray_mask.astype(jnp.float32)
        n = jnp.maximum(jnp.sum(w), 1.0)
    # clamped (not `x + 1e-8`): XLA reassociates `1 - p + 1e-8` to `1 - p` in f32,
    # so a saturated sigmoid gives log(0) = -inf and 0·inf = NaN under jit — see the
    # identical pattern and full explanation in objfield/penalizer.py.
    log_p = jnp.log(jnp.maximum(pred_ins, 1e-8))
    log_1p = jnp.log(jnp.maximum(1.0 - pred_ins, 1e-8))
    gt_t = gt_ins.T  # [C, N]  (rows of masked rays are already zero)
    not_gt_t = (1.0 - gt_t) if w is None else (1.0 - gt_t) * w[None, :]
    cost_ce = -(
        jnp.dot(gt_t, log_p, preferred_element_type=jnp.float32)
        + jnp.dot(not_gt_t, log_1p, preferred_element_type=jnp.float32)
    ) / n
    pred_w = pred_ins if w is None else pred_ins * w[:, None]
    tp = jnp.dot(gt_t, pred_w, preferred_element_type=jnp.float32)   # [C, C]
    pred_sum = jnp.sum(pred_w, axis=0)[None, :]
    gt_sum = jnp.sum(gt_ins, axis=0)[:, None]
    siou = tp / (tp + (pred_sum - tp) + (gt_sum - tp) + 1e-6)
    return cost_ce, 1.0 - siou


def ins_criterion(pred_ins: jnp.ndarray, gt_labels: jnp.ndarray, ins_num: int,
                  ray_mask=None):
    """pred_ins: [N, ins_num] sigmoid-composited instance probabilities (air dropped);
    gt_labels: [N] int labels in [0, ins_num).

    Returns (total, valid_ce, invalid_ce, valid_siou) exactly as the reference
    (evaluator.py:27-37). ray_mask [N] bool marks rays that actually carry
    supervision; padded rays (crop sampler with fewer labeled pixels than N_ins)
    are excluded from every mean — equivalent to the reference's dynamic
    N_ins = min(int(N_train*0.3), len(ins_index)) clamp (helpers.py:64-67).
    """
    C = ins_num
    gt_ins, valid, _ = compact_one_hot(gt_labels, C, ray_mask)
    cost_ce, cost_siou = pairwise_costs(pred_ins, gt_ins, ray_mask)
    col4row = masked_assignment(jax.lax.stop_gradient(cost_ce + cost_siou), valid)

    rows = jnp.arange(C)
    valid_mask = (rows < valid).astype(pred_ins.dtype)
    matched_ce = cost_ce[rows, col4row]
    matched_siou = cost_siou[rows, col4row]
    denom = jnp.maximum(valid, 1).astype(pred_ins.dtype)
    valid_ce = jnp.sum(matched_ce * valid_mask) / denom
    valid_siou = jnp.sum(matched_siou * valid_mask) / denom

    # columns matched to a VALID row; the rest are the reference's order_col[valid:]
    matched_col = jnp.zeros((C,), pred_ins.dtype).at[col4row].max(valid_mask)
    invalid_col = 1.0 - matched_col
    n_invalid = jnp.sum(invalid_col)
    if ray_mask is None:
        col_mean_pred = jnp.mean(pred_ins, axis=0)
    else:
        w = ray_mask.astype(pred_ins.dtype)
        col_mean_pred = jnp.sum(pred_ins * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    invalid_ce = jnp.sum(col_mean_pred * invalid_col) / jnp.maximum(n_invalid, 1.0)

    total = valid_ce + invalid_ce + valid_siou
    return total, valid_ce, invalid_ce, valid_siou
