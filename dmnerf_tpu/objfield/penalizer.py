"""Emptiness penalizer: pushes free-space points toward the "air" channel.

Behavioral parity with /root/reference/networks/penalizer.py:5-62:
 * per-sample metric distances p = z * ||rays_d||; depth-centered Gaussian weight
   g = exp(-(depth_dist - p)^2 / (2 deta_w^2)) / (0.4 sqrt(2π)) + 1e-8;
 * region masks split by depth ± tolerance (in metric distance):
   before  (p < (depth - tol)·||d||): BCE pushing ALL ins_num+1 channels toward the
       air one-hot, weighted by (1 - g), normalized by channels × mask count;
   middle  (|p - depth·||d||| within tolerance band): BCE pushing the air channel to
       zero, weighted by g, normalized by mask count;
 * depth is detached (penalizer.py:59) — the penalizer shapes the instance field, not
   the geometry. Applied to both coarse and fine raw outputs by the train step
   (reference train_dmsr.py:53-60).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def emptiness_penalizer(
    raw: jnp.ndarray,      # [N, S, 4 + ins_num + 1]
    z_vals: jnp.ndarray,   # [N, S]
    depth: jnp.ndarray,    # [N] (will be detached)
    rays_d: jnp.ndarray,   # [N, 3]
    tolerance: float,
    deta_w: float,
) -> jnp.ndarray:
    depth = jax.lax.stop_gradient(depth)[..., None]            # [N, 1]
    norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)     # [N, 1]

    dists_before = (depth - tolerance) * norm
    dists_after = (depth + tolerance) * norm
    depth_dist = depth * norm
    p_dists = z_vals * norm

    delta = depth_dist - p_dists
    # delta_H = 0.4 fixed in the reference (penalizer.py:10)
    gauss = jnp.exp(-(delta ** 2) / (2.0 * deta_w ** 2)) / (0.4 * math.sqrt(2.0 * math.pi)) + 1e-8
    gauss_air = 1.0 - gauss

    mask_before = (p_dists < dists_before).astype(raw.dtype)
    mask_after = (p_dists > dists_after).astype(raw.dtype)
    mask_middle = 1.0 - (mask_after + mask_before)

    pred_ins = jax.nn.sigmoid(raw[..., 4:])                    # [N, S, C+1]
    n_ch = pred_ins.shape[-1]

    # before-region: push every channel toward the air one-hot [0,...,0,1]
    air = jnp.zeros((n_ch,), raw.dtype).at[-1].set(1.0)
    # log args clamped at 1e-8 rather than the reference's literal `x + 1e-8`: under
    # jit, XLA reassociates `1 - pred + 1e-8` to `(1 + 1e-8) - pred` == `1 - pred`
    # (1 + 1e-8 rounds to 1 in f32), which is exactly 0 at saturated sigmoid — the
    # resulting -inf turns masked-out terms into 0*inf = NaN inside the sum. max()
    # keeps the value within 1e-8 of the reference semantics and is fold-proof.
    bce_before = -air * jnp.log(jnp.maximum(pred_ins, 1e-8)) - (1.0 - air) * jnp.log(
        jnp.maximum(1.0 - pred_ins, 1e-8)
    )
    w_before = gauss_air * mask_before
    loss_before = jnp.sum(bce_before * w_before[..., None]) / (
        n_ch * jnp.maximum(jnp.sum(mask_before), 1e-8)
    )

    # middle-region: push the air channel toward zero
    air_prob = pred_ins[..., -1]
    bce_middle = -jnp.log(jnp.maximum(1.0 - air_prob, 1e-8))
    w_middle = gauss * mask_middle
    loss_middle = jnp.sum(bce_middle * w_middle) / jnp.maximum(jnp.sum(mask_middle), 1e-8)

    return loss_before + loss_middle


def ins_penalizer(raw, z_vals, depth, rays_d, tolerance: float, deta_w: float):
    """Reference ins_penalizer (penalizer.py:58-62); depth detach happens inside."""
    return emptiness_penalizer(raw, z_vals, depth, rays_d, tolerance, deta_w)
