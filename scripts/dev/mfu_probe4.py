"""MFU probe round 4: the fused-head algebra candidate.

probe3: heads run at 0.376 of peak (3.26 ms of the 5.88 ms forward). The
reference's rgb_feature / ins_feature linears have NO activation
(/root/reference/networks/dm_nerf.py:74-76), so they fold into the following
hidden layers by associativity, OUTSIDE the kernel, in f32:

   rh = relu(rf@Wrh1 + ed@Wrh2 + brh),  rf = h@Wrf + brf   (no relu!)
      = relu(h@(Wrf@Wrh1) + ed@Wrh2 + (brf@Wrh1 + brh))
   ih = relu(h@(Wif@Wih) + (bif@Wih + bih))                (same)

New head: ONE [W, 2H+1] matmul ([M1rgb | M1ins | Wd] with H=W/2; sigma column
bit-identical to the old fused head's density column), the K=27 ed
contraction, and ONE [2H, 36] block-diag output matmul [Wro ; Wio] whose
result is lane-concat with sigma. Head matmul in*out drops 204,928 ->
78,757 per point (2.6x); the [T,513] slice/cast relayouts disappear.

This probe times the candidate and checks its numerics against the current
head on real magnitudes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev/mfu_probe4.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmnerf_tpu.core.mlp import init_dm_nerf
from dmnerf_tpu.kernels import fused_mlp as FM
from scripts.dev.mfu_probe3 import (C4, INS, P_TOTAL, PEAK, TILE, W, edT, h0,
                                    report, scan_time_smallperturb, constspec,
                                    colspec, rowspec, params)

H = W // 2

# --- build the fused-head operands in f32, cast once ---
permd = FM._emb_perm(4)
wrh = params["rgb_hid_w"]
Wrh1, Wrh2 = wrh[:W], wrh[W:][permd]          # [256,128], [27,128] (perm'd)
M1 = jnp.concatenate([
    params["rgb_feat_w"] @ Wrh1,               # [256,128]
    params["ins_feat_w"] @ params["ins_hid_w"],
    params["density_w"],
], axis=1)                                     # [256, 257]
b1 = jnp.concatenate([
    params["rgb_feat_b"] @ Wrh1 + params["rgb_hid_b"],
    params["ins_feat_b"] @ params["ins_hid_w"] + params["ins_hid_b"],
    params["density_b"],
])[None, :]                                    # [1, 257]
M2 = jnp.zeros((2 * H, 36), jnp.float32)
M2 = M2.at[:H, :3].set(params["rgb_out_w"])
M2 = M2.at[H:, 3:].set(params["ins_out_w"])
b2 = jnp.concatenate([params["rgb_out_b"], params["ins_out_b"]])[None, :]

M1b, Wrh2b, M2b = (x.astype(jnp.bfloat16) for x in (M1, Wrh2, M2))
hops = [M1b, b1, Wrh2b, M2b, b2]


def k_headsnew(*refs):
    (h_ref, edT_ref), (m1_ref, b1_ref, wrh2_ref, m2_ref, b2_ref), (out_ref,) = \
        refs[:2], refs[2:7], refs[7:]
    h = h_ref[:]
    pre1 = FM._dot(h, m1_ref[:]) + b1_ref[:]
    edc = FM._dot_te(edT_ref[:], wrh2_ref[:])
    rh = jnp.maximum(pre1[:, :H] + edc, 0.0).astype(jnp.bfloat16)
    ih = jnp.maximum(pre1[:, H:2 * H], 0.0).astype(jnp.bfloat16)
    sigma = pre1[:, 2 * H:]
    u = jnp.concatenate([rh, ih], axis=-1)
    o = FM._dot(u, m2_ref[:]) + b2_ref[:]
    out = jnp.concatenate([o[:, :3], sigma, o[:, 3:]], axis=-1)
    out_ref[:] = jnp.sum(out, axis=1, keepdims=True)


def headsnew_call(edT_op, h_op):
    return pl.pallas_call(
        k_headsnew,
        out_shape=jax.ShapeDtypeStruct((P_TOTAL, 1), jnp.float32),
        grid=(P_TOTAL // TILE,),
        in_specs=[rowspec(W), colspec(edT.shape[0])] + [constspec(o.shape)
                                                        for o in hops],
        out_specs=rowspec(1),
        compiler_params=FM._COMPILER_PARAMS,
    )(h_op, edT_op, *hops)


HEAD_FLOPS = P_TOTAL * 2 * (W * (2 * W + 1) + (W + 27) * H + H * 3
                            + W * H + H * (INS + 1))  # the MODEL's head flops
print("== fused-head candidate (model-flops MFU for comparability) ==")
ms = scan_time_smallperturb(headsnew_call, (edT, h0), pidx=0)
report("headsnew", ms, HEAD_FLOPS)

# --- numeric delta vs the current head formulation (f32 reference magnitudes) ---
n = 4096
hs = np.abs(rng_h := np.random.RandomState(7).randn(n, W)).astype(np.float32) * 0.1
eds = np.random.RandomState(8).randn(edT.shape[0], n).astype(np.float32) * 0.5
hsb = jnp.asarray(hs).astype(jnp.bfloat16)
edsb = jnp.asarray(eds).astype(jnp.bfloat16)


@jax.jit
def old_head(h, edT_):
    flat = FM._pack(params, 10, 4, 8, (4,))
    wv = [w.astype(jnp.bfloat16) if i % 2 == 0 else w for i, w in enumerate(flat)]
    whead, bhead = wv[16], flat[17]
    head = FM._dot(h, whead) + bhead
    rf, fi, sigma = head[:, :W], head[:, W:2 * W], head[:, 2 * W:]
    rf, fi = rf.astype(jnp.bfloat16), fi.astype(jnp.bfloat16)
    wrh_, brh = wv[18], flat[19]
    pre_rh = FM._dot(rf, wrh_[:W]) + FM._dot_te(edT_, wrh_[W:])
    rh = jnp.maximum(pre_rh + brh, 0.0).astype(jnp.bfloat16)
    rgb = FM._dot(rh, wv[20]) + flat[21]
    ih = jnp.maximum(FM._dot(fi, wv[22]) + flat[23], 0.0).astype(jnp.bfloat16)
    ins = FM._dot(ih, wv[24]) + flat[25]
    return jnp.concatenate([rgb, sigma, ins], axis=-1)


@jax.jit
def new_head(h, edT_):
    pre1 = FM._dot(h, M1b) + b1
    edc = FM._dot_te(edT_, Wrh2b)
    rh = jnp.maximum(pre1[:, :H] + edc, 0.0).astype(jnp.bfloat16)
    ih = jnp.maximum(pre1[:, H:2 * H], 0.0).astype(jnp.bfloat16)
    sigma = pre1[:, 2 * H:]
    u = jnp.concatenate([rh, ih], axis=-1)
    o = FM._dot(u, M2b) + b2
    return jnp.concatenate([o[:, :3], sigma, o[:, 3:]], axis=-1)


a = np.asarray(old_head(hsb, edsb))
b = np.asarray(new_head(hsb, edsb))
scale = np.abs(a).max()
d = np.abs(a - b)
print(f"old-vs-new head: max|Δ| {d.max():.2e} (out scale {scale:.3f}); "
      f"sigma col max|Δ| {d[:, 3].max():.2e}")
