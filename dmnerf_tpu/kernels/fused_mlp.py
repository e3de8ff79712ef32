"""Pallas TPU kernel: fused positional-encoding + DM-NeRF MLP, forward and backward.

Why this exists (SURVEY.md §7 step 4). The pure-XLA query path is matmul-roofline
bound in the *forward* (10.6 ms for the fine pass on v5e) but the *backward* pays
~23 GB/step of HBM traffic re-reading saved activations for the dW products
(measured: grad of the full loss = 67 ms vs 12 ms forward). This kernel removes
that wall: the forward computes the sin/cos frequency embedding in-register and
never materializes it in HBM; the backward re-computes all activations per tile in
VMEM and accumulates every dW/db on-chip across the sequential TPU grid, so the
only HBM traffic is pts [P,3], dirs [P,3], the output/cotangent [P,4+C], and the
parameter pytree itself.

Architecture parity is with dmnerf_tpu.core.mlp.dm_nerf_apply (itself cited to the
reference /root/reference/networks/dm_nerf.py:58-106), including:
  * skip-concat of the embedded position after the ReLU of layer i in `skips`
    (reference dm_nerf.py:89-91) — expressed as split matmuls, never as a concat;
  * the instance head's gradient wall (reference dm_nerf.py:95) — the backward
    kernel simply never propagates the ins-head cotangent into the trunk, which IS
    stop_gradient by construction;
  * rgb/ins "feature" linears with no activation, hidden linears with ReLU.

Kernel-native embedding layout. The reference interleaves [sin_f(xyz), cos_f(xyz)]
per frequency (dm_nerf.py:24-43, core/embedding.py); in-kernel we compute
xf = x @ F (one tiny matmul, F[c, f*3+c] = 2^f) and keep sin(xf) / cos(xf) as two
frequency-major blocks. The affected weight rows (first trunk layer, the post-skip
layer's emb part, the rgb hidden layer's view-dir part) are re-gathered once,
outside the kernel, to match — outputs are numerically identical to the reference
ordering.

Gradients to pts/viewdirs are structurally zero in every consumer (rays and z-vals
are data or stop_gradient'ed: reference render.py:66-68), so the custom_vjp returns
zeros for them; parameter cotangents are exact.

The kernels run in interpret mode on CPU for tests (interpret=True).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, jnp.ndarray]

_HEAD_KEYS = [
    "density_w", "density_b", "rgb_feat_w", "rgb_feat_b",
    # rgb_hid_w is shipped split: feat rows, dir-identity rows, dir-sin, dir-cos
    "rgb_hid_w:f", "rgb_hid_w:x", "rgb_hid_w:s", "rgb_hid_w:c", "rgb_hid_b",
    "rgb_out_w", "rgb_out_b", "ins_feat_w", "ins_feat_b",
    "ins_hid_w", "ins_hid_b", "ins_out_w", "ins_out_b",
]


def _freq_matrix(multires: int, d: int = 3) -> np.ndarray:
    """F [d, d*multires] with F[c, f*d + c] = 2**f:  (x @ F)[:, f*d+c] = x_c * 2^f."""
    F = np.zeros((d, d * multires), np.float32)
    for f in range(multires):
        for c in range(d):
            F[c, f * d + c] = 2.0 ** f
    return F


def _sin_rows(multires: int, d: int = 3) -> np.ndarray:
    """Reference-embedding channel of kernel sin lane (f*d + c); reference order is
    [x(d), sin_f0(d), cos_f0(d), sin_f1(d), ...] (core/embedding.py)."""
    return np.asarray([d + f * 2 * d + c for f in range(multires) for c in range(d)], np.int32)


def _cos_rows(multires: int, d: int = 3) -> np.ndarray:
    return np.asarray([d + f * 2 * d + d + c for f in range(multires) for c in range(d)], np.int32)


def _layer_kinds(D: int, skips: Tuple[int, ...]) -> List[str]:
    """'plain' or 'split' per trunk layer; layer i is split when the reference
    concatenated the embedding after layer i-1 (dm_nerf.py:89-91).

    Skip indices >= D never trigger in the reference's range(D) loop and are inert
    (e.g. the default skips=(4,) with netdepth=4); a skip at exactly D-1 would feed
    the heads a W+emb-wide feature and crashes the reference too — reject it."""
    if (D - 1) in skips:
        raise ValueError(f"skip at the last trunk layer (D-1={D-1}) breaks the heads")
    return ["split" if (i - 1) in skips else "plain" for i in range(D)]


# ---------------------------------------------------------------------------
# Packing: params dict -> flat operand list (and its inverse for cotangents)
# ---------------------------------------------------------------------------

def _emb_dim(multires: int, d: int = 3) -> int:
    return d * (1 + 2 * multires)


def _pack(params: Params, multires: int, multires_views: int, D: int,
          skips: Tuple[int, ...]) -> List[jnp.ndarray]:
    """Row-gather the pytree into kernel operands (pure jnp, fused under jit).

    Per trunk layer: plain -> [W, b]; split -> [Wh, Wx, Ws, Wc, b] where the emb
    part of the concat input [h, emb] is re-gathered into kernel layout.
    Then the heads in _HEAD_KEYS order. Biases are [1, n] (TPU wants >=2D).
    """
    sr, cr = _sin_rows(multires), _cos_rows(multires)
    srd, crd = _sin_rows(multires_views), _cos_rows(multires_views)
    emb = _emb_dim(multires)
    out: List[jnp.ndarray] = []
    for i, kind in enumerate(_layer_kinds(D, skips)):
        w, b = params[f"trunk_{i}_w"], params[f"trunk_{i}_b"][None, :]
        if kind == "split":
            hs = w.shape[0] - emb
            out += [w[:hs], w[hs: hs + 3], w[hs + sr], w[hs + cr], b]
        else:
            out += [w, b]
    for key in _HEAD_KEYS:
        if key.startswith("rgb_hid_w"):
            wrh = params["rgb_hid_w"]
            hs = wrh.shape[0] - _emb_dim(multires_views)
            part = key.split(":")[1]
            out.append({"f": wrh[:hs], "x": wrh[hs: hs + 3],
                        "s": wrh[hs + srd], "c": wrh[hs + crd]}[part])
        elif key.endswith("_b"):
            out.append(params[key][None, :])
        else:
            out.append(params[key])
    return out


def _unpack_grads(dws: Sequence[jnp.ndarray], params: Params, multires: int,
                  multires_views: int, D: int, skips: Tuple[int, ...]) -> Params:
    """Inverse of _pack for cotangents: scatter split-row grads back into the
    reference-ordered weight matrices."""
    sr, cr = _sin_rows(multires), _cos_rows(multires)
    srd, crd = _sin_rows(multires_views), _cos_rows(multires_views)
    emb = _emb_dim(multires)
    it = iter(dws)
    grads: Params = {}
    for i, kind in enumerate(_layer_kinds(D, skips)):
        w = params[f"trunk_{i}_w"]
        if kind == "split":
            hs = w.shape[0] - emb
            dwh, dwx, dws_, dwc, db = (next(it) for _ in range(5))
            dw = jnp.zeros_like(w)
            dw = dw.at[:hs].set(dwh)
            dw = dw.at[hs: hs + 3].set(dwx)
            dw = dw.at[hs + sr].set(dws_)
            dw = dw.at[hs + cr].set(dwc)
        else:
            dw, db = next(it), next(it)
        grads[f"trunk_{i}_w"], grads[f"trunk_{i}_b"] = dw, db[0]
    rgb_hid_parts = {}
    for key in _HEAD_KEYS:
        g = next(it)
        if key.startswith("rgb_hid_w"):
            rgb_hid_parts[key.split(":")[1]] = g
        elif key.endswith("_b"):
            grads[key] = g[0]
        else:
            grads[key] = g
    wrh = params["rgb_hid_w"]
    hs = wrh.shape[0] - _emb_dim(multires_views)
    dwrh = jnp.zeros_like(wrh)
    dwrh = dwrh.at[:hs].set(rgb_hid_parts["f"])
    dwrh = dwrh.at[hs: hs + 3].set(rgb_hid_parts["x"])
    dwrh = dwrh.at[hs + srd].set(rgb_hid_parts["s"])
    dwrh = dwrh.at[hs + crd].set(rgb_hid_parts["c"])
    grads["rgb_hid_w"] = dwrh
    return grads


# ---------------------------------------------------------------------------
# Shared in-kernel forward core
# ---------------------------------------------------------------------------

def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_exact(a, b):
    """Full-precision matmul for the PE frequency products x @ F.

    The MXU rounds inputs to bf16 at default precision; for coordinates |x|~3
    that is an absolute error up to ~8e-3, which the 2^(multires-1) frequency
    scaling turns into a MULTI-RADIAN phase error inside sin/cos (observed: 2e-2
    output error vs the XLA path, compiled-mode only). F's entries are exact
    powers of two, so HIGHEST precision on this tiny [T,3]x[3,F] product makes
    the phase exact at negligible cost; trunk matmuls stay at default precision
    (identical treatment to the XLA path)."""
    return jax.lax.dot_general(a, b, (((a.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _dot_tt(a, b):
    """a^T @ b contracting the leading (point) axis: [T,m]x[T,n] -> [m,n]."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_nt(a, b):
    """a @ b^T contracting the trailing axes: [T,n]x[m,n] -> [T,m]."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _forward_core_fixed(x, d, Fp, Fd, wv, kinds):
    """Like _forward_core but with the layer-0 embedding input handled properly.

    Layer 0's weight is packed split-style ([Wx, Ws, Wc, b], no h-part) regardless
    of `kinds`; see _pack0."""
    it = iter(wv)
    xf, df = _dot_exact(x, Fp), _dot_exact(d, Fd)
    sx, cx = jnp.sin(xf), jnp.cos(xf)
    sd, cd = jnp.sin(df), jnp.cos(df)

    w0x, w0s, w0c, b0 = (next(it) for _ in range(4))
    h = jnp.maximum(_dot(x, w0x) + _dot(sx, w0s) + _dot(cx, w0c) + b0, 0.0)
    hs = [h]
    layer_ops = [("emb0", (w0x, w0s, w0c))]
    for kind in kinds[1:]:
        if kind == "split":
            wh, wx, ws, wc, b = (next(it) for _ in range(5))
            pre = _dot(h, wh) + _dot(x, wx) + _dot(sx, ws) + _dot(cx, wc) + b
            layer_ops.append((kind, (wh, wx, ws, wc)))
        else:
            w, b = next(it), next(it)
            pre = _dot(h, w) + b
            layer_ops.append((kind, (w,)))
        h = jnp.maximum(pre, 0.0)
        hs.append(h)

    wd, bd = next(it), next(it)
    sigma = _dot(h, wd) + bd
    wrf, brf = next(it), next(it)
    rf = _dot(h, wrf) + brf
    wrh_f, wrh_x, wrh_s, wrh_c, brh = (next(it) for _ in range(5))
    rh = jnp.maximum(_dot(rf, wrh_f) + _dot(d, wrh_x) + _dot(sd, wrh_s) + _dot(cd, wrh_c) + brh, 0.0)
    wro, bro = next(it), next(it)
    rgb = _dot(rh, wro) + bro
    wif, bif = next(it), next(it)
    fi = _dot(h, wif) + bif
    wih, bih = next(it), next(it)
    ih = jnp.maximum(_dot(fi, wih) + bih, 0.0)
    wio, bio = next(it), next(it)
    ins = _dot(ih, wio) + bio

    out = jnp.concatenate([rgb, sigma, ins], axis=-1)
    cache = dict(sx=sx, cx=cx, sd=sd, cd=cd, hs=hs, layer_ops=layer_ops,
                 rf=rf, rh=rh, fi=fi, ih=ih,
                 heads=(wd, wrf, wrh_f, wrh_x, wrh_s, wrh_c, wro, wif, wih, wio))
    return out, cache


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fwd_kernel(kinds, n_ops, *refs):
    (x_ref, d_ref, Fp_ref, Fd_ref), wrefs, (out_ref,) = refs[:4], refs[4:4 + n_ops], refs[4 + n_ops:]
    wv = [r[:] for r in wrefs]
    out, _ = _forward_core_fixed(x_ref[:], d_ref[:], Fp_ref[:], Fd_ref[:], wv, kinds)
    out_ref[:] = out


def _bwd_kernel(kinds, n_ops, *refs):
    ins_refs = refs[: 5 + n_ops]
    out_refs = refs[5 + n_ops:]
    x_ref, d_ref, g_ref, Fp_ref, Fd_ref = ins_refs[:5]
    wrefs = ins_refs[5:]
    x, d, g = x_ref[:], d_ref[:], g_ref[:]
    wv = [r[:] for r in wrefs]
    out, cache = _forward_core_fixed(x, d, Fp_ref[:], Fd_ref[:], wv, kinds)
    del out

    sx, cx, sd, cd = cache["sx"], cache["cx"], cache["sd"], cache["cd"]
    hs_list, layer_ops = cache["hs"], cache["layer_ops"]
    rf, rh, fi, ih = cache["rf"], cache["rh"], cache["fi"], cache["ih"]
    wd, wrf, wrh_f, wrh_x, wrh_s, wrh_c, wro, wif, wih, wio = cache["heads"]
    h_last = hs_list[-1]

    C = wio.shape[1]
    g_rgb, g_sigma, g_ins = g[:, :3], g[:, 3:4], g[:, 4: 4 + C]

    grads: List[jnp.ndarray] = []  # in packed order, built trunk-first then heads

    # ---- ins head (no cotangent into the trunk: the reference's detach) ----
    d_ih = _dot_nt(g_ins, wio) * (ih > 0)
    d_fi = _dot_nt(d_ih, wih)
    dwio, dbio = _dot_tt(ih, g_ins), jnp.sum(g_ins, 0, keepdims=True)
    dwih, dbih = _dot_tt(fi, d_ih), jnp.sum(d_ih, 0, keepdims=True)
    dwif, dbif = _dot_tt(h_last, d_fi), jnp.sum(d_fi, 0, keepdims=True)

    # ---- rgb head ----
    d_rh = _dot_nt(g_rgb, wro) * (rh > 0)
    d_rf = _dot_nt(d_rh, wrh_f)
    dwro, dbro = _dot_tt(rh, g_rgb), jnp.sum(g_rgb, 0, keepdims=True)
    dwrh_f = _dot_tt(rf, d_rh)
    dwrh_x = _dot_tt(d, d_rh)
    dwrh_s = _dot_tt(sd, d_rh)
    dwrh_c = _dot_tt(cd, d_rh)
    dbrh = jnp.sum(d_rh, 0, keepdims=True)
    dwrf, dbrf = _dot_tt(h_last, d_rf), jnp.sum(d_rf, 0, keepdims=True)

    # ---- density head ----
    dwd, dbd = _dot_tt(h_last, g_sigma), jnp.sum(g_sigma, 0, keepdims=True)

    # ---- trunk ----
    d_h = _dot_nt(d_rf, wrf) + _dot_nt(g_sigma, wd)
    trunk_grads: List[List[jnp.ndarray]] = []
    for i in range(len(kinds) - 1, -1, -1):
        kind, ops = layer_ops[i]
        d_pre = d_h * (hs_list[i] > 0)
        db = jnp.sum(d_pre, 0, keepdims=True)
        h_prev = hs_list[i - 1] if i > 0 else None
        if kind == "emb0":
            w0x, w0s, w0c = ops
            trunk_grads.append([_dot_tt(x, d_pre), _dot_tt(sx, d_pre), _dot_tt(cx, d_pre), db])
            d_h = None
        elif kind == "split":
            wh, wx, ws, wc = ops
            trunk_grads.append([
                _dot_tt(h_prev, d_pre), _dot_tt(x, d_pre),
                _dot_tt(sx, d_pre), _dot_tt(cx, d_pre), db,
            ])
            d_h = _dot_nt(d_pre, wh)
        else:
            (w,) = ops
            trunk_grads.append([_dot_tt(h_prev, d_pre), db])
            d_h = _dot_nt(d_pre, w)
    for lg in reversed(trunk_grads):
        grads.extend(lg)

    grads += [dwd, dbd, dwrf, dbrf, dwrh_f, dwrh_x, dwrh_s, dwrh_c, dbrh,
              dwro, dbro, dwif, dbif, dwih, dbih, dwio, dbio]

    assert len(grads) == len(out_refs), (len(grads), len(out_refs))
    is_first = pl.program_id(0) == 0
    for ref, val in zip(out_refs, grads):
        @pl.when(is_first)
        def _(ref=ref, val=val):
            ref[:] = val

        @pl.when(jnp.logical_not(is_first))
        def _(ref=ref, val=val):
            ref[:] = ref[:] + val


def _pack0(params: Params, multires: int, multires_views: int, D: int,
           skips: Tuple[int, ...]) -> List[jnp.ndarray]:
    """_pack, but layer 0 is always split into [Wx, Ws, Wc, b] (it consumes the
    embedding directly)."""
    packed = _pack(params, multires, multires_views, D, skips)
    sr, cr = _sin_rows(multires), _cos_rows(multires)
    w0, b0 = packed[0], packed[1]
    w0x, w0s, w0c = w0[:3], w0[sr], w0[cr]
    return [w0x, w0s, w0c, b0] + packed[2:]


def _unpack0_grads(dws: Sequence[jnp.ndarray], params: Params, multires: int,
                   multires_views: int, D: int, skips: Tuple[int, ...]) -> Params:
    sr, cr = _sin_rows(multires), _cos_rows(multires)
    dw0x, dw0s, dw0c, db0 = dws[0], dws[1], dws[2], dws[3]
    w0 = params["trunk_0_w"]
    dw0 = jnp.zeros_like(w0)
    dw0 = dw0.at[:3].set(dw0x)
    dw0 = dw0.at[sr].set(dw0s)
    dw0 = dw0.at[cr].set(dw0c)
    rest = _unpack_grads([dw0, db0] + list(dws[4:]), params, multires,
                         multires_views, D, skips)
    # overwrite the (zero-scattered placeholder) layer-0 grad with the real one
    rest["trunk_0_w"] = dw0
    return rest


def make_pallas_query_fn(
    multires: int = 10,
    multires_views: int = 4,
    D: int = 8,
    skips: Tuple[int, ...] = (4,),
    tile_fwd: int = 1024,
    tile_bwd: int = 512,
    interpret: bool = False,
    mesh=None,
):
    """Drop-in replacement for core.pipeline.make_xla_query_fn backed by the fused
    Pallas kernels. query(params, pts [N,S,3], viewdirs [N,3]) -> raw [N,S,4+C].

    Requires positional encoding enabled (i_embed == 0 in reference terms).

    mesh: optional jax.sharding.Mesh with a 'data' axis. GSPMD cannot auto-partition
    a pallas_call (tpu_custom_call), so under a mesh the query is shard_map'ed along
    the ray axis: each device runs the kernel on its ray shard; parameters are
    replicated (in_specs P()) and shard_map's transpose inserts the gradient psum
    over 'data' automatically. The per-ray N axis must be divisible by the axis size
    (the sharded train step already enforces this for the batch)."""
    assert multires > 0 and multires_views > 0, "pallas path needs PE enabled"
    kinds = tuple(_layer_kinds(D, tuple(skips)))
    Fp = jnp.asarray(_freq_matrix(multires))
    Fd = jnp.asarray(_freq_matrix(multires_views))
    def _const_spec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    def _tile_spec(tile, width):
        return pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM)

    @jax.custom_vjp
    def query_flat(params, pts, dirs):
        return _fwd(params, pts, dirs)

    def _fwd(params, pts, dirs):
        packed = _pack0(params, multires, multires_views, D, tuple(skips))
        P = pts.shape[0]
        C4 = params["ins_out_w"].shape[1] + 4
        Pp = _round_up(max(P, 1), tile_fwd)
        pad = Pp - P
        ptsp = jnp.pad(pts, ((0, pad), (0, 0)))
        dirsp = jnp.pad(dirs, ((0, pad), (0, 0)))
        n_ops = len(packed)
        out = pl.pallas_call(
            functools.partial(_fwd_kernel, kinds, n_ops),
            out_shape=jax.ShapeDtypeStruct((Pp, C4), jnp.float32),
            grid=(Pp // tile_fwd,),
            in_specs=[
                _tile_spec(tile_fwd, 3), _tile_spec(tile_fwd, 3),
                _const_spec(Fp.shape), _const_spec(Fd.shape),
                *[_const_spec(w.shape) for w in packed],
            ],
            out_specs=_tile_spec(tile_fwd, C4),
            interpret=interpret,
        )(ptsp, dirsp, Fp, Fd, *packed)
        return out[:P]

    def _fwd_rule(params, pts, dirs):
        return _fwd(params, pts, dirs), (params, pts, dirs)

    def _bwd_rule(res, g):
        params, pts, dirs = res
        packed = _pack0(params, multires, multires_views, D, tuple(skips))
        P = pts.shape[0]
        C4 = params["ins_out_w"].shape[1] + 4
        Pp = _round_up(max(P, 1), tile_bwd)
        pad = Pp - P
        ptsp = jnp.pad(pts, ((0, pad), (0, 0)))
        dirsp = jnp.pad(dirs, ((0, pad), (0, 0)))
        gp = jnp.pad(g, ((0, pad), (0, 0)))  # zero rows: padded points contribute 0
        n_ops = len(packed)
        dws = pl.pallas_call(
            functools.partial(_bwd_kernel, kinds, n_ops),
            out_shape=[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in packed],
            grid=(Pp // tile_bwd,),
            in_specs=[
                _tile_spec(tile_bwd, 3), _tile_spec(tile_bwd, 3), _tile_spec(tile_bwd, C4),
                _const_spec(Fp.shape), _const_spec(Fd.shape),
                *[_const_spec(w.shape) for w in packed],
            ],
            out_specs=[_const_spec(w.shape) for w in packed],
            interpret=interpret,
        )(ptsp, dirsp, gp, Fp, Fd, *packed)
        dparams = _unpack0_grads(dws, params, multires, multires_views, D, tuple(skips))
        return dparams, jnp.zeros_like(pts), jnp.zeros_like(dirs)

    query_flat.defvjp(_fwd_rule, _bwd_rule)

    def query(params, pts, viewdirs):
        N, S, _ = pts.shape
        dirs_pt = jnp.broadcast_to(viewdirs[:, None, :], (N, S, 3)).reshape(N * S, 3)
        raw = query_flat(params, pts.reshape(N * S, 3), dirs_pt)
        return raw.reshape(N, S, -1)

    if mesh is None:
        return query

    from jax.sharding import PartitionSpec as P

    return jax.shard_map(
        query, mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
