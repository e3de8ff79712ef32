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
    (reference dm_nerf.py:89-91);
  * the instance head's gradient wall (reference dm_nerf.py:95) — the backward
    kernel simply never propagates the ins-head cotangent into the trunk, which IS
    stop_gradient by construction;
  * rgb/ins "feature" linears with no activation, hidden linears with ReLU.

Kernel-native operand layout (v2 — one matmul per logical layer). The reference
interleaves [sin_f(xyz), cos_f(xyz)] per frequency (dm_nerf.py:24-43,
core/embedding.py); in-kernel we compute xf = x @ F (one tiny full-precision
matmul, F[c, f*3+c] = 2^f) and build the embedding e = [x | sin(xf) | cos(xf)] as
ONE lane-concat. Weight matrices are row-permuted once, OUTSIDE the kernel, into
the same order, so every trunk layer is a single MXU contraction:

  * layer 0:        e @ W0k                (W0k = W0[perm])
  * skip layer i:   [h | e] @ Wik          (Wik = [W_h ; W_emb[perm]])

This matters on the MXU: a matmul with K=3 or K=30 costs a full 128-wide K block,
so the previous split-operand layout (x/sin/cos as 3 matmuls) paid 3 MXU passes
where one suffices — ~17% of all forward passes at the flagship topology.

Head algebra fusion (r5). The reference's rgb_feature / ins_feature linears have
NO activation (dm_nerf.py:74-76: ``feature = self.feature_linear(h)`` straight
into the hidden linears), so they fold into the following layers by
associativity, OUTSIDE the kernel, in f32:

    rh = relu(rf@Wrh1 + ed@Wrh2 + brh),  rf = h@Wrf + brf
       = relu(h@(Wrf@Wrh1) + ed@Wrh2 + (brf@Wrh1 + brh))
    ih = relu(h@(Wif@Wih) + (bif@Wih + bih))                 (same shape of move)

The packed head is therefore ONE [W, Hr+Hi+1] matmul
M1 = [Wrf·Wrh1 | Wif·Wih | Wd] (the trailing density column is bit-identical to
the old fused head's — per-column matmul independence), the K=27 viewdir
contraction, and the two small output matmuls. Measured on v5e
(scripts/dev/mfu_probe3/4.py): the old head region ran at 0.38 of peak —
dominated by the [T,513] head matmul plus its slice/cast relayouts — and the
fusion removes 2.6x of its model FLOPs and the relayouts (3.25 -> 2.60 ms on
the fine pass; max|Δ| 3.8e-4 at out scale 0.22, σ column exact). The backward
maps the fused cotangents (dM1, db1, ...) back to the reference parameters by
the product rule in f32 outside the kernel — exact chain rule, and the ins
branch still sends NO cotangent into the trunk (the dm_nerf.py:95 wall).

Activation cache dtype. On TPU, f32 matmuls at default precision round their
inputs to bf16 inside the MXU, so storing the *cached* activations (backward
rematerialization) in bf16 is numerically identical for every consumer that is a
matmul input or a ReLU mask — and halves backward VMEM, unlocking 2x larger
tiles.  Cotangents and accumulators stay f32.  `cache_dtype=None` resolves to
bf16 compiled / f32 interpreted (CPU tests compare against the exact-f32 XLA
path).  The PE frequency products x @ F keep HIGHEST precision regardless: the
2^(multires-1) frequency scale amplifies bf16 input rounding into multi-radian
sin/cos phase errors (observed 2e-2 output error, compiled mode only).

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

# packed-operand order after the trunk layers (head algebra fusion, see module
# docstring): M1 = [Wrf·Wrh1 | Wif·Wih | Wd] with its fused bias, the viewdir
# contraction Wrh2 (bias slot structurally zero), and the two output linears.
_HEAD_KEYS = [
    "m1_w", "m1_b",
    "rgb_ed_w", "rgb_ed_zero_b",
    "rgb_out_w", "rgb_out_b",
    "ins_out_w", "ins_out_b",
]


def _freq_matrix(multires: int, d: int = 3) -> np.ndarray:
    """F [d, d*multires] with F[c, f*d + c] = 2**f:  (x @ F)[:, f*d+c] = x_c * 2^f."""
    F = np.zeros((d, d * multires), np.float32)
    for f in range(multires):
        for c in range(d):
            F[c, f * d + c] = 2.0 ** f
    return F


def _emb_perm(multires: int, d: int = 3) -> np.ndarray:
    """Permutation from reference embedding channel order
    [x(d), sin_f0(d), cos_f0(d), sin_f1(d), ...] (core/embedding.py) to the kernel
    order [x(d), sin lanes (freq-major), cos lanes (freq-major)]."""
    sin_rows = [d + f * 2 * d + c for f in range(multires) for c in range(d)]
    cos_rows = [d + f * 2 * d + d + c for f in range(multires) for c in range(d)]
    return np.asarray(list(range(d)) + sin_rows + cos_rows, np.int32)


def _inv_perm(p: np.ndarray) -> np.ndarray:
    inv = np.empty_like(p)
    inv[p] = np.arange(len(p), dtype=p.dtype)
    return inv


def _layer_kinds(D: int, skips: Tuple[int, ...]) -> List[str]:
    """'emb0' / 'plain' / 'split' per trunk layer; layer i is split when the
    reference concatenated the embedding after layer i-1 (dm_nerf.py:89-91).

    Skip indices >= D never trigger in the reference's range(D) loop and are inert
    (e.g. the default skips=(4,) with netdepth=4); a skip at exactly D-1 would feed
    the heads a W+emb-wide feature and crashes the reference too — reject it."""
    if (D - 1) in skips:
        raise ValueError(f"skip at the last trunk layer (D-1={D-1}) breaks the heads")
    return ["emb0"] + ["split" if (i - 1) in skips else "plain" for i in range(1, D)]


def _emb_dim(multires: int, d: int = 3) -> int:
    return d * (1 + 2 * multires)


# ---------------------------------------------------------------------------
# Packing: params dict -> flat operand list (and its inverse for cotangents)
# ---------------------------------------------------------------------------

def _pack(params: Params, multires: int, multires_views: int, D: int,
          skips: Tuple[int, ...]) -> List[jnp.ndarray]:
    """Row-permute / concat the pytree into kernel operands (pure jnp, fused under
    jit). Per trunk layer exactly [W, b]; then _HEAD_KEYS. Biases are [1, n]
    (TPU wants >=2D)."""
    permp = _emb_perm(multires)
    permd = _emb_perm(multires_views)
    emb = _emb_dim(multires)
    out: List[jnp.ndarray] = []
    for i, kind in enumerate(_layer_kinds(D, skips)):
        w, b = params[f"trunk_{i}_w"], params[f"trunk_{i}_b"][None, :]
        if kind == "emb0":
            out += [w[permp], b]
        elif kind == "split":
            hs = w.shape[0] - emb
            out += [jnp.concatenate([w[:hs], w[hs:][permp]], axis=0), b]
        else:
            out += [w, b]
    # head algebra fusion (module docstring): fold the activation-free
    # rgb_feature / ins_feature linears into the hidden layers, in f32
    wrh = params["rgb_hid_w"]
    hsd = wrh.shape[0] - _emb_dim(multires_views)
    wrh1, wrh2 = wrh[:hsd], wrh[hsd:][permd]
    wih = params["ins_hid_w"]
    Hr = wrh1.shape[1]
    m1 = jnp.concatenate([
        params["rgb_feat_w"] @ wrh1,
        params["ins_feat_w"] @ wih,
        params["density_w"],
    ], axis=1)
    b1 = jnp.concatenate([
        params["rgb_feat_b"] @ wrh1 + params["rgb_hid_b"],
        params["ins_feat_b"] @ wih + params["ins_hid_b"],
        params["density_b"],
    ])[None, :]
    out += [m1, b1, wrh2, jnp.zeros((1, Hr), m1.dtype)]
    for key in ("rgb_out", "ins_out"):
        out += [params[f"{key}_w"], params[f"{key}_b"][None, :]]
    return out


def _unpack_grads(dws: Sequence[jnp.ndarray], params: Params, multires: int,
                  multires_views: int, D: int, skips: Tuple[int, ...]) -> Params:
    """Inverse of _pack for cotangents: un-permute rows / split fused columns back
    into the reference-ordered weight matrices."""
    permp = _emb_perm(multires)
    permd = _emb_perm(multires_views)
    emb = _emb_dim(multires)
    it = iter(dws)
    grads: Params = {}
    for i, kind in enumerate(_layer_kinds(D, skips)):
        dwk, db = next(it), next(it)
        if kind == "emb0":
            dw = jnp.take(dwk, _inv_perm(permp), axis=0)
        elif kind == "split":
            hs = params[f"trunk_{i}_w"].shape[0] - emb
            dw = jnp.concatenate(
                [dwk[:hs], jnp.take(dwk[hs:], _inv_perm(permp), axis=0)], axis=0)
        else:
            dw = dwk
        grads[f"trunk_{i}_w"], grads[f"trunk_{i}_b"] = dw, db[0]

    # head algebra fusion: map (dM1, db1, dWrh2, ...) back to the reference
    # parameters by the product rule, in f32 — exact chain rule through the
    # f32 premultiplications _pack performs
    dm1, db1 = next(it), next(it)
    wrh = params["rgb_hid_w"]
    hsd = wrh.shape[0] - _emb_dim(multires_views)
    wrh1 = wrh[:hsd]
    wih = params["ins_hid_w"]
    Hr, Hi = wrh1.shape[1], wih.shape[1]
    dm1r, dm1i = dm1[:, :Hr], dm1[:, Hr:Hr + Hi]
    db1r, db1i = db1[0, :Hr], db1[0, Hr:Hr + Hi]
    grads["density_w"], grads["density_b"] = dm1[:, Hr + Hi:], db1[0, Hr + Hi:]
    grads["rgb_feat_w"] = dm1r @ wrh1.T
    grads["rgb_feat_b"] = db1r @ wrh1.T
    grads["ins_feat_w"] = dm1i @ wih.T
    grads["ins_feat_b"] = db1i @ wih.T
    dwrh1 = (params["rgb_feat_w"].T @ dm1r
             + params["rgb_feat_b"][:, None] * db1r[None, :])
    grads["ins_hid_w"] = (params["ins_feat_w"].T @ dm1i
                          + params["ins_feat_b"][:, None] * db1i[None, :])
    grads["ins_hid_b"] = db1i

    dwrh2, _dzb = next(it), next(it)
    grads["rgb_hid_w"] = jnp.concatenate(
        [dwrh1, jnp.take(dwrh2, _inv_perm(permd), axis=0)], axis=0)
    grads["rgb_hid_b"] = db1r
    for key in ("rgb_out", "ins_out"):
        grads[f"{key}_w"], grads[f"{key}_b"] = next(it), next(it)[0]
    return grads


# ---------------------------------------------------------------------------
# Operand fusion: group the (w, b) pairs by column width into a handful of
# fused buffers (PERF.md lever #1).
#
# Why: every pallas_call operand costs per-grid-step scheduling (~0.25 µs /
# operand / grid step measured via the single-matmul probe, scripts/dev) and the
# flat _pack layout ships 26 weight/bias operands in and — for the backward —
# 26 accumulator refs out. Fusing by column width (trunk layers share W columns,
# the two head hiddens share W//2, ...) cuts that to ~5 weight + 5 bias buffers
# each way. Slicing them back apart in-kernel is exact (no numeric change);
# segments are row-padded to _FUSE_PAD so every slice starts on a native
# sublane-tile boundary (8 f32 / 16 bf16) and costs no relayout.
# Biases stay in their own f32 buffers (f32 adds into the MXU accumulator —
# see _prep); weight buffers carry the compute dtype.
# ---------------------------------------------------------------------------

_FUSE_PAD = 16  # row padding per segment: lcm of f32 (8) and bf16 (16) sublane tiles


def _fuse_layout(wshapes: Sequence[Tuple[int, int]]):
    """Group pair indices by weight column width.

    Returns a tuple of (cols, entries, total_rows) with entries a tuple of
    (pair_k, rows, row_off); the bias row index inside the group's bias buffer
    is the entry's position. Pure shape metadata — static at trace time."""
    bycol: Dict[int, list] = {}
    order: List[int] = []
    for k, (r, c) in enumerate(wshapes):
        if c not in bycol:
            bycol[c] = [[], 0]
            order.append(c)
        entries, rows = bycol[c]
        entries.append((k, r, rows))
        bycol[c][1] = rows + _round_up(r, _FUSE_PAD)
    return tuple((c, tuple(bycol[c][0]), bycol[c][1]) for c in order)


def _pad_rows(w, rows: int):
    pad = _round_up(rows, _FUSE_PAD) - rows
    if not pad:
        return w
    return jnp.concatenate([w, jnp.zeros((pad, w.shape[1]), w.dtype)], axis=0)


def _fuse_ops(flat: Sequence[jnp.ndarray], layout) -> List[jnp.ndarray]:
    """[w0,b0,w1,b1,...] -> [Wg0, Bg0, Wg1, Bg1, ...] (weights / biases of equal
    column width stacked along rows, segments padded to _FUSE_PAD)."""
    out: List[jnp.ndarray] = []
    for _, entries, _ in layout:
        out.append(jnp.concatenate(
            [_pad_rows(flat[2 * k], r) for k, r, _ in entries], axis=0))
        out.append(jnp.concatenate([flat[2 * k + 1] for k, _, _ in entries], axis=0))
    return out


def _unfuse_ops(bufs: Sequence[jnp.ndarray], layout, n_pairs: int) -> List[jnp.ndarray]:
    """Inverse of _fuse_ops over loaded values (in-kernel or outside): static
    row slices back into the flat [w0,b0,...] order _forward_core consumes."""
    flat: List[jnp.ndarray] = [None] * (2 * n_pairs)  # type: ignore[list-item]
    for gi, (_, entries, _) in enumerate(layout):
        W, B = bufs[2 * gi], bufs[2 * gi + 1]
        for bi, (k, r, off) in enumerate(entries):
            flat[2 * k] = W[off:off + r]
            flat[2 * k + 1] = B[bi:bi + 1]
    return flat


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


def _mask(a):
    """ReLU mask; compare in f32 — Mosaic on v5e rejects bf16 comparisons."""
    return a.astype(jnp.float32) > 0.0


def _dot_nt(a, b):
    """a @ b^T contracting the trailing axes: [T,n]x[m,n] -> [T,m]."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _cast_fn(cache_dtype):
    return (lambda a: a.astype(cache_dtype)) if cache_dtype is not None else (lambda a: a)


def _dot_te(eT, b):
    """Embedding-transposed contraction: eT [E,T] x b [E,n] -> [T,n] (= e @ b).
    The MXU contracts either operand orientation natively; feeding the embedding
    column-major avoids ever materializing the row-major [T,E] layout."""
    return jax.lax.dot_general(eT, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _embed_pair(x, d, Fp, Fd, cast):
    """In-kernel PE: exact-precision frequency products + sin/cos lane-concat."""
    xf, df = _dot_exact(x, Fp), _dot_exact(d, Fd)
    e = cast(jnp.concatenate([x, jnp.sin(xf), jnp.cos(xf)], axis=-1))
    ed = cast(jnp.concatenate([d, jnp.sin(df), jnp.cos(df)], axis=-1))
    return e, ed


def _pe_transposed(xT, FpT, multires, exact):
    """In-kernel PE over the TRANSPOSED layout xT [3, T] -> eT [Ep, T], f32.

    Lane economics: sin/cos on the VPU are the dominant PE cost, and a [T, 3]
    layout uses 3 of 128 lanes. Transposed, the point axis fills the lanes.
    The frequencies are exact octaves 2^f (reference dm_nerf.py:24), so the
    non-exact path evaluates sin/cos ONLY at the base octave and derives the
    rest by the double-angle recursion (sin2θ = 2sc, cos2θ = 1-2s²) — 10x fewer
    transcendentals. Octave f then carries ~2^f·ε_f32 ≈ 1e-4 absolute at f=9,
    invisible under the bf16 activation cache (quantization step ~2e-3) that
    compiled kernels store. exact=True (f32 cache / interpret-mode CPU parity
    tests) computes every octave directly at HIGHEST precision instead."""
    if exact:
        xf = _dot_exact(FpT, xT)  # [3*multires, T], row f*3+c = x_c * 2^f
        return jnp.concatenate([xT, jnp.sin(xf), jnp.cos(xf)], axis=0)
    s, c = jnp.sin(xT), jnp.cos(xT)
    sins, coss = [s], [c]
    for _ in range(multires - 1):
        s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
        sins.append(s)
        coss.append(c)
    return jnp.concatenate([xT] + sins + coss, axis=0)


def _forward_core(e, ed, wv, kinds, Wf, Wi, cache_dtype, want_cache,
                  transposed=False):
    """One matmul per layer over the permuted/concat operand layout (see module
    docstring), starting from the already-built embeddings e [T,Ep] / ed [T,Ed]
    (or, with transposed=True, eT [Ep,T] / edT [Ed,T]: the embedding-consuming
    layers become a sum of two contractions instead of a lane-concat + matmul;
    numerically the same f32 accumulation either way).
    Returns (out [T, 4+C], cache-or-None). Cached activations are cast to
    cache_dtype and the *cast* value is used downstream, so forward and
    recompute see identical numerics."""
    cast = _cast_fn(cache_dtype)
    it = iter(wv)
    h = None
    hs: List[jnp.ndarray] = []
    e_dim = e.shape[0] if transposed else e.shape[-1]
    for kind in kinds:
        w, b = next(it), next(it)
        if kind == "emb0":
            pre = _dot_te(e, w) if transposed else _dot(e, w)
        elif kind == "split":
            if transposed:
                hw = w.shape[0] - e_dim
                pre = _dot(h, w[:hw]) + _dot_te(e, w[hw:])
            else:
                pre = _dot(jnp.concatenate([h, e], axis=-1), w)
        else:
            pre = _dot(h, w)
        h = cast(jnp.maximum(pre + b, 0.0))
        hs.append(h)

    # fused head (module docstring): Wf/Wi carry the rgb/ins HIDDEN widths
    # (Hr/Hi — stub pytrees shrink them); M1's trailing density column is
    # bit-identical to the old layout's
    m1, b1 = next(it), next(it)
    pre1 = _dot(h, m1) + b1                     # [T, Hr+Hi+1] f32
    wrh2, _zb = next(it), next(it)
    edc = _dot_te(ed, wrh2) if transposed else _dot(ed, wrh2)
    rh = cast(jnp.maximum(pre1[:, :Wf] + edc, 0.0))
    ih = cast(jnp.maximum(pre1[:, Wf:Wf + Wi], 0.0))
    sigma = pre1[:, Wf + Wi:]
    wro, bro = next(it), next(it)
    rgb = _dot(rh, wro) + bro
    wio, bio = next(it), next(it)
    ins = _dot(ih, wio) + bio

    out = jnp.concatenate([rgb, sigma, ins], axis=-1)
    if not want_cache:
        return out, None
    cache = dict(e=e, ed=ed, hs=hs, rh=rh, ih=ih,
                 heads=(m1, wro, wio))
    return out, cache


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

# The Mosaic scoped-VMEM default is 16 MiB; v5e has 128 MiB physical VMEM.
# Larger tiles amortize per-grid-step overhead and widen the MXU's M dimension,
# so let the kernels use most of the chip's VMEM. 112 MiB: the tile_bwd=8192
# backward peaks at ~100.4 MiB of scoped stack depending on the surrounding
# graph (observed 340 KB over a 100 MiB limit under value_and_grad) — leave
# real headroom above the observed peak, below the 128 MiB physical.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _load_wv(wrefs, layout, n_pairs):
    """Load the fused weight/bias buffers and slice them back into the flat
    [w0, b0, w1, b1, ...] order _forward_core consumes (see _fuse_layout)."""
    return _unfuse_ops([r[:] for r in wrefs], layout, n_pairs)


def _fwd_kernel(kinds, layout, n_pairs, Wf, Wi, cache_dtype, *refs):
    n_ops = 2 * len(layout)
    (x_ref, d_ref, Fp_ref, Fd_ref), wrefs, (out_ref,) = refs[:4], refs[4:4 + n_ops], refs[4 + n_ops:]
    wv = _load_wv(wrefs, layout, n_pairs)
    e, ed = _embed_pair(x_ref[:], d_ref[:], Fp_ref[:], Fd_ref[:], _cast_fn(cache_dtype))
    out, _ = _forward_core(e, ed, wv, kinds, Wf, Wi, cache_dtype, want_cache=False)
    out_ref[:] = out


def _fwd_kernel_pe(kinds, layout, n_pairs, Wf, Wi, cache_dtype, *refs):
    """pe_mode='outside' forward: embeddings are kernel inputs (already cast)."""
    n_ops = 2 * len(layout)
    (e_ref, ed_ref), wrefs, (out_ref,) = refs[:2], refs[2:2 + n_ops], refs[2 + n_ops:]
    wv = _load_wv(wrefs, layout, n_pairs)
    out, _ = _forward_core(e_ref[:], ed_ref[:], wv, kinds, Wf, Wi, cache_dtype,
                           want_cache=False)
    out_ref[:] = out


def _bwd_kernel(kinds, layout, n_pairs, Wf, Wi, cache_dtype, *refs):
    n_ops = 2 * len(layout)
    ins_refs = refs[: 5 + n_ops]
    out_refs = refs[5 + n_ops:]
    x_ref, d_ref, g_ref, Fp_ref, Fd_ref = ins_refs[:5]
    x, d, g = x_ref[:], d_ref[:], g_ref[:]
    wv = _load_wv(ins_refs[5:], layout, n_pairs)
    e, ed = _embed_pair(x, d, Fp_ref[:], Fd_ref[:], _cast_fn(cache_dtype))
    _, cache = _forward_core(e, ed, wv, kinds, Wf, Wi, cache_dtype, want_cache=True)
    grads = _backward_core(g, wv, cache, kinds, Wf, Wi, cache_dtype)
    _accumulate_grads(out_refs, _fuse_ops(grads, layout))


def _bwd_kernel_pe(kinds, layout, n_pairs, Wf, Wi, cache_dtype, *refs):
    """pe_mode='outside' backward: embeddings are kernel inputs (already cast)."""
    n_ops = 2 * len(layout)
    ins_refs = refs[: 3 + n_ops]
    out_refs = refs[3 + n_ops:]
    e_ref, ed_ref, g_ref = ins_refs[:3]
    wv = _load_wv(ins_refs[3:], layout, n_pairs)
    _, cache = _forward_core(e_ref[:], ed_ref[:], wv, kinds, Wf, Wi, cache_dtype,
                             want_cache=True)
    grads = _backward_core(g_ref[:], wv, cache, kinds, Wf, Wi, cache_dtype)
    _accumulate_grads(out_refs, _fuse_ops(grads, layout))


def _fwd_kernel_pet(kinds, layout, n_pairs, Wf, Wi, cache_dtype, multires, pe_exact, *refs):
    """pe_mode='kernel_t' forward: transposed coords in, PE fused in-register."""
    n_ops = 2 * len(layout)
    (xT_ref, edT_ref, FpT_ref), wrefs, (out_ref,) = \
        refs[:3], refs[3:3 + n_ops], refs[3 + n_ops:]
    cast = _cast_fn(cache_dtype)
    eT = cast(_pe_transposed(xT_ref[:], FpT_ref[:], multires, pe_exact))
    out, _ = _forward_core(eT, edT_ref[:], _load_wv(wrefs, layout, n_pairs),
                           kinds, Wf, Wi, cache_dtype, want_cache=False,
                           transposed=True)
    out_ref[:] = out


def _bwd_kernel_pet(kinds, layout, n_pairs, Wf, Wi, cache_dtype, multires, pe_exact, *refs):
    """pe_mode='kernel_t' backward: recomputes the transposed PE per tile."""
    n_ops = 2 * len(layout)
    ins_refs = refs[: 4 + n_ops]
    out_refs = refs[4 + n_ops:]
    xT_ref, edT_ref, g_ref, FpT_ref = ins_refs[:4]
    wv = _load_wv(ins_refs[4:], layout, n_pairs)
    cast = _cast_fn(cache_dtype)
    eT = cast(_pe_transposed(xT_ref[:], FpT_ref[:], multires, pe_exact))
    _, cache = _forward_core(eT, edT_ref[:], wv, kinds, Wf, Wi, cache_dtype,
                             want_cache=True, transposed=True)
    grads = _backward_core(g_ref[:], wv, cache, kinds, Wf, Wi, cache_dtype,
                           transposed=True)
    _accumulate_grads(out_refs, _fuse_ops(grads, layout))


def _backward_core(g, wv, cache, kinds, Wf, Wi, cache_dtype, transposed=False):
    """Parameter cotangents for one tile, from the remat'ed forward cache.
    transposed=True: cache holds eT [Ep,T] / edT [Ed,T]; their dW contributions
    are plain eT @ d (contracting the point lanes) instead of e^T @ d."""
    e, ed, hs_list = cache["e"], cache["ed"], cache["hs"]
    emb_dw = (lambda emb, d: _dot(emb, d)) if transposed else _dot_tt
    rh, ih = cache["rh"], cache["ih"]
    m1, wro, wio = cache["heads"]
    h_last = hs_list[-1]

    C = wio.shape[1]
    g_rgb, g_sigma, g_ins = g[:, :3], g[:, 3:4], g[:, 4: 4 + C]
    # Cotangents live in f32 (exact bias sums); each tensor is cast ONCE to the
    # cache/compute dtype for its matmul uses — the same rounding the MXU would
    # apply per-use at default precision, minus the redundant conversion passes.
    cast = (lambda a: a.astype(cache_dtype)) if cache_dtype is not None else (lambda a: a)
    g_rgb_c, g_sigma_c, g_ins_c = cast(g_rgb), cast(g_sigma), cast(g_ins)

    # ---- fused head (module docstring): Wf/Wi = hidden widths Hr/Hi ----
    # ins branch: no cotangent into the trunk (the reference's detach)
    d_ih = _dot_nt(g_ins_c, wio) * _mask(ih)
    d_ih_c = cast(d_ih)
    dwio, dbio = _dot_tt(ih, g_ins_c), jnp.sum(g_ins, 0, keepdims=True)

    d_rh = _dot_nt(g_rgb_c, wro) * _mask(rh)
    d_rh_c = cast(d_rh)
    dwro, dbro = _dot_tt(rh, g_rgb_c), jnp.sum(g_rgb, 0, keepdims=True)
    dwrh2 = emb_dw(ed, d_rh_c)
    dzb = jnp.zeros((1, Wf), jnp.float32)  # structural zero bias slot

    # one dM1/db1 over [rgb | ins | density] columns; dx excludes the ins block
    d_pre1_c = jnp.concatenate([d_rh_c, d_ih_c, g_sigma_c], axis=-1)
    dm1 = _dot_tt(h_last, d_pre1_c)
    db1 = jnp.concatenate([jnp.sum(d_rh, 0, keepdims=True),
                           jnp.sum(d_ih, 0, keepdims=True),
                           jnp.sum(g_sigma, 0, keepdims=True)], axis=-1)
    d_h = _dot_nt(d_rh_c, m1[:, :Wf]) + _dot_nt(g_sigma_c, m1[:, Wf + Wi:])

    # ---- trunk (reverse) ----
    trunk_grads: List[List[jnp.ndarray]] = []
    n_layers = len(kinds)
    for i in range(n_layers - 1, -1, -1):
        kind = kinds[i]
        w = wv[2 * i]
        d_pre = d_h * _mask(hs_list[i])
        d_pre_c = cast(d_pre)
        db = jnp.sum(d_pre, 0, keepdims=True)
        e_dim = e.shape[0] if transposed else e.shape[-1]
        if kind == "emb0":
            trunk_grads.append([emb_dw(e, d_pre_c), db])
            d_h = None  # no dx into the raw coordinates (structurally unused)
        elif kind == "split":
            hw = w.shape[0] - e_dim
            if transposed:
                dw = jnp.concatenate(
                    [_dot_tt(hs_list[i - 1], d_pre_c), emb_dw(e, d_pre_c)], axis=0)
            else:
                dw = _dot_tt(jnp.concatenate([hs_list[i - 1], e], axis=-1), d_pre_c)
            trunk_grads.append([dw, db])
            d_h = _dot_nt(d_pre_c, w[:hw])
        else:
            trunk_grads.append([_dot_tt(hs_list[i - 1], d_pre_c), db])
            d_h = _dot_nt(d_pre_c, w)

    grads: List[jnp.ndarray] = []
    for lg in reversed(trunk_grads):
        grads.extend(lg)
    grads += [dm1, db1, dwrh2, dzb, dwro, dbro, dwio, dbio]
    return grads


def _const_block(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _points_call(kernel_fn, tile, pins, consts, packed, out, interpret):
    """Shared pad + pallas_call scaffolding for every fused-kernel variant, so
    tiling/compiler-parameter fixes land in exactly one place (ADVICE r2 #1).

    pins: [(array, axis)] — per-point operands, tiled along their point `axis`
    (0: rows [P, w]; 1: columns [w, P]) and zero-padded to the tile grid.
    consts: small whole-array operands (frequency matrices).
    packed: weight operands (whole-array blocks, VMEM-resident across the grid).
    out: ("tile", C4) for a [P, C4] row-tiled forward output, or ("grads",) for
    the backward's parameter-cotangent accumulators (shapes of `packed`)."""
    P = pins[0][0].shape[pins[0][1]]
    Pp = _round_up(max(P, 1), tile)
    arrs, specs = [], []
    for a, ax in pins:
        pad = [(0, 0), (0, 0)]
        pad[ax] = (0, Pp - P)
        arrs.append(jnp.pad(a, pad))
        w = a.shape[1 - ax]
        if ax == 0:
            specs.append(pl.BlockSpec((tile, w), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        else:
            specs.append(pl.BlockSpec((w, tile), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
    specs += [_const_block(c.shape) for c in consts]
    specs += [_const_block(w.shape) for w in packed]
    if out[0] == "tile":
        out_shape = jax.ShapeDtypeStruct((Pp, out[1]), jnp.float32)
        out_specs = pl.BlockSpec((tile, out[1]), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    else:
        out_shape = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in packed]
        out_specs = [_const_block(w.shape) for w in packed]
    res = pl.pallas_call(
        kernel_fn, out_shape=out_shape, grid=(Pp // tile,),
        in_specs=specs, out_specs=out_specs,
        compiler_params=_COMPILER_PARAMS, interpret=interpret,
    )(*arrs, *consts, *packed)
    return res[:P] if out[0] == "tile" else res


def _accumulate_grads(out_refs, grads):
    """First grid step initializes the accumulators, later steps add (the grid is
    sequential on TPU and the out blocks stay VMEM-resident: constant index map)."""
    assert len(grads) == len(out_refs), (len(grads), len(out_refs))
    is_first = pl.program_id(0) == 0
    for ref, val in zip(out_refs, grads):
        @pl.when(is_first)
        def _(ref=ref, val=val):
            ref[:] = val

        @pl.when(jnp.logical_not(is_first))
        def _(ref=ref, val=val):
            ref[:] = ref[:] + val


def make_pe_pallas(multires: int, out_dtype, tile: int = 8192, interpret: bool = False):
    """Single-pass Pallas positional encoding: x [P, 3] -> [P, 3*(1+2*multires)].

    Why a kernel for an elementwise op: XLA materializes the concat operands of
    [x | sin(xf) | cos(xf)] (plus the f32 intermediates) through HBM — measured
    ~4.9 ms for the flagship fine pass [589824, 63] vs ~0.2 ms of actual
    bandwidth. Here the frequency product, sin/cos and lane-concat all happen in
    VMEM and exactly one bf16 (or f32) embedding array is ever written.

    Numerics match `_pe_outside` bit-for-bit in f32: the frequency matrix holds
    exact powers of two and the product runs at HIGHEST precision (`_dot_exact`),
    so phases are exact — the same rule the in-kernel pe_mode='kernel' path uses
    (see `_dot_exact` docstring for the bf16-rounding failure this avoids).

    NOTE: pe_mode='kernel_t' (the production default) is faster still — it fuses
    a transposed double-angle PE into the main kernels (see `_pe_transposed`) and
    never materializes the embedding at all. This standalone kernel remains the
    'outside' path: exact octaves, row-major output."""
    F = jnp.asarray(_freq_matrix(multires))
    Ep = _emb_dim(multires)

    def kernel(x_ref, F_ref, out_ref):
        x = x_ref[:]
        xf = _dot_exact(x, F_ref[:])
        out_ref[:] = jnp.concatenate(
            [x, jnp.sin(xf), jnp.cos(xf)], axis=-1).astype(out_dtype)

    def pe(x):
        P = x.shape[0]
        Pp = _round_up(max(P, 1), tile)
        xp = jnp.pad(x, ((0, Pp - P), (0, 0)))
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Pp, Ep), out_dtype),
            grid=(Pp // tile,),
            in_specs=[
                pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(F.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, Ep), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(xp, F)
        return out[:P]

    return pe


def make_pallas_query_fn(
    multires: int = 10,
    multires_views: int = 4,
    D: int = 8,
    skips: Tuple[int, ...] = (4,),
    tile_fwd: int = 4096,
    tile_bwd: int = 8192,
    interpret: bool = False,
    mesh=None,
    cache_dtype=None,
    pe_mode: str = "kernel_t",
):
    """Drop-in replacement for core.pipeline.make_xla_query_fn backed by the fused
    Pallas kernels. query(params, pts [N,S,3], viewdirs [N,3]) -> raw [N,S,4+C].

    Requires positional encoding enabled (i_embed == 0 in reference terms).

    cache_dtype: dtype for rematerialized activations inside the backward kernel
    (and the matching forward compute). None = bf16 compiled / f32 interpreted —
    bf16 is numerically identical compiled because the MXU rounds f32 matmul
    inputs to bf16 at default precision anyway (see module docstring), while the
    interpret-mode CPU tests compare against an exact-f32 XLA path.

    mesh: optional jax.sharding.Mesh with a 'data' axis. GSPMD cannot auto-partition
    a pallas_call (tpu_custom_call), so under a mesh the query is shard_map'ed along
    the ray axis: each device runs the kernel on its ray shard; parameters are
    replicated (in_specs P()) and shard_map's transpose inserts the gradient psum
    over 'data' automatically. The per-ray N axis must be divisible by the axis size
    (the sharded train step already enforces this for the batch).

    pe_mode: where the positional encoding is computed.
      'kernel_t'— (default) coords ship transposed [3, P]; both kernels fuse a
                  lane-parallel double-angle PE (_pe_transposed: sin/cos at the
                  base octave only, higher octaves by recursion) and consume the
                  embedding column-major via dot_general — no embedding ever
                  touches HBM and the transcendental count drops 10x. The
                  viewdir embedding is computed per-RAY in XLA and repeated.
      'kernel'  — in-register inside both kernels (exact-precision freq matmul +
                  sin/cos per [T,30] tile). No embedding touches HBM, but the
                  full per-octave transcendentals serialize with the MXU.
      'outside' — a standalone Pallas PE kernel (make_pe_pallas) materializes
                  e [P, Ep] once in the compute dtype; the main kernels become
                  pure matmul chains. Costs ~106 MB/pass of HBM plus the full
                  per-octave transcendentals, but keeps the embedding exact —
                  the conservative choice for numerics experiments."""
    assert multires > 0 and multires_views > 0, "pallas path needs PE enabled"
    assert pe_mode in ("kernel", "outside", "kernel_t"), pe_mode
    kinds = tuple(_layer_kinds(D, tuple(skips)))
    Fp = jnp.asarray(_freq_matrix(multires))
    Fd = jnp.asarray(_freq_matrix(multires_views))
    FpT = jnp.asarray(_freq_matrix(multires).T)
    if cache_dtype is None:
        cache_dtype = jnp.float32 if interpret else jnp.bfloat16
    # exact per-octave sin/cos whenever the activation cache is full-precision
    # (interpret-mode CPU parity tests); double-angle otherwise (see _pe_transposed)
    pe_exact = jnp.dtype(cache_dtype).itemsize >= 4

    def _prep(params):
        """Row-permute/concat the pytree (_pack), then fuse by column width
        (_fuse_layout/_fuse_ops) so the kernels see ~5 weight + ~5 bias operands
        instead of 26. Weight buffers ship in the compute dtype: at default
        precision the MXU rounds f32 inputs to bf16 per use anyway, so casting
        once outside the kernel is numerically identical and removes a
        per-grid-step conversion pass per matmul (plus half the weight VMEM).
        Bias buffers stay f32 (added to the f32 MXU accumulator)."""
        flat = _pack(params, multires, multires_views, D, tuple(skips))
        layout = _fuse_layout([w.shape for w in flat[::2]])
        fused = [w.astype(cache_dtype) if i % 2 == 0 else w
                 for i, w in enumerate(_fuse_ops(flat, layout))]
        # head algebra fusion: the kernels split M1's columns by the rgb/ins
        # HIDDEN widths (Hr/Hi) — stub pytrees shrink these to stub_w
        Wf = params["rgb_hid_w"].shape[1]
        Wi = params["ins_hid_w"].shape[1]
        C4 = params["ins_out_w"].shape[1] + 4
        return fused, layout, len(flat) // 2, Wf, Wi, C4

    def _unpack(dws, layout, n_pairs, params):
        return _unpack_grads(_unfuse_ops(dws, layout, n_pairs), params,
                             multires, multires_views, D, tuple(skips))

    # ---- pe_mode='kernel': coords in, exact PE in-register, both kernels ----
    @jax.custom_vjp
    def query_flat(params, pts, dirs):
        return _fwd(params, pts, dirs)

    def _fwd(params, pts, dirs):
        packed, layout, n_pairs, Wf, Wi, C4 = _prep(params)
        kern = functools.partial(_fwd_kernel, kinds, layout, n_pairs, Wf, Wi,
                                 cache_dtype)
        return _points_call(kern, tile_fwd, [(pts, 0), (dirs, 0)], [Fp, Fd],
                            packed, ("tile", C4), interpret)

    def _fwd_rule(params, pts, dirs):
        return _fwd(params, pts, dirs), (params, pts, dirs)

    def _bwd_rule(res, g):
        params, pts, dirs = res
        packed, layout, n_pairs, Wf, Wi, C4 = _prep(params)
        kern = functools.partial(_bwd_kernel, kinds, layout, n_pairs, Wf, Wi,
                                 cache_dtype)
        dws = _points_call(kern, tile_bwd, [(pts, 0), (dirs, 0), (g, 0)], [Fp, Fd],
                           packed, ("grads",), interpret)
        return (_unpack(dws, layout, n_pairs, params),
                jnp.zeros_like(pts), jnp.zeros_like(dirs))

    query_flat.defvjp(_fwd_rule, _bwd_rule)

    # ---- pe_mode='outside': embeddings built outside, kernels matmul-only ----
    Ep, Ed = _emb_dim(multires), _emb_dim(multires_views)

    def _pe_outside(x, multires_):
        """Freq-major kernel lane order [x | sin(f-major) | cos(f-major)]. The
        frequency scaling is an exact elementwise powers-of-two product, so the
        phases match the in-kernel _dot_exact path bit-for-bit in f32."""
        freqs = jnp.asarray([2.0 ** f for f in range(multires_)], x.dtype)
        xs = (x[:, None, :] * freqs[:, None]).reshape(x.shape[0], -1)
        return jnp.concatenate([x, jnp.sin(xs), jnp.cos(xs)], axis=-1)

    @jax.custom_vjp
    def query_flat_pe(params, e, ed):
        return _fwd_pe(params, e, ed)

    def _fwd_pe(params, e, ed):
        packed, layout, n_pairs, Wf, Wi, C4 = _prep(params)
        kern = functools.partial(_fwd_kernel_pe, kinds, layout, n_pairs, Wf, Wi,
                                 cache_dtype)
        return _points_call(kern, tile_fwd, [(e, 0), (ed, 0)], [],
                            packed, ("tile", C4), interpret)

    def _fwd_rule_pe(params, e, ed):
        return _fwd_pe(params, e, ed), (params, e, ed)

    def _bwd_rule_pe(res, g):
        params, e, ed = res
        packed, layout, n_pairs, Wf, Wi, C4 = _prep(params)
        kern = functools.partial(_bwd_kernel_pe, kinds, layout, n_pairs, Wf, Wi,
                                 cache_dtype)
        dws = _points_call(kern, tile_bwd, [(e, 0), (ed, 0), (g, 0)], [],
                           packed, ("grads",), interpret)
        return (_unpack(dws, layout, n_pairs, params),
                jnp.zeros_like(e), jnp.zeros_like(ed))

    query_flat_pe.defvjp(_fwd_rule_pe, _bwd_rule_pe)

    # ---- pe_mode='kernel_t': transposed coords in, fused double-angle PE ----
    @jax.custom_vjp
    def query_flat_pet(params, xT, edT):
        return _fwd_pet(params, xT, edT)

    def _fwd_pet(params, xT, edT):
        packed, layout, n_pairs, Wf, Wi, C4 = _prep(params)
        kern = functools.partial(_fwd_kernel_pet, kinds, layout, n_pairs, Wf, Wi,
                                 cache_dtype, multires, pe_exact)
        return _points_call(kern, tile_fwd, [(xT, 1), (edT, 1)], [FpT],
                            packed, ("tile", C4), interpret)

    def _fwd_rule_pet(params, xT, edT):
        return _fwd_pet(params, xT, edT), (params, xT, edT)

    def _bwd_rule_pet(res, g):
        params, xT, edT = res
        packed, layout, n_pairs, Wf, Wi, C4 = _prep(params)
        kern = functools.partial(_bwd_kernel_pet, kinds, layout, n_pairs, Wf, Wi,
                                 cache_dtype, multires, pe_exact)
        dws = _points_call(kern, tile_bwd, [(xT, 1), (edT, 1), (g, 0)], [FpT],
                           packed, ("grads",), interpret)
        return (_unpack(dws, layout, n_pairs, params),
                jnp.zeros_like(xT), jnp.zeros_like(edT))

    query_flat_pet.defvjp(_fwd_rule_pet, _bwd_rule_pet)

    pe_points = make_pe_pallas(multires, cache_dtype,
                               tile=(tile_fwd if interpret else max(tile_fwd, 8192)),
                               interpret=interpret)

    def query(params, pts, viewdirs):
        N, S, _ = pts.shape
        if pe_mode == "kernel_t":
            # rays/z-vals carry no gradient in every consumer (stop_gradient /
            # data — reference render.py:66-68), so the PE sits outside autodiff.
            # Coordinates ship TRANSPOSED [3, P] (points fill the VPU lanes for
            # the in-kernel double-angle PE); the per-ray viewdir embedding is
            # computed once in XLA (N sin/cos evaluations, not N*S) and repeated
            # per sample along the lane axis. Coordinates stay f32 — bf16 coords
            # would corrupt the high-octave phases (see _dot_exact).
            xT = pts.reshape(N * S, 3).T
            edr = _pe_outside(viewdirs, multires_views).astype(cache_dtype)
            edT = jnp.repeat(edr.T, S, axis=1)
            raw = query_flat_pet(params, jax.lax.stop_gradient(xT),
                                 jax.lax.stop_gradient(edT))
            return raw.reshape(N, S, -1)
        if pe_mode == "outside":
            # the point embedding [N*S, Ep] is built by its own single-pass
            # Pallas kernel (make_pe_pallas); the per-ray [N, Ed] viewdir
            # embedding is tiny and stays in XLA.
            e = pe_points(pts.reshape(N * S, 3))
            edr = _pe_outside(viewdirs, multires_views).astype(cache_dtype)
            ed = jnp.broadcast_to(edr[:, None, :], (N, S, Ed)).reshape(N * S, Ed)
            raw = query_flat_pe(params, jax.lax.stop_gradient(e),
                                jax.lax.stop_gradient(ed))
            return raw.reshape(N, S, -1)
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
