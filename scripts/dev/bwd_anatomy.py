"""Backward-kernel anatomy at the flagship fine shape [3072x192, tile 8192].

Variants of the kernel_t backward, each a separate compiled pallas_call:
  full         production _backward_core
  recompute    forward-with-cache only, zero grads written (remat floor)
  no_dW        dx/mask chain + heads, all dW/db zeroed (dx-chain cost)
  db_mxu       production, but every bias grad = ones-row MXU matmul instead
               of a [T,n] sublane reduction (VPU suspect)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev/bwd_anatomy.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.core.mlp import init_dm_nerf
from dmnerf_tpu.kernels import fused_mlp as fm

N, S = 3072, 192
TILE = 8192
REPS = 20


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


def _backward_variant(g, wv, cache, kinds, Wf, Wi, cache_dtype, mode):
    _dot, _dot_tt, _dot_nt, _mask = fm._dot, fm._dot_tt, fm._dot_nt, fm._mask
    e, ed, hs_list = cache["e"], cache["ed"], cache["hs"]
    emb_dw = lambda emb, d: _dot(emb, d)  # transposed cache layout
    rf, fi, rh, ih = cache["rf"], cache["fi"], cache["rh"], cache["ih"]
    whead, wrh, wro, wih, wio = cache["heads"]
    h_last = hs_list[-1]
    C = wio.shape[1]
    g_rgb, g_sigma, g_ins = g[:, :3], g[:, 3:4], g[:, 4:4 + C]
    cast = (lambda a: a.astype(cache_dtype)) if cache_dtype is not None else (lambda a: a)
    g_rgb_c, g_sigma_c, g_ins_c = cast(g_rgb), cast(g_sigma), cast(g_ins)

    if mode == "db_mxu":
        ones = jnp.ones((1, g.shape[0]), cache_dtype or jnp.float32)
        bsum = lambda x_c, x_f: _dot(ones, x_c)
    else:
        bsum = lambda x_c, x_f: jnp.sum(x_f, 0, keepdims=True)

    zero_dw = mode == "no_dW"

    def dw(f, *a):
        if zero_dw:
            return jnp.zeros((a[0].shape[1] if f is _dot_tt else a[0].shape[0],
                              a[1].shape[1]), jnp.float32)
        return f(*a)

    d_ih = _dot_nt(g_ins_c, wio) * _mask(ih)
    d_ih_c = cast(d_ih)
    d_fi = _dot_nt(d_ih_c, wih)
    d_fi_c = cast(d_fi)
    dwio, dbio = dw(_dot_tt, ih, g_ins_c), bsum(g_ins_c, g_ins)
    dwih, dbih = dw(_dot_tt, fi, d_ih_c), bsum(d_ih_c, d_ih)

    d_rh = _dot_nt(g_rgb_c, wro) * _mask(rh)
    d_rh_c = cast(d_rh)
    dwro, dbro = dw(_dot_tt, rh, g_rgb_c), bsum(g_rgb_c, g_rgb)
    dwrh = jnp.concatenate([dw(_dot_tt, rf, d_rh_c), dw(emb_dw, ed, d_rh_c)], axis=0)
    dbrh = bsum(d_rh_c, d_rh)
    d_rf = _dot_nt(d_rh_c, wrh[:Wf])
    d_rf_c = cast(d_rf)

    d_head_c = jnp.concatenate([d_rf_c, d_fi_c, g_sigma_c], axis=-1)
    dwhead = dw(_dot_tt, h_last, d_head_c)
    dbhead = jnp.concatenate([bsum(d_rf_c, d_rf), bsum(d_fi_c, d_fi),
                              bsum(g_sigma_c, g_sigma)], axis=-1)
    d_h = _dot_nt(d_rf_c, whead[:, :Wf]) + _dot_nt(g_sigma_c, whead[:, Wf + Wi:])

    trunk_grads = []
    n_layers = len(kinds)
    for i in range(n_layers - 1, -1, -1):
        kind = kinds[i]
        w = wv[2 * i]
        d_pre = d_h * _mask(hs_list[i])
        d_pre_c = cast(d_pre)
        db = bsum(d_pre_c, d_pre)
        e_dim = e.shape[0]
        if kind == "emb0":
            trunk_grads.append([dw(emb_dw, e, d_pre_c), db])
            d_h = None
        elif kind == "split":
            hw = w.shape[0] - e_dim
            dwx = jnp.concatenate([dw(_dot_tt, hs_list[i - 1], d_pre_c),
                                   dw(emb_dw, e, d_pre_c)], axis=0)
            trunk_grads.append([dwx, db])
            d_h = _dot_nt(d_pre_c, w[:hw])
        else:
            trunk_grads.append([dw(_dot_tt, hs_list[i - 1], d_pre_c), db])
            d_h = _dot_nt(d_pre_c, w)

    grads = []
    for lg in reversed(trunk_grads):
        grads.extend(lg)
    grads += [dwhead, dbhead, dwrh, dbrh, dwro, dbro, dwih, dbih, dwio, dbio]
    return grads


def _bwd_kernel_variant(kinds, layout, n_pairs, Wf, Wi, cache_dtype, multires,
                        pe_exact, mode, *refs):
    n_ops = 2 * len(layout)
    ins_refs = refs[: 4 + n_ops]
    out_refs = refs[4 + n_ops:]
    xT_ref, edT_ref, g_ref, FpT_ref = ins_refs[:4]
    wv = fm._load_wv(ins_refs[4:], layout, n_pairs)
    cast = fm._cast_fn(cache_dtype)
    eT = cast(fm._pe_transposed(xT_ref[:], FpT_ref[:], multires, pe_exact))
    _, cache = fm._forward_core(eT, edT_ref[:], wv, kinds, Wf, Wi, cache_dtype,
                                want_cache=True, transposed=True)
    if mode == "recompute":
        grads = [jnp.zeros(w.shape, jnp.float32) for w in
                 fm._unfuse_ops([r[:] for r in ins_refs[4:]], layout, n_pairs)]
    else:
        grads = _backward_variant(g_ref[:], wv, cache, kinds, Wf, Wi,
                                  cache_dtype, mode)
    fm._accumulate_grads(out_refs, fm._fuse_ops(grads, layout))


def main():
    multires, multires_views, D, skips = 10, 4, 8, (4,)
    cache_dtype = jnp.bfloat16
    kinds = tuple(fm._layer_kinds(D, tuple(skips)))
    FpT = jnp.asarray(fm._freq_matrix(multires).T)
    params = init_dm_nerf(jax.random.PRNGKey(0), ins_num=32)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-3, 3, (N, S, 3)).astype(np.float32))
    dirs = rng.randn(N, 3).astype(np.float32)
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))
    g = jnp.asarray(rng.randn(N * S, 37).astype(np.float32) * 0.1)

    flat = fm._pack(params, multires, multires_views, D, tuple(skips))
    layout = fm._fuse_layout([w.shape for w in flat[::2]])
    n_pairs = len(flat) // 2
    Wf = params["rgb_feat_w"].shape[1]
    Wi = params["ins_feat_w"].shape[1]

    freqs = jnp.asarray([2.0 ** f for f in range(multires_views)], jnp.float32)
    xs = (dirs[:, None, :] * freqs[:, None]).reshape(N, -1)
    edr = jnp.concatenate([dirs, jnp.sin(xs), jnp.cos(xs)], -1).astype(cache_dtype)

    def run(mode, params, pts, dirs_e, g):
        flat_p = fm._pack(params, multires, multires_views, D, tuple(skips))
        packed = [w.astype(cache_dtype) if i % 2 == 0 else w
                  for i, w in enumerate(fm._fuse_ops(flat_p, layout))]
        xT = pts.reshape(N * S, 3).T
        edT = jnp.repeat(dirs_e.T, S, axis=1)
        kern = functools.partial(_bwd_kernel_variant, kinds, layout, n_pairs,
                                 Wf, Wi, cache_dtype, multires, False, mode)
        return fm._points_call(kern, TILE, [(xT, 1), (edT, 1), (g, 0)], [FpT],
                               packed, ("grads",), False)

    base = None
    for mode in ("full", "recompute", "no_dW", "db_mxu"):
        f = functools.partial(run, mode)
        ms = timer(f, params, pts, edr, g)
        log(f"bwd {mode}: {ms:.2f} ms")
        if mode == "full":
            base = jax.jit(f)(params, pts, edr, g)
        if mode == "db_mxu":
            out = jax.jit(f)(params, pts, edr, g)
            err = max(float(jnp.max(jnp.abs(a - b)) /
                            (jnp.max(jnp.abs(a)) + 1e-12))
                      for a, b in zip(base, out))
            log(f"  db_mxu vs full max rel err: {err:.2e}")


# --- dw_last reorder experiment (phase-separated dx chain, then dW) ---
def _backward_dw_last(g, wv, cache, kinds, Wf, Wi, cache_dtype):
    _dot, _dot_tt, _dot_nt, _mask = fm._dot, fm._dot_tt, fm._dot_nt, fm._mask
    e, ed, hs_list = cache["e"], cache["ed"], cache["hs"]
    emb_dw = lambda emb, d: _dot(emb, d)
    rf, fi, rh, ih = cache["rf"], cache["fi"], cache["rh"], cache["ih"]
    whead, wrh, wro, wih, wio = cache["heads"]
    h_last = hs_list[-1]
    C = wio.shape[1]
    g_rgb, g_sigma, g_ins = g[:, :3], g[:, 3:4], g[:, 4:4 + C]
    cast = (lambda a: a.astype(cache_dtype)) if cache_dtype is not None else (lambda a: a)
    g_rgb_c, g_sigma_c, g_ins_c = cast(g_rgb), cast(g_sigma), cast(g_ins)

    d_ih = _dot_nt(g_ins_c, wio) * _mask(ih)
    d_ih_c = cast(d_ih)
    d_fi_c = cast(_dot_nt(d_ih_c, wih))
    d_rh = _dot_nt(g_rgb_c, wro) * _mask(rh)
    d_rh_c = cast(d_rh)
    d_rf = _dot_nt(d_rh_c, wrh[:Wf])
    d_rf_c = cast(d_rf)
    d_head_c = jnp.concatenate([d_rf_c, d_fi_c, g_sigma_c], axis=-1)
    d_h = _dot_nt(d_rf_c, whead[:, :Wf]) + _dot_nt(g_sigma_c, whead[:, Wf + Wi:])

    # phase 1: the serial dx chain, stashing bf16 d_pre per layer
    n_layers = len(kinds)
    d_pres = [None] * n_layers
    for i in range(n_layers - 1, -1, -1):
        kind = kinds[i]
        w = wv[2 * i]
        d_pre = d_h * _mask(hs_list[i])
        d_pres[i] = cast(d_pre)
        e_dim = e.shape[0]
        if kind == "emb0":
            d_h = None
        elif kind == "split":
            d_h = _dot_nt(d_pres[i], w[:w.shape[0] - e_dim])
        else:
            d_h = _dot_nt(d_pres[i], w)

    # phase 2: all dW/db products back-to-back (independent MXU work)
    grads = []
    for i in range(n_layers):
        kind = kinds[i]
        d_pre_c = d_pres[i]
        db = jnp.sum(d_pre_c.astype(jnp.float32), 0, keepdims=True)
        if kind == "emb0":
            dwx = emb_dw(e, d_pre_c)
        elif kind == "split":
            dwx = jnp.concatenate([_dot_tt(hs_list[i - 1], d_pre_c),
                                   emb_dw(e, d_pre_c)], axis=0)
        else:
            dwx = _dot_tt(hs_list[i - 1], d_pre_c)
        grads += [dwx, db]
    dwhead = _dot_tt(h_last, d_head_c)
    dbhead = jnp.concatenate(
        [jnp.sum(d_rf, 0, keepdims=True),
         jnp.sum(d_fi_c.astype(jnp.float32), 0, keepdims=True),
         jnp.sum(g_sigma, 0, keepdims=True)], axis=-1)
    dwrh = jnp.concatenate([_dot_tt(rf, d_rh_c), emb_dw(ed, d_rh_c)], axis=0)
    dbrh = jnp.sum(d_rh, 0, keepdims=True)
    grads += [dwhead, dbhead, dwrh, dbrh,
              _dot_tt(rh, g_rgb_c), jnp.sum(g_rgb, 0, keepdims=True),
              _dot_tt(fi, d_ih_c), jnp.sum(d_ih, 0, keepdims=True),
              _dot_tt(ih, g_ins_c), jnp.sum(g_ins, 0, keepdims=True)]
    return grads


def _bwd_kernel_dwlast(kinds, layout, n_pairs, Wf, Wi, cache_dtype, multires,
                       pe_exact, *refs):
    n_ops = 2 * len(layout)
    ins_refs = refs[: 4 + n_ops]
    out_refs = refs[4 + n_ops:]
    xT_ref, edT_ref, g_ref, FpT_ref = ins_refs[:4]
    wv = fm._load_wv(ins_refs[4:], layout, n_pairs)
    cast = fm._cast_fn(cache_dtype)
    eT = cast(fm._pe_transposed(xT_ref[:], FpT_ref[:], multires, pe_exact))
    _, cache = fm._forward_core(eT, edT_ref[:], wv, kinds, Wf, Wi, cache_dtype,
                                want_cache=True, transposed=True)
    grads = _backward_dw_last(g_ref[:], wv, cache, kinds, Wf, Wi, cache_dtype)
    fm._accumulate_grads(out_refs, fm._fuse_ops(grads, layout))


def main2():
    multires, multires_views, D, skips = 10, 4, 8, (4,)
    cache_dtype = jnp.bfloat16
    kinds = tuple(fm._layer_kinds(D, tuple(skips)))
    FpT = jnp.asarray(fm._freq_matrix(multires).T)
    params = init_dm_nerf(jax.random.PRNGKey(0), ins_num=32)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-3, 3, (N, S, 3)).astype(np.float32))
    dirs = rng.randn(N, 3).astype(np.float32)
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))
    g = jnp.asarray(rng.randn(N * S, 37).astype(np.float32) * 0.1)
    flat = fm._pack(params, multires, multires_views, D, tuple(skips))
    layout = fm._fuse_layout([w.shape for w in flat[::2]])
    n_pairs = len(flat) // 2
    Wf, Wi = params["rgb_feat_w"].shape[1], params["ins_feat_w"].shape[1]
    freqs = jnp.asarray([2.0 ** f for f in range(multires_views)], jnp.float32)
    xs = (dirs[:, None, :] * freqs[:, None]).reshape(N, -1)
    edr = jnp.concatenate([dirs, jnp.sin(xs), jnp.cos(xs)], -1).astype(cache_dtype)

    for tile in (8192, 6144):
        def run(params, pts, dirs_e, g, tile=tile):
            flat_p = fm._pack(params, multires, multires_views, D, tuple(skips))
            packed = [w.astype(cache_dtype) if i % 2 == 0 else w
                      for i, w in enumerate(fm._fuse_ops(flat_p, layout))]
            xT = pts.reshape(N * S, 3).T
            edT = jnp.repeat(dirs_e.T, S, axis=1)
            kern = functools.partial(_bwd_kernel_dwlast, kinds, layout, n_pairs,
                                     Wf, Wi, cache_dtype, multires, False)
            return fm._points_call(kern, tile, [(xT, 1), (edT, 1), (g, 0)],
                                   [FpT], packed, ("grads",), False)

        try:
            ms = timer(run, params, pts, edr, g)
            log(f"bwd dw_last tile={tile}: {ms:.2f} ms")
        except Exception as e:
            log(f"bwd dw_last tile={tile}: FAILED {type(e).__name__}: {str(e)[:160]}")

if __name__ == "__main__":
    main()
    main2()
