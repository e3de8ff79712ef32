"""Compositor cost probe: the render attribution (render_probe.py) puts the two
composite passes at ~18 ms/image — far above their bandwidth bound (~5 ms to
re-read raw_fine). Suspect: the [N,S,C] broadcast-multiply-reduce lowers to VPU
sublane reductions. Variant: ONE batched dot_general contracting the sample axis
(w [N,S] x [sigmoid(rgb) | z | ins_logits] [N,S,37]) riding the MXU.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev/composite_probe.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.core.compositor import composite, exclusive_cumprod_one_minus

N, S, C4 = 4096, 192, 37
REPS = 10


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


def composite_einsum(raw, z_vals, rays_d):
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    sigma = raw[..., 3]
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    weights = alpha * exclusive_cumprod_one_minus(alpha)
    vals = jnp.concatenate(
        [jax.nn.sigmoid(raw[..., :3]), z_vals[..., None], raw[..., 4:]], axis=-1)
    acc = jnp.einsum("ns,nsc->nc", weights, vals)
    rgb = acc[..., :3]
    depth = acc[..., 3]
    ins = jax.nn.sigmoid(acc[..., 4:])
    return rgb, weights, depth, ins


def main():
    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randn(N, S, C4).astype(np.float32))
    z = jnp.sort(jnp.asarray(rng.rand(N, S).astype(np.float32) * 5 + 2), axis=-1)
    d = jnp.asarray(rng.randn(N, 3).astype(np.float32))

    ms = timer(lambda r, zz, dd: composite(r, zz, dd, keep_air=True,
                                           detach_ins_weights=False), raw, z, d)
    log(f"composite_base [4096x192]: {ms:.2f} ms  (x32 chunks = {ms*16:.1f} ms/img @4096 two passes?)")
    ms2 = timer(composite_einsum, raw, z, d)
    log(f"composite_einsum [4096x192]: {ms2:.2f} ms")

    a = jax.jit(lambda r, zz, dd: composite(r, zz, dd, keep_air=True,
                                            detach_ins_weights=False))(raw, z, d)
    b = jax.jit(composite_einsum)(raw, z, d)
    for x, y, name in [(a.rgb, b[0], "rgb"), (a.weights, b[1], "w"),
                       (a.depth, b[2], "depth"), (a.ins, b[3], "ins")]:
        log(f"  max|d{name}| = {float(jnp.max(jnp.abs(x - y))):.2e}")

    # weights-only (what the coarse pass consumes)
    def weights_only(r, zz, dd):
        dists = zz[..., 1:] - zz[..., :-1]
        dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
        dists = dists * jnp.linalg.norm(dd, axis=-1, keepdims=True)
        alpha = 1.0 - jnp.exp(-jax.nn.relu(r[..., 3]) * dists)
        return alpha * exclusive_cumprod_one_minus(alpha)

    raw_c = raw[:, :64]
    z_c = z[:, :64]
    ms3 = timer(weights_only, raw_c, z_c, d)
    log(f"weights_only [4096x64]: {ms3:.2f} ms")

    # how expensive is the log-scan itself at fine shape?
    alpha = jnp.asarray(rng.rand(N, S).astype(np.float32))
    ms4 = timer(exclusive_cumprod_one_minus, alpha)
    log(f"cumprod_scan [4096x192]: {ms4:.2f} ms")

    # sample_pdf + sort at render chunking
    from dmnerf_tpu.core.sampling import sample_pdf

    w64 = jnp.asarray(rng.rand(N, 64).astype(np.float32))
    z_mid = 0.5 * (z_c[..., 1:] + z_c[..., :-1])

    def pdf_sort(ww, zm, zc):
        zs = sample_pdf(zm, ww[..., 1:-1], 128, key=None)
        return jnp.sort(jnp.concatenate([zc, zs], -1), -1)

    ms5 = timer(pdf_sort, w64, z_mid, z_c)
    log(f"pdf+sort [4096]: {ms5:.2f} ms")


if __name__ == "__main__":
    main()
