"""Round-4 render probe 4: forward-kernel knobs at the render's chunk-2048 shape.

  queries_2048      coarse(stub)+fine at fixed z, chunk 2048 (kernel-only cost)
  fine tile sweep   tile_fwd in {2048, 3072, 4096, 6144, 8192} on fine_only
  par semantics     dimension_semantics=('parallel',) if this JAX exposes it

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev/render_probe4.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from dmnerf_tpu.configs import Config
from dmnerf_tpu.core.mlp import sigma_stub_params
from dmnerf_tpu.core.rays import rays_from_K
from dmnerf_tpu.core.sampling import z_val_sample
from dmnerf_tpu.kernels import fused_mlp
from dmnerf_tpu.render.trainstep import create_train_state

H = W = 256
REPS = 5
CHUNK = 2048


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


def chunked_sum(fn, chunk, ro, rd):
    n = ro.shape[0]
    pad = (-n) % chunk
    if pad:
        ro = jnp.concatenate([ro, jnp.zeros((pad, 3), ro.dtype)])
        rd = jnp.concatenate([rd, jnp.zeros((pad, 3), rd.dtype)])
    return jnp.sum(jax.lax.map(fn, (ro.reshape(-1, chunk, 3),
                                    rd.reshape(-1, chunk, 3))))


def main():
    cfg = Config(N_train=3072, N_samples=64, N_importance=128, N_test=CHUNK,
                 near=2.0, far=7.0, ins_num=32)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    K = jnp.asarray([[300.0, 0, W / 2], [0, -300.0, H / 2], [0, 0, -1.0]])
    ro, rd = rays_from_K(H, W, K, jnp.eye(4))
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    pc, pf = state.params_coarse, state.params_fine
    pcs = sigma_stub_params(pc)
    z_c = z_val_sample(CHUNK, cfg.near, cfg.far, cfg.N_samples)
    z_f = z_val_sample(CHUNK, cfg.near, cfg.far, cfg.N_samples + cfg.N_importance)

    def build(q):
        def fine_only(args):
            o, d = args
            d = jnp.where(jnp.sum(d * d, -1, keepdims=True) > 0, d, jnp.ones_like(d))
            vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            pts = o[..., None, :] + d[..., None, :] * z_f[..., :, None]
            return jnp.sum(q(pf, pts, vd))

        def queries(args):
            o, d = args
            d = jnp.where(jnp.sum(d * d, -1, keepdims=True) > 0, d, jnp.ones_like(d))
            vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            pts_c = o[..., None, :] + d[..., None, :] * z_c[..., :, None]
            pts_f = o[..., None, :] + d[..., None, :] * z_f[..., :, None]
            return jnp.sum(q(pcs, pts_c, vd)) + jnp.sum(q(pf, pts_f, vd))

        return fine_only, queries

    q0 = fused_mlp.make_pallas_query_fn(cfg.multires, cfg.multires_views,
                                        cfg.netdepth, tuple(cfg.skips))
    fine0, queries0 = build(q0)
    log(f"queries_2048 tile=4096: "
        f"{timer(lambda o, d: chunked_sum(queries0, CHUNK, o, d), ro, rd):.1f} ms")

    for tile in (2048, 3072, 4096, 6144, 8192):
        q = fused_mlp.make_pallas_query_fn(cfg.multires, cfg.multires_views,
                                           cfg.netdepth, tuple(cfg.skips),
                                           tile_fwd=tile)
        fine, _ = build(q)
        ms = timer(lambda o, d: chunked_sum(fine, CHUNK, o, d), ro, rd)
        log(f"fine_only_2048 tile={tile}: {ms:.1f} ms")

    # dimension_semantics experiment (monkeypatched compiler params)
    from jax.experimental.pallas import tpu as pltpu

    old = fused_mlp._COMPILER_PARAMS
    try:
        fused_mlp._COMPILER_PARAMS = pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
            dimension_semantics=("parallel",))
        q = fused_mlp.make_pallas_query_fn(cfg.multires, cfg.multires_views,
                                           cfg.netdepth, tuple(cfg.skips))
        fine, queries = build(q)
        ms = timer(lambda o, d: chunked_sum(fine, CHUNK, o, d), ro, rd)
        log(f"fine_only_2048 tile=4096 PARALLEL: {ms:.1f} ms")
    except Exception as e:
        log(f"parallel semantics unsupported: {e!r}")
    finally:
        fused_mlp._COMPILER_PARAMS = old


if __name__ == "__main__":
    main()
