"""Full-image rendering by ray micro-batching.

The reference renders test images with a Python chunk loop, one CUDA launch chain and
one host sync per chunk (/root/reference/networks/tester.py:62-76, with a shape-changing
final partial chunk). TPU-first redesign: the H*W rays are padded to a multiple of the
chunk size and swept with jax.lax.map inside ONE jit — a single static program, no
retrace for the tail, no per-chunk host round trips. Chunk size = cfg.N_test rays
(pick so a [chunk, N_samples+N_importance] tile fits VMEM comfortably).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from dmnerf_tpu.configs import Config
from dmnerf_tpu.core.pipeline import QueryFn, make_query_fn, render_rays
from dmnerf_tpu.core.sampling import z_val_sample


def _pad_to_multiple(x: jnp.ndarray, m: int):
    n = x.shape[0]
    pad = (-n) % m
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x, n


def make_image_renderer(cfg: Config, query_fn: Optional[QueryFn] = None):
    """Returns render_fn(params_coarse, params_fine, rays_o [N,3], rays_d [N,3])
    -> dict(rgb [N,3], ins [N,ins_num], depth [N]), jit-compiled once per ray count."""
    if query_fn is None:
        query_fn = make_query_fn(cfg)
    chunk = cfg.N_test
    z_coarse = z_val_sample(chunk, cfg.near, cfg.far, cfg.N_samples)

    @jax.jit
    def render_fn(params_coarse, params_fine, rays_o, rays_d):
        (ro, n), (rd, _) = _pad_to_multiple(rays_o, chunk), _pad_to_multiple(rays_d, chunk)
        ro = ro.reshape(-1, chunk, 3)
        rd = rd.reshape(-1, chunk, 3)

        def one_chunk(args):
            o, d = args
            # avoid 0/0 viewdirs on padding rays
            d = jnp.where(jnp.sum(d * d, -1, keepdims=True) > 0, d, jnp.ones_like(d))
            info = render_rays(
                params_coarse, params_fine, o, d, z_coarse, query_fn,
                N_importance=cfg.N_importance, perturb=False, key=None,
            )
            return {"rgb": info["rgb_fine"], "ins": info["ins_fine"], "depth": info["depth_fine"]}

        out = jax.lax.map(one_chunk, (ro, rd))
        return {k: v.reshape(-1, *v.shape[2:])[:n] for k, v in out.items()}

    return render_fn


def render_image(
    cfg: Config,
    params_coarse: Dict,
    params_fine: Dict,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    renderer=None,
):
    """Convenience wrapper: flat rays in, flat maps out (caller reshapes to H, W)."""
    if renderer is None:
        renderer = make_image_renderer(cfg)
    return renderer(params_coarse, params_fine, rays_o.reshape(-1, 3), rays_d.reshape(-1, 3))
