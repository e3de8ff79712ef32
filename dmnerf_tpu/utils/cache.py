"""Persistent XLA compilation cache.

Two facts about this environment make the cache load-bearing (not an optimization):
 * the axon TPU tunnel compiles remotely with a multi-minute cold-start and ~5 min
   for the fused train step;
 * the 2-vCPU host takes minutes to compile the same graph for the CPU backend.
Every driver (train/test/bench/graft entry) calls enable_persistent_cache() first, so
each program compiles once per (shape, backend) across all processes and rounds.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    import jax

    if path is None:
        path = os.environ.get(
            "DMNERF_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
