"""Test configuration.

- 8 virtual CPU devices so multi-chip sharding paths are exercised without TPU
  hardware (SURVEY.md §4 test strategy, item 3).
- Tests run on the CPU backend via jax_default_device (NOT via JAX_PLATFORMS=cpu:
  on this host the axon TPU plugin misbehaves when the platform list is overridden
  in-process, retry-looping for minutes per compile).
- Matmul precision pinned to 'highest' so float32 parity goldens hold on MXU backends.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_default_device", jax.devices("cpu")[0])

# persistent compile cache: the fused train step is a large graph and XLA-CPU on this
# 2-vCPU host takes minutes to compile it cold; warm runs hit the cache.
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
