from dmnerf_tpu.kernels.fused_mlp import make_pallas_query_fn  # noqa: F401
