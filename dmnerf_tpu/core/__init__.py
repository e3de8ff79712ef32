from dmnerf_tpu.core.embedding import positional_encoding, embed_dim
from dmnerf_tpu.core.mlp import init_dm_nerf, dm_nerf_apply
from dmnerf_tpu.core.rays import rays_from_K, rays_for_pixels
from dmnerf_tpu.core.sampling import z_val_sample, perturb_z_vals, sample_pdf
from dmnerf_tpu.core.compositor import composite
from dmnerf_tpu.core.pipeline import render_rays
