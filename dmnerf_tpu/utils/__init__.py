from dmnerf_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint, latest_step
from dmnerf_tpu.utils.metrics_log import MetricsLogger
from dmnerf_tpu.utils.image_metrics import psnr_np, ssim_np, lpips_np, to8b
