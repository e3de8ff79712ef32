from dmnerf_tpu.objfield.hungarian import linear_sum_assignment_jax
from dmnerf_tpu.objfield.losses import ins_criterion, img2mse, mse2psnr
from dmnerf_tpu.objfield.penalizer import ins_penalizer
from dmnerf_tpu.objfield.metrics import ins_eval, calculate_ap, THRESHOLDS
