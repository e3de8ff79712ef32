from dmnerf_tpu.render.trainstep import TrainState, make_train_step, create_train_state, lr_at_step
from dmnerf_tpu.render.renderer import render_image
