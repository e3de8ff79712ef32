from dmnerf_tpu.data.samplers import make_full_sampler, make_crop_sampler
from dmnerf_tpu.data.dmsr import load_dmsr
from dmnerf_tpu.data.replica import load_replica
from dmnerf_tpu.data.scannet import load_scannet
from dmnerf_tpu.data.dmsr_mani import load_dmsr_mani
from dmnerf_tpu.data.scene import SceneData, load_scene
