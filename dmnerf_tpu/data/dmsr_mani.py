"""DM-SR manipulated-ground-truth loader for manipulation evaluation.

Behavioral parity with /root/reference/datasets/loader_dmsr_mani.py:42-140:
 * indoor_{mani_mode}_test/{rgbs, semantic_instance} images, poses from the scene's
   top-level transforms.json, testskip applied to both;
 * same blender K convention as the DM-SR loader (negative fy, fz = -1);
 * load_mani_poses reads transformation_matrix.json written by tools.pose_gen
   (loader_dmsr_mani.py:121-127).
"""

from __future__ import annotations

import json
import os

import numpy as np

from dmnerf_tpu.configs import Config
from dmnerf_tpu.data.dmsr import _read_image, _sorted_files, load_palette
from dmnerf_tpu.data.scene import SceneData


def load_dmsr_mani(cfg: Config) -> SceneData:
    basedir = cfg.datadir
    skip = cfg.testskip if cfg.testskip != 0 else 1
    root = os.path.join(basedir, f"indoor_{cfg.mani_mode}_test")

    rgbs = [_read_image(f) for f in _sorted_files(os.path.join(root, "rgbs"))]
    with open(os.path.join(basedir, "transforms.json")) as f:
        meta = json.load(f)
    poses = np.array([fr["transform_matrix"] for fr in meta["frames"]], np.float32)[::skip]
    idx = np.arange(0, len(rgbs), skip)
    images = (np.array(rgbs)[idx] / 255.0).astype(np.float32)[..., :3]

    labels = np.array([_read_image(f) for f in _sorted_files(os.path.join(root, "semantic_instance"))])[idx]

    ins_rgbs = load_palette(basedir)
    H, W = images.shape[1:3]
    angle_x = meta["camera_angle_x"]
    focal = 0.5 * W / np.tan(0.5 * angle_x)
    K = np.array([[focal, 0, W * 0.5], [0, -focal, H * 0.5], [0, 0, -1]], np.float32)

    n = len(images)
    return SceneData(
        images=images, poses=poses.reshape(-1, 4, 4), H=int(H), W=int(W), K=K,
        i_train=np.arange(0), i_test=np.arange(n),
        gt_labels=labels.astype(np.int32), ins_rgbs=ins_rgbs, ins_num=len(ins_rgbs),
    )


def load_mani_poses(datadir: str):
    """transformation_matrix.json -> list of {'transformation', 'mode'} dicts
    (reference load_mani_poses, loader_dmsr_mani.py:121-127)."""
    with open(os.path.join(datadir, "transformation_matrix.json")) as f:
        return json.load(f)["transformations"]


def load_obj_poses(datadir: str):
    """Demo-mode transformation_matrix.json -> {obj_name: [pose_dict, ...]}
    (reference loader_dmsr.load_mani_poses, loader_dmsr.py:141-147)."""
    with open(os.path.join(datadir, "transformation_matrix.json")) as f:
        return json.load(f)
