"""Replica (real capture) dataset loader.

Behavioral parity with /root/reference/datasets/loader_replica.py:41-192:
 * fixed split: train ids = range(0, 900, 5), test ids = train + 2
   (loader_replica.py:156-159); testskip subsamples the test list;
 * poses from traj_w_c.txt — flat 4x4 rows (loader_replica.py:98-100);
 * images rgb/rgb_{i}.png, labels semantic_instance/semantic_instance_{i}.png;
 * palette ins_rgb.hdf5;
 * intrinsics: focal = W/2, K = [[f, 0, (W-1)/2], [0, f, (H-1)/2], [0, 0, 1]]
   (loader_replica.py:188-189) — positive convention, unlike DM-SR;
 * manipulation-demo branch (reference's args.editor_demo, an UNDEFINED flag in the
   released config — SURVEY.md §4; here cfg.mani_demo): loads objs_info.json and
   builds view poses (repeat of poses[view_id] or a spherical path at
   theta ∈ linspace(-180, 180, views), phi=-65, r=7; loader_replica.py:163-169).
"""

from __future__ import annotations

import json
import os

import numpy as np

from dmnerf_tpu.configs import Config
from dmnerf_tpu.data.dmsr import _read_image, load_palette, pose_spherical
from dmnerf_tpu.data.scene import SceneData


def replica_split(total: int = 900, step: int = 5):
    train_ids = list(range(0, total, step))
    test_ids = [i + step // 2 for i in train_ids]
    return train_ids, test_ids


def load_replica(cfg: Config) -> SceneData:
    basedir = cfg.datadir
    train_ids, test_ids = replica_split()
    skip_idx = np.arange(0, len(test_ids), max(cfg.testskip, 1))
    test_ids = np.array(test_ids)[skip_idx]

    Ts = np.loadtxt(os.path.join(basedir, "traj_w_c.txt"), delimiter=" ").reshape(-1, 4, 4)
    poses = np.concatenate([Ts[train_ids], Ts[test_ids]], 0).astype(np.float32)

    def _imgs(ids):
        return np.array([_read_image(os.path.join(basedir, "rgb", f"rgb_{i}.png")) for i in ids])

    def _labels(ids):
        return np.array(
            [_read_image(os.path.join(basedir, "semantic_instance", f"semantic_instance_{i}.png")) for i in ids]
        )

    images = (np.concatenate([_imgs(train_ids), _imgs(test_ids)], 0) / 255.0).astype(np.float32)[..., :3]
    gt_labels = np.concatenate([_labels(train_ids), _labels(test_ids)], 0).astype(np.int32)

    i_train = np.arange(len(train_ids))
    i_test = np.arange(len(train_ids), len(train_ids) + len(test_ids))

    ins_rgbs = load_palette(basedir)
    H, W = images.shape[1:3]
    focal = W / 2.0
    K = np.array([[focal, 0, (W - 1) * 0.5], [0, focal, (H - 1) * 0.5], [0, 0, 1]], np.float32)

    objs = view_poses = ins_map = None
    if cfg.mani_demo:
        with open(os.path.join(basedir, "objs_info.json")) as f:
            objs_info = json.load(f)
        objs, view_id, ins_map = objs_info["objects"], objs_info["view_id"], objs_info["ins_map"]
        if view_id is not None:
            view_poses = np.repeat(poses[view_id][None], cfg.views, axis=0)
        else:
            view_poses = np.stack(
                [pose_spherical(a, -65.0, 7.0) for a in np.linspace(-180, 180, cfg.views)], 0
            )

    return SceneData(
        images=images, poses=poses, H=int(H), W=int(W), K=K,
        i_train=i_train, i_test=i_test, gt_labels=gt_labels,
        ins_rgbs=ins_rgbs, ins_num=len(ins_rgbs),
        objs=objs, view_poses=view_poses, ins_map=ins_map,
    )
