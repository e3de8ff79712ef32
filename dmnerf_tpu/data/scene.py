"""Unified in-memory scene container returned by every loader.

The reference returns a per-dataset tuple soup (loader_dmsr.py:149-175 returns 10
items, loader_replica.py 7 or 8, loader_scannet.py 9) — here one dataclass carries the
superset, and dataset selection is a config field instead of separate train scripts.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import numpy as np

from dmnerf_tpu.configs import Config


@dataclasses.dataclass
class SceneData:
    images: np.ndarray            # [M, H, W, 3] float32 in [0, 1]
    poses: np.ndarray             # [M, 4, 4] c2w
    H: int
    W: int
    K: np.ndarray                 # [3, 3] intrinsics (dataset-specific conventions)
    i_train: np.ndarray
    i_test: np.ndarray
    gt_labels: np.ndarray         # [M, H, W] int instance labels
    ins_rgbs: np.ndarray          # [ins_num, 3] palette
    ins_num: int
    # manipulation-demo extras (DM-SR objs_info.json / Replica editor path)
    objs: Optional[List[Dict[str, Any]]] = None
    view_poses: Optional[np.ndarray] = None
    ins_map: Optional[Dict[str, int]] = None
    # ScanNet extras
    ins_indices: Optional[List[np.ndarray]] = None   # labeled pixel ids per train image
    crop_mask: Optional[np.ndarray] = None           # [H, W] int 0/1

    @property
    def hwk(self):
        return self.H, self.W, self.K


def load_scene(cfg: Config) -> SceneData:
    if cfg.dataset_type == "dmsr":
        from dmnerf_tpu.data.dmsr import load_dmsr

        return load_dmsr(cfg)
    if cfg.dataset_type == "replica":
        from dmnerf_tpu.data.replica import load_replica

        return load_replica(cfg)
    if cfg.dataset_type == "scannet":
        from dmnerf_tpu.data.scannet import load_scannet

        return load_scannet(cfg)
    raise ValueError(f"unknown dataset_type {cfg.dataset_type!r}")
