"""Manipulation pose generation: writes transformation_matrix.json.

Behavioral parity with /root/reference/tools/pose_generator.py:9-188:
 * generate_poses_eval: per-scene hardcoded object centers; center-relative
   translation (-0.25 y) / rotation (90° yaw) / scale (1.2) / multi (scale@rot@trans)
   4x4s as T_inv @ M @ T; one entry per mode in a {'transformations': [...]} dict.
 * generate_poses_demo: per-object animated series over `views` frames — translation
   accumulates oper_dist/views per frame; rotation sweeps yaw over linspace(0,180,views);
   scale/multi emit single entries; deform objects are skipped (handled at render
   time by ray warps).
Rotation conventions r_x/r_y/r_z match /root/reference/networks/helpers.py:6-20.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from dmnerf_tpu.configs import Config

# per-scene manipulation centers (reference pose_generator.py:10-13)
MANI_CENTERS = {
    "bathroom": [0.779178, 1.05247, 0.380208],
    "bedroom": [-1.29552, 1.72703, 0.2946],
    "dinning": [-0.633653, 0.295162, 0.279743],
    "kitchen": [-2.52579, -0.103821, 1.47165],
    "reception": [0.579352, -0.099242, 0.092597],
    "restroom": [-0.001277, -2.85079, 0.588084],
    "office": [-0.717374, 0.929292, 0.904515],
    "study": [-0.519422, -2.16509, 1.07392],
}


def r_x(roll):
    c, s = np.cos(roll), np.sin(roll)
    return np.array([[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]])


def r_y(pitch):
    c, s = np.cos(pitch), np.sin(pitch)
    return np.array([[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]])


def r_z(yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]])


def _center_frames(center: np.ndarray):
    t = np.eye(4, dtype=np.float32)
    t[:3, -1] = -np.asarray(center)
    t_inv = np.eye(4, dtype=np.float32)
    t_inv[:3, -1] = np.asarray(center)
    return t, t_inv


def _mode_matrix(mode: str) -> np.ndarray:
    if mode == "translation":
        m = np.eye(4)
        m[1, 3] = -0.25
    elif mode == "rotation":
        m = r_z(90 * np.pi / 180) @ r_y(0.0) @ r_x(0.0)
    elif mode == "scale":
        m = np.diag([1.2, 1.2, 1.2, 1.0])
    elif mode == "multi":
        s = np.diag([1.2, 1.2, 1.2, 1.0])
        r = r_z(90 * np.pi / 180)
        t = np.eye(4)
        t[1, 3] = -0.25
        m = (s @ r) @ t
    else:
        raise ValueError(f"unknown mani_mode {mode!r}")
    return m


def generate_poses_eval(cfg: Config, center: Optional[List[float]] = None) -> Dict:
    """Writes {datadir}/transformation_matrix.json for the configured mani_mode."""
    if center is None:
        center = MANI_CENTERS.get(cfg.expname, [0.0, 0.0, 0.0])
    t, t_inv = _center_frames(np.asarray(center))
    tar = t_inv @ _mode_matrix(cfg.mani_mode) @ t
    out = {"transformations": [{"transformation": tar.tolist(), "mode": cfg.mani_mode}]}
    with open(os.path.join(cfg.datadir, "transformation_matrix.json"), "w") as f:
        json.dump(out, f, ensure_ascii=False, indent=2)
    return out


def generate_poses_demo(objs: List[Dict], cfg: Config) -> Dict:
    """Writes per-object animated transform series (reference pose_generator.py:87-188)."""
    views = cfg.views
    outputs = {}
    for obj in objs:
        mode = obj["mani_mode"]
        if mode == "deform":
            continue
        t, t_inv = _center_frames(np.asarray(obj["obj_center"]))
        poses_list = []
        if mode == "translation":
            for oper_dist in obj["distance"]:
                step = np.eye(4)
                step[0, 3] = oper_dist / views
                m = np.eye(4)
                for i in range(views):
                    if i > 0:
                        m = m @ step
                    tar = t_inv @ m @ t
                    poses_list.append({"transformation": tar.tolist(), "mode": mode})
        elif mode == "rotation":
            for deg in np.linspace(0, 180, views):
                r = r_z(deg * np.pi / 180) @ r_y(0.0) @ r_x(0.0)
                tar = t_inv @ r @ t
                poses_list.append({"transformation": tar.tolist(), "mode": mode})
        else:  # scale / multi: single entry
            tar = t_inv @ _mode_matrix(mode) @ t
            poses_list.append({"transformation": tar.tolist(), "mode": mode})
        outputs[obj["obj_name"]] = poses_list

    with open(os.path.join(cfg.datadir, "transformation_matrix.json"), "w") as f:
        json.dump(outputs, f, ensure_ascii=False, indent=2)
    return outputs
