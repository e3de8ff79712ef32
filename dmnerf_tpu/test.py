"""Unified evaluation driver: decomposition render / manipulation eval / manipulation
demo / mesh extraction, dispatched on config flags.

Replaces the reference's three test scripts (test_dmsr.py / test_replica.py /
test_scannet.py, SURVEY.md C28) with one driver. The reference hardcodes the eval
checkpoint iteration per dataset (200000/300000/250000 .tar, test_dmsr.py:97); here the
latest checkpoint is used unless ft_path / an explicit step is given.

Usage:  python -m dmnerf_tpu.test --config configs/test/dmsr/study.txt [key=value ...]
"""

from __future__ import annotations

import json
import os
import sys

import jax
import numpy as np

from dmnerf_tpu.configs import Config
from dmnerf_tpu.data.scene import load_scene
from dmnerf_tpu.render.evaluation import render_test
from dmnerf_tpu.render.trainstep import create_train_state
from dmnerf_tpu.train import parse_cli
from dmnerf_tpu.utils.checkpoint import latest_step, restore_checkpoint


def load_color_dict(cfg: Config):
    """data/color_dict.json keyed [dataset][scene] (reference tester.py:48-50);
    falls back to a per-scene color_dict.json, then identity."""
    parts = os.path.normpath(cfg.datadir).split(os.sep)
    scene_name = parts[-1] if parts else cfg.expname
    dataset_name = parts[-2] if len(parts) > 1 else cfg.dataset_type
    for candidate in (
        os.path.join(os.path.dirname(os.path.dirname(cfg.datadir)), "color_dict.json"),
        "./data/color_dict.json",
    ):
        if os.path.exists(candidate):
            with open(candidate) as f:
                d = json.load(f)
            if dataset_name in d and scene_name in d[dataset_name]:
                return d[dataset_name][scene_name]
    local = os.path.join(cfg.datadir, "color_dict.json")
    if os.path.exists(local):
        with open(local) as f:
            return json.load(f)
    return {str(i): i for i in range(cfg.ins_num)}


def load_params(cfg: Config):
    state = create_train_state(cfg, jax.random.PRNGKey(cfg.seed))
    step = None
    if cfg.ft_path:
        # ft_path: evaluate the EXACT checkpoint the path names (same semantics
        # as the train driver's fine-tune load); loud error if it names nothing
        from dmnerf_tpu.utils.checkpoint import restore_from_path

        state = restore_from_path(cfg.ft_path, state)
        step = int(state.step)
        print(f"[test] loaded checkpoint step {step} from ft_path {cfg.ft_path}")
    elif not cfg.no_reload:
        restored = restore_checkpoint(cfg.log_dir, state)
        if restored is not None:
            state = restored
            step = int(state.step)
            print(f"[test] loaded checkpoint step {step} from {cfg.log_dir}")
        else:
            print(f"[test] WARNING: no checkpoint under {cfg.log_dir}; using init params")
    return state, step or 0


def run_test(cfg: Config) -> None:
    from dmnerf_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    if cfg.mani_eval:
        from dmnerf_tpu.data.dmsr_mani import load_dmsr_mani

        scene = load_dmsr_mani(cfg)
    else:
        scene = load_scene(cfg)
    cfg = cfg.replace(ins_num=scene.ins_num, perturb=0.0)
    state, iteration = load_params(cfg)
    color_dict = load_color_dict(cfg)

    if cfg.render:
        savedir = os.path.join(cfg.log_dir, f"render_{'test' if cfg.render_test else 'path'}_{iteration:06d}")
        os.makedirs(savedir, exist_ok=True)
        ids = scene.i_test
        render_test(
            cfg, state.params_coarse, state.params_fine,
            scene.poses[ids], scene.hwk,
            gt_imgs=scene.images[ids], gt_labels=scene.gt_labels[ids],
            ins_rgbs=scene.ins_rgbs, savedir=savedir,
            crop_mask=scene.crop_mask, color_dict=color_dict,
        )
        print("Rendering Done", savedir)

    elif cfg.mani_eval:
        from dmnerf_tpu.data.dmsr_mani import load_mani_poses
        from dmnerf_tpu.render.mani_eval import manipulator_eval
        from dmnerf_tpu.tools.pose_gen import generate_poses_eval

        generate_poses_eval(cfg)
        trans_dicts = load_mani_poses(cfg.datadir)
        savedir = os.path.join(cfg.log_dir, f"mani_eval_{iteration:06d}")
        os.makedirs(savedir, exist_ok=True)
        manipulator_eval(
            cfg, state.params_coarse, state.params_fine, scene.poses, scene.hwk,
            trans_dicts=trans_dicts, save_dir=savedir, ins_rgbs=scene.ins_rgbs,
            gt_rgbs=scene.images, gt_labels=scene.gt_labels, color_dict=color_dict,
        )
        print("Manipulating Done", savedir)

    elif cfg.mani_demo:
        from dmnerf_tpu.data.dmsr_mani import load_obj_poses
        from dmnerf_tpu.render.mani_eval import manipulator_demo
        from dmnerf_tpu.tools.pose_gen import generate_poses_demo

        generate_poses_demo(scene.objs, cfg)
        objs_trans = load_obj_poses(cfg.datadir)
        savedir = os.path.join(cfg.log_dir, f"mani_demo_{iteration:06d}")
        os.makedirs(savedir, exist_ok=True)
        manipulator_demo(
            cfg, state.params_coarse, state.params_fine, scene.hwk,
            objs_trans=objs_trans, save_dir=savedir, ins_rgbs=scene.ins_rgbs,
            objs=scene.objs, view_poses=scene.view_poses, ins_map=scene.ins_map,
            color_dict=color_dict,
        )
        print("Manipulating Done", savedir)

    elif cfg.mesh:
        from dmnerf_tpu.tools.mesh_extract import mesh_main

        savedir = os.path.join(cfg.log_dir, f"mesh_{iteration:06d}")
        os.makedirs(savedir, exist_ok=True)
        mesh_main(cfg, state.params_coarse, state.params_fine, scene.ins_rgbs,
                  savedir, ins_map=scene.ins_map, color_dict=color_dict,
                  grid_dim=cfg.mesh_grid_dim, level=cfg.mesh_level)
        print("Meshing Done", savedir)
    else:
        print("no eval mode selected (render / mani_eval / mani_demo / mesh)")


def main(argv=None):
    cfg = parse_cli(sys.argv[1:] if argv is None else argv)
    run_test(cfg)


if __name__ == "__main__":
    main()
