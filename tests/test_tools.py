"""Tests for tools: meshing (marching tetrahedra, clean, PLY round trip, OBB),
visualizer LUTs, pose generation, image metrics (SSIM vs analytic cases)."""

import json
import os

import numpy as np
import pytest

from dmnerf_tpu.configs import Config
from dmnerf_tpu.tools.meshing import (
    clean_mesh,
    marching_tetrahedra,
    oriented_bounds_pca,
    read_ply,
    vertex_normals,
    write_ply,
)
from dmnerf_tpu.tools.pose_gen import generate_poses_demo, generate_poses_eval, r_x, r_y, r_z
from dmnerf_tpu.tools.visualizer import render_gt_label2img, render_label2img
from dmnerf_tpu.utils.image_metrics import psnr_np, ssim_np


def _sphere_volume(dim=32, radius=0.6):
    t = np.linspace(-1, 1, dim)
    x, y, z = np.meshgrid(t, t, t, indexing="ij")
    return radius - np.sqrt(x * x + y * y + z * z)  # >0 inside


def test_marching_tetrahedra_sphere():
    dim = 32
    vol = _sphere_volume(dim)
    verts, faces = marching_tetrahedra(vol, 0.0)
    assert len(verts) > 100 and len(faces) > 100
    # vertices lie near the radius-0.6 sphere (in index coords)
    p = verts / (dim - 1) * 2 - 1
    r = np.linalg.norm(p, axis=-1)
    assert np.abs(r - 0.6).max() < 0.15
    assert np.abs(r - 0.6).mean() < 0.04
    # faces index valid vertices
    assert faces.max() < len(verts)
    # normals point outward (ascent = toward increasing field = inward for this field?
    # field increases toward center, so ascent normals point inward)
    n = vertex_normals(verts, faces)
    inward = np.sum(n * (-p / np.maximum(r[:, None], 1e-9)), -1)
    assert (inward > 0).mean() > 0.9


def test_clean_mesh_removes_small_component():
    # two tetrahedra far apart; one gets filtered
    verts = np.array([
        [0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],        # big-ish component
        [10, 10, 10], [11, 10, 10], [10, 11, 10],          # single triangle
    ], float)
    faces = np.array([
        [0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3],
        [4, 5, 6],
    ])
    v2, f2, kept = clean_mesh(verts, faces, min_num_cluster=2)
    assert len(f2) == 4
    assert len(v2) == 4
    assert (v2 < 5).all()


def test_ply_roundtrip(tmp_path):
    verts = np.random.RandomState(0).rand(10, 3).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]])
    colors = (np.random.RandomState(1).rand(10, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "m.ply")
    write_ply(path, verts, faces, colors=colors)
    v2, f2 = read_ply(path)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)


def test_oriented_bounds_pca():
    rng = np.random.RandomState(0)
    # anisotropic box rotated
    pts = rng.uniform(-1, 1, (5000, 3)) * np.array([4.0, 1.0, 0.5])
    theta = 0.7
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]])
    pts = pts @ R.T + np.array([5.0, -2.0, 1.0])
    to_origin, extents = oriented_bounds_pca(pts)
    # transform maps points into an origin-centered box of the returned extents
    local = pts @ to_origin[:3, :3].T + to_origin[:3, 3]
    assert np.abs(local.mean(0)).max() < 0.2
    np.testing.assert_allclose(np.sort(extents), np.sort([8.0, 2.0, 1.0]), rtol=0.05)


def test_rotation_helpers_match_reference_convention():
    # r_z(90deg) maps +x to +y (reference helpers.py:15-20)
    v = np.array([1.0, 0, 0, 1.0])
    out = r_z(np.pi / 2) @ v
    np.testing.assert_allclose(out[:3], [0, 1, 0], atol=1e-12)
    out = r_x(np.pi / 2) @ np.array([0, 1.0, 0, 1.0])
    np.testing.assert_allclose(out[:3], [0, 0, 1], atol=1e-12)
    out = r_y(np.pi / 2) @ np.array([0, 0, 1.0, 1.0])
    np.testing.assert_allclose(out[:3], [1, 0, 0], atol=1e-12)


def test_generate_poses_eval_translation(tmp_path):
    cfg = Config(expname="study", datadir=str(tmp_path), mani_mode="translation")
    out = generate_poses_eval(cfg)
    assert os.path.exists(tmp_path / "transformation_matrix.json")
    t = np.asarray(out["transformations"][0]["transformation"])
    # center-relative pure translation: rotation block is identity, y shift -0.25
    np.testing.assert_allclose(t[:3, :3], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(t[:3, 3], [0, -0.25, 0], atol=1e-12)


def test_generate_poses_demo_rotation_series(tmp_path):
    cfg = Config(datadir=str(tmp_path), views=8)
    objs = [{"obj_name": "a", "obj_center": [1.0, 0, 0], "mani_mode": "rotation"},
            {"obj_name": "d", "obj_center": [0, 0, 0], "mani_mode": "deform"}]
    out = generate_poses_demo(objs, cfg)
    assert "a" in out and "d" not in out
    assert len(out["a"]) == 8
    # frame 0 is identity (0 degrees)
    np.testing.assert_allclose(np.asarray(out["a"][0]["transformation"]), np.eye(4), atol=1e-8)


def test_visualizer_luts():
    ins_rgbs = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    labels = np.array([[0, 1], [2, 1]])
    color_dict = {"0": 0, "1": 1, "2": 2}
    img = render_gt_label2img(labels, ins_rgbs, color_dict)
    np.testing.assert_array_equal(img[0, 0], [255, 0, 0])
    np.testing.assert_array_equal(img[1, 0], [0, 0, 255])
    # pred->gt remapping: pred label 5 maps to gt 2
    pred = np.array([[5, 5], [1, 1]])
    img2 = render_label2img(pred, ins_rgbs, color_dict, {"5": 2, "1": 1})
    np.testing.assert_array_equal(img2[0, 0], [0, 0, 255])
    np.testing.assert_array_equal(img2[1, 1], [0, 255, 0])


def test_ssim_analytic_cases():
    rng = np.random.RandomState(0)
    img = rng.rand(32, 32, 3).astype(np.float64)
    assert ssim_np(img, img) == pytest.approx(1.0)
    noisy = np.clip(img + rng.randn(32, 32, 3) * 0.2, 0, 1)
    s = ssim_np(img, noisy)
    assert 0.0 < s < 0.9
    assert psnr_np(img, img) == float("inf")
    assert psnr_np(np.zeros((4, 4)), np.ones((4, 4))) == pytest.approx(0.0)
