"""Tests: synthetic scene <-> DM-SR loader round trip, samplers, train step
convergence smoke, and sharded-vs-single-device equivalence on a virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmnerf_tpu.configs import Config
from dmnerf_tpu.data.dmsr import load_dmsr
from dmnerf_tpu.data.samplers import make_crop_sampler, make_full_sampler
from dmnerf_tpu.data.synthetic import write_dmsr_scene
from dmnerf_tpu.render.trainstep import Batch, create_train_state, lr_at_step, make_train_step


def tiny_config(**kw) -> Config:
    base = dict(
        netdepth=2, netwidth=32, multires=4, multires_views=2, skips=(0,),
        N_samples=8, N_importance=8, N_train=64, N_test=128,
        near=2.0, far=7.0, ins_num=8, lrate=5e-3, lrate_decay=500,
        perturb=1.0, penalize=True, tolerance=0.05, deta_w=0.05,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="session")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dmsr") / "study"
    write_dmsr_scene(str(d), n_train=6, n_test=3, H=32, W=32, n_objects=3, ins_num=8)
    return str(d)


@pytest.fixture(scope="session")
def scene(scene_dir):
    cfg = tiny_config(datadir=scene_dir, testskip=1, views=4)
    return load_dmsr(cfg)


def test_dmsr_loader_roundtrip(scene):
    assert scene.images.shape == (9, 32, 32, 3)
    assert scene.gt_labels.shape == (9, 32, 32)
    assert scene.images.dtype == np.float32
    assert scene.images.max() <= 1.0
    assert len(scene.i_train) == 6 and len(scene.i_test) == 3
    assert scene.ins_num == 8
    # blender K convention: negative fy, fz=-1 (loader_dmsr.py:172)
    assert scene.K[1, 1] < 0 and scene.K[2, 2] == -1
    assert scene.view_poses.shape == (4, 4, 4)
    assert set(np.unique(scene.gt_labels)) <= set(range(4))


def test_full_sampler_gathers_consistently(scene):
    sample = make_full_sampler(
        scene.images, scene.gt_labels, scene.poses, scene.K, scene.i_train, 32
    )
    b = sample(jax.random.PRNGKey(0))
    assert b.rays_o.shape == (32, 3) and b.rays_d.shape == (32, 3)
    assert b.target_c.shape == (32, 3) and b.target_i.shape == (32,)
    # rays through pixel centers reproduce the image colors under the scene geometry:
    # weaker invariant — targets must be actual pixels of ONE image
    tc = np.asarray(b.target_c)
    imgs = scene.images.reshape(-1, 3)
    for px in tc:
        assert (np.abs(imgs - px).sum(-1) < 1e-6).any()


def test_crop_sampler_labeled_suffix(scene):
    H = W = 32
    crop_mask = np.zeros((H, W), np.int8)
    crop_mask[4:28, 4:28] = 1
    # fabricate labeled-pixel indices: pixels with nonzero label inside the crop
    ins_indices = []
    for i in scene.i_train:
        lab = scene.gt_labels[i].reshape(-1)
        ok = (lab > 0) & (crop_mask.reshape(-1) == 1)
        ins_indices.append(np.where(ok)[0])
    sample, n_ins = make_crop_sampler(
        scene.images, scene.gt_labels, scene.poses, scene.K, scene.i_train,
        40, ins_indices, crop_mask,
    )
    assert n_ins == 12
    b = sample(jax.random.PRNGKey(1))
    # the labeled suffix must consist of labeled pixels
    suffix = np.asarray(b.target_i)[-n_ins:]
    assert (suffix > 0).all()


def test_lr_schedule_matches_reference_formula():
    cfg = tiny_config(lrate=5e-4, lrate_decay=500)
    assert float(lr_at_step(cfg, 0)) == pytest.approx(5e-4)
    assert float(lr_at_step(cfg, 250_000)) == pytest.approx(5e-4 * 0.1 ** 0.5, rel=1e-5)


def _make_batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    n = cfg.N_train
    rays_o = np.zeros((n, 3), np.float32)
    d = rng.randn(n, 3).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    target_c = rng.rand(n, 3).astype(np.float32)
    target_i = rng.randint(0, 4, size=n)
    return Batch(jnp.asarray(rays_o), jnp.asarray(d), jnp.asarray(target_c), jnp.asarray(target_i))


def test_train_step_decreases_loss():
    cfg = tiny_config()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg)
    batch = _make_batch(cfg)
    key = jax.random.PRNGKey(42)
    losses = []
    for i in range(60):
        key, sub = jax.random.split(key)
        state, aux = step(state, batch, sub)
        losses.append(float(aux["total_loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.8
    assert int(state.step) == 60


def test_sharded_step_matches_single_device():
    from dmnerf_tpu.parallel.mesh import make_mesh, make_sharded_train_step, shard_batch

    cpu_devices = jax.devices("cpu")
    assert len(cpu_devices) >= 8, "conftest must force 8 host devices"
    cfg = tiny_config(perturb=0.0)  # deterministic sampling for exact comparison
    batch = _make_batch(cfg)
    key = jax.random.PRNGKey(7)

    state1 = create_train_state(cfg, jax.random.PRNGKey(0))
    step1 = make_train_step(cfg)
    out1, aux1 = step1(state1, batch, key)

    mesh = make_mesh(devices=cpu_devices[:8])
    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        state8 = create_train_state(cfg, jax.random.PRNGKey(0))
        step8 = make_sharded_train_step(cfg, mesh)
        out8, aux8 = step8(state8, shard_batch(mesh, batch), key)

    np.testing.assert_allclose(float(aux1["total_loss"]), float(aux8["total_loss"]), rtol=1e-4)
    for k in out1.params_fine:
        np.testing.assert_allclose(
            np.asarray(out1.params_fine[k]), np.asarray(out8.params_fine[k]),
            rtol=2e-4, atol=2e-6,
        )


def test_penalize_requires_positive_gaussian_width():
    """over_penalize with unset tolerance/deta_w must fail loudly at config time:
    a zero-width Gaussian makes the penalizer emit exp(-0/0)=NaN the moment a
    z-sample lands exactly at the rendered depth (observed killing the instance
    head at iter 56 on the synthetic scene). The reference ships default=None and
    would TypeError (reference config.py:110-112)."""
    from dmnerf_tpu.configs import parse_config_text

    with pytest.raises(ValueError, match="deta_w"):
        Config(penalize=True)
    with pytest.raises(ValueError, match="deta_w"):
        parse_config_text("over_penalize")
    # setting both on the same parse is fine
    cfg = parse_config_text("over_penalize\ntolerance = 0.05\ndeta_w = 0.05")
    assert cfg.penalize and cfg.deta_w == 0.05
