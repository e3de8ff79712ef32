"""LPIPS-VGG forward parity: the JAX implementation in utils.image_metrics vs a
from-scratch torch LPIPS built from the SAME .npz weight schema (VERDICT r1 item 5).

Pretrained weights cannot be downloaded here (zero egress), so the numerical path
is locked with random weights in the documented schema (see
dmnerf_tpu/tools/export_lpips_weights.py): any correctly exported artifact then
reproduces the reference's metric. The torch side mirrors the lpips package's
LPIPS(net='vgg') forward as the reference calls it — inputs in [0,1] WITHOUT
normalize=True (tester.py:93), so only the ScalingLayer is applied.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dmnerf_tpu.tools.export_lpips_weights import TAP_CH, VGG16_CONV_CH  # noqa: E402
from dmnerf_tpu.utils.image_metrics import _SCALE, _SHIFT, _TAP_LAYERS, _VGG_CFG, lpips_np  # noqa: E402


def _random_weights(seed=0):
    rng = np.random.RandomState(seed)
    out = {}
    c_in = 3
    for i, c_out in enumerate(VGG16_CONV_CH):
        out[f"conv{i}_w"] = (rng.randn(3, 3, c_in, c_out) * 0.2 / np.sqrt(c_in * 9)).astype(np.float32)
        out[f"conv{i}_b"] = (rng.randn(c_out) * 0.01).astype(np.float32)
        c_in = c_out
    for k, c in enumerate(TAP_CH):
        out[f"lin{k}_w"] = rng.rand(c).astype(np.float32)  # lpips lins are non-negative
    return out


def _torch_lpips(img, gt, weights):
    """Reference-faithful torch forward: ScalingLayer -> VGG16 features with taps
    at relu{1_2,2_2,3_3,4_3,5_3} -> unit-normalize -> squared diff -> 1x1 lin ->
    spatial mean -> sum over taps (lpips package semantics)."""
    import torch.nn.functional as F

    def features(x_np):
        x = torch.from_numpy(x_np.astype(np.float32)).permute(2, 0, 1)[None]  # NCHW
        shift = torch.from_numpy(np.asarray(_SHIFT)).view(1, 3, 1, 1)
        scale = torch.from_numpy(np.asarray(_SCALE)).view(1, 3, 1, 1)
        h = (x - shift) / scale
        taps, conv_i = [], 0
        for c in _VGG_CFG:
            if c == "M":
                h = F.max_pool2d(h, 2, 2)
                continue
            w = torch.from_numpy(np.transpose(weights[f"conv{conv_i}_w"], (3, 2, 0, 1)).copy())
            b = torch.from_numpy(weights[f"conv{conv_i}_b"])
            h = F.relu(F.conv2d(h, w, b, padding=1))
            if conv_i in _TAP_LAYERS:
                taps.append(h)
            conv_i += 1
        return taps

    fa, fb = features(img), features(gt)
    total = 0.0
    for k, (a, b) in enumerate(zip(fa, fb)):
        a = a / (a.norm(dim=1, keepdim=True) + 1e-10)
        b = b / (b.norm(dim=1, keepdim=True) + 1e-10)
        d = (a - b) ** 2
        lin = torch.from_numpy(weights[f"lin{k}_w"]).view(1, -1, 1, 1)
        total += float((d * lin).sum(dim=1).mean())
    return total


def test_lpips_forward_matches_torch(tmp_path, monkeypatch):
    weights = _random_weights()
    npz = tmp_path / "lpips_rand.npz"
    np.savez(npz, **weights)
    monkeypatch.setenv("DMNERF_LPIPS_WEIGHTS", str(npz))

    rng = np.random.RandomState(3)
    # odd spatial dims exercise the floor-mode pooling on both sides
    img = rng.rand(33, 37, 3).astype(np.float32)
    gt = np.clip(img + rng.randn(33, 37, 3).astype(np.float32) * 0.1, 0, 1)

    ours = lpips_np(img, gt)
    ref = _torch_lpips(img, gt, weights)
    assert np.isfinite(ours)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-6)
    # identical images -> 0
    assert lpips_np(img, img) == pytest.approx(0.0, abs=1e-7)


def test_lpips_nan_without_weights(monkeypatch):
    monkeypatch.delenv("DMNERF_LPIPS_WEIGHTS", raising=False)
    rng = np.random.RandomState(0)
    img = rng.rand(8, 8, 3).astype(np.float32)
    assert np.isnan(lpips_np(img, img))


def test_export_converter_schema_roundtrip():
    """convert_state_dicts maps torchvision/lpips state_dict layouts into the npz
    schema with the right shapes."""
    from dmnerf_tpu.tools.export_lpips_weights import convert_state_dicts

    rng = np.random.RandomState(1)
    conv_seq_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    vgg_sd = {}
    c_in = 3
    for i, si in enumerate(conv_seq_idx):
        c_out = VGG16_CONV_CH[i]
        vgg_sd[f"{si}.weight"] = rng.randn(c_out, c_in, 3, 3).astype(np.float32)
        vgg_sd[f"{si}.bias"] = rng.randn(c_out).astype(np.float32)
        c_in = c_out
    lp_sd = {f"lin{k}.model.1.weight": rng.rand(1, c, 1, 1).astype(np.float32)
             for k, c in enumerate(TAP_CH)}
    out = convert_state_dicts(vgg_sd, lp_sd)
    assert out["conv0_w"].shape == (3, 3, 3, 64)
    assert out["conv12_w"].shape == (3, 3, 512, 512)
    assert out["lin4_w"].shape == (512,)
    np.testing.assert_allclose(out["conv0_w"], np.transpose(vgg_sd["0.weight"], (2, 3, 1, 0)))
