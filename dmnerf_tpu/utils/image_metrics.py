"""Image quality metrics: PSNR, SSIM, LPIPS — host-side, dependency-light.

The reference uses skimage.metrics (PSNR/SSIM) and the lpips pip package with
pretrained VGG weights (/root/reference/networks/tester.py:91-98). Neither skimage nor
lpips is available in this environment, so both are implemented natively:

 * ssim_np reproduces skimage.metrics.structural_similarity defaults for float inputs
   (win_size=7 uniform filter, K1=0.01, K2=0.03, sample covariance normalization
   N/(N-1), channel-averaged, border-cropped mean) with data_range as given.
 * lpips_np implements the LPIPS-VGG16 distance (unit-normalized conv features at
   relu{1_2,2_2,3_3,4_3,5_3}, learned 1x1 weights, spatial mean, layer sum) as a JAX
   forward pass. Pretrained VGG+linear weights cannot be downloaded here (zero
   egress); supply them as an .npz via $DMNERF_LPIPS_WEIGHTS (see
   tools/export_lpips_weights.py for the converter). Without weights the function
   returns NaN and eval reports LPIPS as NaN rather than failing.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def to8b(x: np.ndarray) -> np.ndarray:
    """Reference to8b (evaluator.py:12)."""
    return (255 * np.clip(x, 0, 1)).astype(np.uint8)


def psnr_np(img: np.ndarray, gt: np.ndarray, data_range: float = 1.0) -> float:
    mse = float(np.mean((img.astype(np.float64) - gt.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def _ssim_single(x: np.ndarray, y: np.ndarray, data_range: float, win_size: int) -> float:
    from scipy.ndimage import uniform_filter

    x = x.astype(np.float64)
    y = y.astype(np.float64)
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    NP = win_size ** x.ndim
    cov_norm = NP / (NP - 1)  # sample covariance, skimage default

    filt = lambda a: uniform_filter(a, size=win_size)
    ux, uy = filt(x), filt(y)
    uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / ((ux ** 2 + uy ** 2 + C1) * (vx + vy + C2))
    pad = (win_size - 1) // 2
    return float(S[pad:-pad or None, pad:-pad or None].mean())


def ssim_np(img: np.ndarray, gt: np.ndarray, data_range: float = 1.0, win_size: int = 7) -> float:
    """Channel-averaged SSIM (skimage multichannel=True semantics)."""
    if img.ndim == 3:
        return float(np.mean([_ssim_single(img[..., c], gt[..., c], data_range, win_size)
                              for c in range(img.shape[-1])]))
    return _ssim_single(img, gt, data_range, win_size)


# ---------------------------------------------------------------------------
# LPIPS (VGG16)

_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
_TAP_LAYERS = (1, 3, 6, 9, 12)   # conv indices (0-based) of relu1_2..relu5_3
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_lpips_cache = {}
_lpips_warned = [False]


def _load_lpips_weights() -> Optional[dict]:
    path = os.environ.get("DMNERF_LPIPS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        return None
    if path not in _lpips_cache:
        _lpips_cache[path] = dict(np.load(path))
    return _lpips_cache[path]


def lpips_available() -> bool:
    """True when the pretrained LPIPS-VGG weights npz is reachable."""
    return _load_lpips_weights() is not None


def lpips_np(img: np.ndarray, gt: np.ndarray) -> float:
    """LPIPS-VGG distance between two [H, W, 3] float images in [0, 1].
    Returns NaN when pretrained weights are unavailable (documented gate); the
    degraded mode is announced ONCE per process, loudly, instead of silently
    emitting NaN columns (reference reports real LPIPS, tester.py:91-98)."""
    weights = _load_lpips_weights()
    if weights is None:
        if not _lpips_warned[0]:
            _lpips_warned[0] = True
            import sys

            print(
                "[metrics] LPIPS: weights absent — reporting NaN. Export them on a "
                "weights-capable host with `python -m dmnerf_tpu.tools.export_lpips_weights "
                "lpips_vgg.npz` and set $DMNERF_LPIPS_WEIGHTS (see docs/LPIPS.md).",
                file=sys.stderr, flush=True,
            )
        return float("nan")

    import jax
    import jax.numpy as jnp

    def features(x):
        # Scaling layer only — NO [0,1]->[-1,1] remap: the reference calls
        # lpips_vgg(rgb, gt) on [0,1] images without normalize=True
        # (/root/reference/networks/tester.py:93), so the published metric is
        # LPIPS-with-[0,1]-inputs. We reproduce that behavior for metric parity.
        x = (x - _SHIFT) / _SCALE
        taps = []
        conv_i = 0
        h = x[None]  # NHWC
        for c in _VGG_CFG:
            if c == "M":
                h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
                continue
            w = jnp.asarray(weights[f"conv{conv_i}_w"])   # [kh, kw, cin, cout]
            b = jnp.asarray(weights[f"conv{conv_i}_b"])
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) + b
            h = jax.nn.relu(h)
            if conv_i in _TAP_LAYERS:
                taps.append(h)
            conv_i += 1
        return taps

    fa = features(jnp.asarray(img, jnp.float32))
    fb = features(jnp.asarray(gt, jnp.float32))
    total = 0.0
    for li, (a, b) in enumerate(zip(fa, fb)):
        a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
        b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        lin = jnp.asarray(weights[f"lin{li}_w"]).reshape(1, 1, 1, -1)  # [cout]
        total = total + float(jnp.mean(jnp.sum(d * lin, axis=-1)))
    return float(total)
