"""ImageNet-C style image corruptions for robustness experiments.

Behavior port of `awesome/util/corruptions.py:123-368` (which wraps
cv2/wand); reimplemented in numpy/scipy/PIL. Severity 1-5 parameter tables
follow the ImageNet-C convention. Input: (H, W, 3) float [0, 1]; output
same, clipped.
"""
from __future__ import annotations

from typing import Callable, Dict

import numpy as np


def _rng(seed):
    return np.random.default_rng(seed)


def gaussian_noise(x, severity=1, seed=0):
    c = [0.08, 0.12, 0.18, 0.26, 0.38][severity - 1]
    return np.clip(x + _rng(seed).normal(size=x.shape) * c, 0, 1).astype(
        np.float32
    )


def shot_noise(x, severity=1, seed=0):
    c = [60, 25, 12, 5, 3][severity - 1]
    return np.clip(
        _rng(seed).poisson(x * c) / float(c), 0, 1
    ).astype(np.float32)


def impulse_noise(x, severity=1, seed=0):
    amount = [0.03, 0.06, 0.09, 0.17, 0.27][severity - 1]
    rng = _rng(seed)
    out = x.copy()
    mask = rng.random(x.shape[:2]) < amount
    salt = rng.random(x.shape[:2]) < 0.5
    out[mask & salt] = 1.0
    out[mask & ~salt] = 0.0
    return out.astype(np.float32)


def _gauss_blur(x, sigma):
    from scipy import ndimage

    return np.stack(
        [ndimage.gaussian_filter(x[..., c], sigma) for c in range(x.shape[-1])],
        axis=-1,
    )


def gaussian_blur(x, severity=1, seed=0):
    c = [1, 2, 3, 4, 6][severity - 1]
    return np.clip(_gauss_blur(x, c), 0, 1).astype(np.float32)


def defocus_blur(x, severity=1, seed=0):
    from scipy import ndimage

    radius = [3, 4, 6, 8, 10][severity - 1]
    yy, xx = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    kernel = ((yy**2 + xx**2) <= radius**2).astype(np.float64)
    kernel /= kernel.sum()
    out = np.stack(
        [ndimage.convolve(x[..., c], kernel, mode="reflect")
         for c in range(x.shape[-1])],
        axis=-1,
    )
    return np.clip(out, 0, 1).astype(np.float32)


def motion_blur(x, severity=1, seed=0):
    from scipy import ndimage

    length = [8, 12, 16, 20, 26][severity - 1]
    angle = _rng(seed).uniform(-np.pi / 4, np.pi / 4)
    kernel = np.zeros((length, length))
    c = length // 2
    for i in range(length):
        t = i - c
        y = int(round(c + t * np.sin(angle)))
        xk = int(round(c + t * np.cos(angle)))
        if 0 <= y < length and 0 <= xk < length:
            kernel[y, xk] = 1
    kernel /= kernel.sum()
    out = np.stack(
        [ndimage.convolve(x[..., ch], kernel, mode="reflect")
         for ch in range(x.shape[-1])],
        axis=-1,
    )
    return np.clip(out, 0, 1).astype(np.float32)


def brightness(x, severity=1, seed=0):
    c = [0.1, 0.2, 0.3, 0.4, 0.5][severity - 1]
    return np.clip(x + c, 0, 1).astype(np.float32)


def contrast(x, severity=1, seed=0):
    c = [0.4, 0.3, 0.2, 0.1, 0.05][severity - 1]
    means = x.mean(axis=(0, 1), keepdims=True)
    return np.clip((x - means) * c + means, 0, 1).astype(np.float32)


def saturate(x, severity=1, seed=0):
    c = [2.0, 3.0, 5.0, 10.0, 20.0][severity - 1]
    gray = x.mean(axis=-1, keepdims=True)
    return np.clip(gray + (x - gray) * c, 0, 1).astype(np.float32)


def pixelate(x, severity=1, seed=0):
    from PIL import Image

    c = [0.6, 0.5, 0.4, 0.3, 0.25][severity - 1]
    h, w = x.shape[:2]
    img = Image.fromarray((x * 255).astype(np.uint8))
    img = img.resize((max(int(w * c), 1), max(int(h * c), 1)), Image.BOX)
    img = img.resize((w, h), Image.NEAREST)
    return (np.asarray(img, np.float32) / 255.0).astype(np.float32)


def fog(x, severity=1, seed=0):
    c, decay = [(1.5, 2.0), (2.0, 2.0), (2.5, 1.7), (2.5, 1.5), (3.0, 1.4)][
        severity - 1
    ]
    h = x.shape[0]
    # diamond-square-ish plasma via filtered noise
    rng = _rng(seed)
    noise = rng.normal(size=x.shape[:2])
    from scipy import ndimage

    plasma = ndimage.gaussian_filter(noise, h / 8)
    plasma = (plasma - plasma.min()) / max(
        float(plasma.max() - plasma.min()), 1e-9
    )
    fog_layer = (c * plasma**decay)[..., None]
    mx = x.max()
    return np.clip((x + fog_layer) * mx / (mx + c), 0, 1).astype(np.float32)


def elastic_transform(x, severity=1, seed=0):
    from scipy import ndimage

    alpha, sigma = [(2, 0.7), (3, 0.7), (4, 0.6), (6, 0.6), (9, 0.6)][
        severity - 1
    ]
    h, w = x.shape[:2]
    rng = _rng(seed)
    dx = ndimage.gaussian_filter(rng.uniform(-1, 1, (h, w)), sigma * 8) * alpha
    dy = ndimage.gaussian_filter(rng.uniform(-1, 1, (h, w)), sigma * 8) * alpha
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    coords = np.stack([yy + dy, xx + dx])
    out = np.stack(
        [
            ndimage.map_coordinates(x[..., c], coords, order=1,
                                    mode="reflect")
            for c in range(x.shape[-1])
        ],
        axis=-1,
    )
    return np.clip(out, 0, 1).astype(np.float32)


CORRUPTIONS: Dict[str, Callable] = {
    "gaussian_noise": gaussian_noise,
    "shot_noise": shot_noise,
    "impulse_noise": impulse_noise,
    "gaussian_blur": gaussian_blur,
    "defocus_blur": defocus_blur,
    "motion_blur": motion_blur,
    "brightness": brightness,
    "contrast": contrast,
    "saturate": saturate,
    "pixelate": pixelate,
    "fog": fog,
    "elastic_transform": elastic_transform,
}


def corrupt(x: np.ndarray, name: str, severity: int = 1,
            seed: int = 0) -> np.ndarray:
    if name not in CORRUPTIONS:
        raise ValueError(
            f"Unknown corruption {name}; available: {sorted(CORRUPTIONS)}"
        )
    if not 1 <= severity <= 5:
        raise ValueError("severity must be in 1..5")
    return CORRUPTIONS[name](x, severity=severity, seed=seed)
