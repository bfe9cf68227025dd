"""ctypes binding for the native permutohedral lattice (native/).

Exact high-dimensional Gaussian filtering + exact dense-CRF mean field on
the host — the native counterpart of the reference's pydensecrf C++
dependency (`awesome/run/crf.py:4`). Used to validate the on-device
bilateral-grid CRF and for exact host-side post-processing.

The shared library is built on demand with ``make -C native`` (g++).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)


def _load() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.join(_NATIVE_DIR, "libpermutohedral.so")
    if not os.path.exists(so):
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
    lib = ctypes.CDLL(so)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.ph_filter.argtypes = [fp, ctypes.c_int, ctypes.c_int, fp,
                              ctypes.c_int, fp]
    lib.ph_filter.restype = None
    lib.ph_dense_crf.argtypes = [
        fp, ctypes.c_int, ctypes.c_int, fp, ctypes.c_float, fp,
        ctypes.c_float, ctypes.c_int, fp,
    ]
    lib.ph_dense_crf.restype = None
    _LIB = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _as_f32(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


def ph_filter(features: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Gaussian-filter ``values`` (N, Vd) over ``features`` (N, Fd)
    pre-scaled by 1/sigma; kernel exp(-|fi-fj|^2 / 2)."""
    lib = _load()
    features = _as_f32(features)
    values = _as_f32(values)
    n, fd = features.shape
    vd = values.shape[1]
    out = np.zeros_like(values)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.ph_filter(
        features.ctypes.data_as(fp), n, fd,
        values.ctypes.data_as(fp), vd,
        out.ctypes.data_as(fp),
    )
    return out


def dense_crf_exact(
    img: np.ndarray,
    probs: np.ndarray,
    gaussian_sdims: Tuple[float, float] = (3.0, 3.0),
    gaussian_compat: float = 3.0,
    bilateral_sdims: Tuple[float, float] = (50.0, 50.0),
    bilateral_schan: Tuple[float, float, float] = (10.0, 10.0, 10.0),
    bilateral_compat: float = 5.0,
    iterations: int = 15,
) -> np.ndarray:
    """Exact mean-field dense CRF. img (H, W, 3) float [0,1] or uint8;
    probs (H, W, C). Returns (H, W, C)."""
    lib = _load()
    h, w, c = probs.shape
    n = h * w
    if img.dtype != np.uint8:
        img255 = (np.clip(img, 0, 1) * 255.0).astype(np.float32)
    else:
        img255 = img.astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    gauss = np.stack(
        [yy / gaussian_sdims[0], xx / gaussian_sdims[1]], axis=-1
    ).reshape(n, 2)
    bilat = np.concatenate(
        [
            (yy / bilateral_sdims[0])[..., None],
            (xx / bilateral_sdims[1])[..., None],
            img255 / np.asarray(bilateral_schan, np.float32),
        ],
        axis=-1,
    ).reshape(n, 5)
    probs_f = _as_f32(probs).reshape(n, c)
    gauss = _as_f32(gauss)
    bilat = _as_f32(bilat)
    out = np.zeros_like(probs_f)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.ph_dense_crf(
        probs_f.ctypes.data_as(fp), n, c,
        gauss.ctypes.data_as(fp), gaussian_compat,
        bilat.ctypes.data_as(fp), bilateral_compat,
        iterations,
        out.ctypes.data_as(fp),
    )
    return out.reshape(h, w, c)
