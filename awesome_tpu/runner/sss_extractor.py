"""Semantic Soft Segmentation feature extraction front-end.

The reference shells out to third-party TF1 Soft-Semantic-Segmentation
code to precompute 128-d embedding maps per image
(`awesome/run/semantic_soft_segmentation_extractor.py:1-261`), then PCA's
them to 2 channels inside ImageSample. That external TF1 dependency is
environment-bound in the reference too; here the extractor is a thin
orchestration layer that

- consumes precomputed embedmaps (.npy/.npz) when present
  (``awesome_tpu.data.image_sample.load_semantic_features``),
- can invoke a user-supplied command per image (the reference's shell-out
  pattern) when one is configured,
- otherwise falls back to a self-contained proxy. The default proxy is
  **spectral matting**: eigenvectors of Levin's closed-form matting
  Laplacian (the exact non-semantic half of the Semantic Soft
  Segmentation pipeline — SSS fuses this Laplacian with a semantic
  affinity before the eigendecomposition; without the TF1 feature net we
  keep the Laplacian alone). Piecewise-smooth, edge-aligned soft
  segments, far closer in character to SSS embedmaps than the previous
  Gaussian-pyramid PCA (still available via ``proxy="pyramid"``).
  ``proxy="spectral_device"`` runs the Laplacian build and eigensolve
  on the accelerator instead of scipy
  (`awesome_tpu.ops.spectral.spectral_soft_segments_device`; a valid
  variant rather than bit-faithful — see its docstring).
"""
from __future__ import annotations

import os
import subprocess
from typing import List, Optional

import numpy as np


def matting_laplacian(image: np.ndarray, eps: float = 1e-7):
    """Levin's closed-form matting Laplacian as a sparse CSR matrix.

    ``image``: (H, W, 3) float in [0, 1]. For every 3x3 window w_k with
    color mean mu_k and covariance Sigma_k,

        L[i, j] += delta_ij - (1 + (I_i-mu_k)^T (Sigma_k + eps/9 I)^-1
                                   (I_j-mu_k)) / 9

    (A Closed-Form Solution to Natural Image Matting, Levin et al. 2008,
    eq. 12). This is the affinity the reference's SSS dependency builds
    its soft segments on (Aksoy et al. 2018 section 3 — there fused with
    a semantic affinity from the TF1 feature net before
    eigendecomposition).
    """
    from numpy.lib.stride_tricks import sliding_window_view
    from scipy import sparse

    h, w, c = image.shape
    if h < 3 or w < 3:
        raise ValueError("matting_laplacian needs at least a 3x3 image")
    n = h * w
    m = 9
    inds = np.arange(n).reshape(h, w)
    win_inds = sliding_window_view(inds, (3, 3)).reshape(-1, m)
    win_img = sliding_window_view(image, (3, 3), axis=(0, 1))
    # sliding_window_view with axis=(0,1) yields (h-2, w-2, 3, 3, 3) with
    # the channel axis in the middle; flatten windows to (nw, 9, 3)
    win_img = win_img.transpose(0, 1, 3, 4, 2).reshape(-1, m, c)
    mu = win_img.mean(axis=1, keepdims=True)                  # (nw, 1, 3)
    x = win_img - mu                                          # (nw, 9, 3)
    cov = np.einsum("nmc,nmd->ncd", x, x) / m                 # (nw, 3, 3)
    inv = np.linalg.inv(cov + (eps / m) * np.eye(c))
    vals = (1.0 + np.einsum("nic,ncd,njd->nij", x, inv, x)) / m
    vals = np.eye(m)[None] - vals                             # (nw, 9, 9)
    rows = np.repeat(win_inds, m, axis=1).ravel()
    cols = np.tile(win_inds, (1, m)).ravel()
    L = sparse.coo_matrix((vals.ravel(), (rows, cols)), shape=(n, n))
    return L.tocsr()


def spectral_soft_segments(
    image: np.ndarray,
    n_components: int = 2,
    max_side: int = 160,
    eps: float = 1e-7,
) -> np.ndarray:
    """Soft segments = smallest nontrivial matting-Laplacian eigenvectors.

    Computes L on a <=``max_side`` downscale of the image, takes the
    ``n_components`` eigenvectors after the (near-)constant nullspace
    vector, min-max normalizes each to [0, 1], and bilinearly upsamples
    back to (H, W, n_components). Deterministic (fixed Lanczos start
    vector). Replacement for the reference's SSS embedmap+PCA front-end
    (`awesome/run/semantic_soft_segmentation_extractor.py:1-261`) when
    neither precomputed embedmaps nor the TF1 checkout are available.
    """
    from scipy import ndimage
    from scipy.sparse.linalg import eigsh

    h, w = image.shape[:2]
    scale = min(1.0, max_side / max(h, w))
    if scale < 1.0:
        small = ndimage.zoom(image, (scale, scale, 1), order=1)
        small = np.clip(small, 0.0, 1.0)
    else:
        small = image
    sh, sw = small.shape[:2]
    L = matting_laplacian(small.astype(np.float64), eps=eps)
    k = n_components + 1
    v0 = np.full(L.shape[0], 1.0 / np.sqrt(L.shape[0]))
    # shift-invert around 0: smallest eigenpairs of the PSD Laplacian
    vecs = eigsh(L, k=k, sigma=0, which="LM", v0=v0)[1]
    feats = []
    for i in range(1, k):
        f = vecs[:, i].reshape(sh, sw)
        lo, hi = float(f.min()), float(f.max())
        f = (f - lo) / max(hi - lo, 1e-12)
        if scale < 1.0:
            f = ndimage.zoom(f, (h / sh, w / sw), order=1)[:h, :w]
            # zoom can come up a pixel short on strongly rational ratios
            if f.shape != (h, w):
                pad = ((0, h - f.shape[0]), (0, w - f.shape[1]))
                f = np.pad(f, pad, mode="edge")
        feats.append(np.clip(f, 0.0, 1.0))
    return np.stack(feats, axis=-1).astype(np.float32)


class SemanticSoftSegmentationExtractor:
    def __init__(
        self,
        feature_dir: str,
        command_template: Optional[str] = None,
        n_components: int = 2,
        proxy: str = "spectral",
    ):
        self.feature_dir = feature_dir
        self.command_template = command_template
        self.n_components = n_components
        self.proxy = proxy

    @classmethod
    def from_config(cls, config, feature_dir: str,
                    n_components: int = 2) -> "SemanticSoftSegmentationExtractor":
        """Build from AwesomeConfig's SSS fields
        (`awesome/run/awesome_config.py` semantic_soft_segmentation_code_dir
        / _model_checkpoint_dir / tf_use_gpu): when a code dir is
        configured, reproduce the reference's shell-out
        (`awesome/run/semantic_soft_segmentation_extractor.py:139-176` runs
        ``main.py`` inside the SSS checkout against the checkpoint dir);
        otherwise precomputed-embedmap / proxy fallback. The proxy flavor
        comes from ``config.dataset_args['sss_proxy']`` (default
        "spectral"; "spectral_device" = accelerator eigensolve,
        "pyramid" = the legacy Gaussian-pyramid PCA)."""
        tmpl = None
        code_dir = getattr(
            config, "semantic_soft_segmentation_code_dir", None)
        if code_dir:
            ckpt = getattr(
                config, "semantic_soft_segmentation_model_checkpoint_dir",
                "") or ""
            device = "" if getattr(config, "tf_use_gpu", False) else (
                "CUDA_VISIBLE_DEVICES= ")
            tmpl = (
                f"cd {code_dir} && {device}python main.py"
                f" --model-checkpoint-dir {ckpt}"
                f" --image {{name}} --output-dir {feature_dir}"
            )
        proxy = getattr(config, "dataset_args", None) or {}
        proxy = proxy.get("sss_proxy", "spectral") if isinstance(
            proxy, dict) else "spectral"
        return cls(feature_dir, command_template=tmpl,
                   n_components=n_components, proxy=proxy)

    def extract(self, image: np.ndarray, name: str) -> np.ndarray:
        """(H, W, 3) float [0,1] -> (H, W, n_components) features."""
        from awesome_tpu.data.image_sample import (
            load_semantic_features,
            semantic_features,
        )

        feat = load_semantic_features(
            self.feature_dir, name, self.n_components
        )
        if feat is not None:
            return feat
        if self.command_template:
            cmd = self.command_template.format(name=name)
            subprocess.run(cmd, shell=True, check=True)
            feat = load_semantic_features(
                self.feature_dir, name, self.n_components
            )
            if feat is not None:
                return feat
        return self._proxy_features(image)

    def proxy_features(self, image: np.ndarray) -> np.ndarray:
        """Features from the configured proxy alone (no embedmap lookup /
        shell-out): device or host spectral matting per ``self.proxy``,
        degrading gracefully to pyramid PCA."""
        return self._proxy_features(image)

    def _proxy_features(self, image: np.ndarray) -> np.ndarray:
        if self.proxy == "spectral_device" and min(image.shape[:2]) >= 3:
            try:
                from awesome_tpu.ops.spectral import (
                    spectral_soft_segments_device,
                )

                return spectral_soft_segments_device(
                    image, self.n_components)
            except Exception as e:
                import logging

                logging.getLogger(__name__).warning(
                    "device spectral soft segments failed (%r); "
                    "falling back to the host spectral path", e)
        if self.proxy in ("spectral", "spectral_device") and (
                min(image.shape[:2]) >= 3):
            try:
                return spectral_soft_segments(image, self.n_components)
            except Exception as e:  # singular Laplacian corner cases
                import logging

                logging.getLogger(__name__).warning(
                    "spectral soft segments failed (%r); falling back to "
                    "the pyramid-PCA proxy — 'feat' quality degrades", e)
        return self._pyramid_features(image)

    def _pyramid_features(self, image: np.ndarray) -> np.ndarray:
        from scipy import ndimage

        h, w = image.shape[:2]
        chans: List[np.ndarray] = []
        for sigma in (1, 4, 16):
            for c in range(3):
                chans.append(ndimage.gaussian_filter(image[..., c], sigma))
        yy, xx = np.mgrid[0:h, 0:w]
        chans.append(yy / max(h - 1, 1))
        chans.append(xx / max(w - 1, 1))
        emb = np.stack(chans, axis=-1).astype(np.float32)
        from awesome_tpu.data.image_sample import semantic_features

        return semantic_features(emb, self.n_components)
