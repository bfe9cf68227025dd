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
- otherwise falls back to a self-contained deep-feature proxy: PCA of
  multi-scale Gaussian-pyramid color+position features — not the SSS
  embedding, but the same 2-channel interface, so pipelines depending on
  'feat' channels run end-to-end without TF1.
"""
from __future__ import annotations

import os
import subprocess
from typing import List, Optional

import numpy as np


class SemanticSoftSegmentationExtractor:
    def __init__(
        self,
        feature_dir: str,
        command_template: Optional[str] = None,
        n_components: int = 2,
    ):
        self.feature_dir = feature_dir
        self.command_template = command_template
        self.n_components = n_components

    @classmethod
    def from_config(cls, config, feature_dir: str,
                    n_components: int = 2) -> "SemanticSoftSegmentationExtractor":
        """Build from AwesomeConfig's SSS fields
        (`awesome/run/awesome_config.py` semantic_soft_segmentation_code_dir
        / _model_checkpoint_dir / tf_use_gpu): when a code dir is
        configured, reproduce the reference's shell-out
        (`awesome/run/semantic_soft_segmentation_extractor.py:139-176` runs
        ``main.py`` inside the SSS checkout against the checkpoint dir);
        otherwise precomputed-embedmap / proxy fallback."""
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
        return cls(feature_dir, command_template=tmpl,
                   n_components=n_components)

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

    def _proxy_features(self, image: np.ndarray) -> np.ndarray:
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
