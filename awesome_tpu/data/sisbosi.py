"""SISBOSI — the legacy single-image-scribble pipeline with augmentation.

Behavior port of `awesome/dataset/sisbosi_dataset.py:26-602`
(ScribbleImage / ConvexityDataset / SISBOSIDataset): per-image scribble
samples with data augmentation (random hflip, random rotation +-20deg,
color jitter, gaussian noise) and semantic-label re-indexing. Augmentation
is host-side numpy/PIL (cold path); re-uses ``ConvexitySample`` as the
underlying record so both pipelines share loaders.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from awesome_tpu.data.convexity import ConvexitySample


def remove_semantic_information(labels: np.ndarray) -> np.ndarray:
    """Re-index arbitrary label values to 0..K-1.

    Spec: `sisbosi_dataset.py:352-360`.
    """
    vals = np.unique(labels)
    out = np.zeros_like(labels)
    for i, v in enumerate(vals):
        out[labels == v] = i
    return out


def augment(
    image: np.ndarray,
    gt: np.ndarray,
    scribble: np.ndarray,
    rng: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Random hflip + rotation(+-20deg) + color jitter + gaussian noise.

    Spec: `sisbosi_dataset.py:320-350` (the torchvision recipe in
    numpy/PIL terms). Masks rotate with nearest interpolation.
    """
    from PIL import Image

    img = Image.fromarray((np.clip(image, 0, 1) * 255).astype(np.uint8))
    gt_i = Image.fromarray((gt * 255).astype(np.uint8))
    scr_i = Image.fromarray(scribble.astype(np.uint8))

    if rng.random() > 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
        gt_i = gt_i.transpose(Image.FLIP_LEFT_RIGHT)
        scr_i = scr_i.transpose(Image.FLIP_LEFT_RIGHT)
    if rng.random() > 0.5:
        angle = int(rng.integers(-20, 21))
        img = img.rotate(angle)
        gt_i = gt_i.rotate(angle, resample=Image.NEAREST)
        scr_i = scr_i.rotate(angle, resample=Image.NEAREST)

    out = np.asarray(img, np.float32) / 255.0
    # color jitter: brightness/contrast/saturation/hue-ish perturbations
    out = out * rng.uniform(0.8, 1.2)  # brightness
    mean = out.mean()
    out = (out - mean) * rng.uniform(0.8, 1.2) + mean  # contrast
    gray = out.mean(axis=-1, keepdims=True)
    out = gray + (out - gray) * rng.uniform(0.8, 1.2)  # saturation
    out = out[..., np.asarray([0, 1, 2])] + rng.uniform(-0.02, 0.02, 3)
    # gaussian noise
    out = out + rng.normal(0, 0.05, out.shape)
    out = np.clip(out, 0.0, 1.0).astype(np.float32)
    return (
        out,
        (np.asarray(gt_i, np.float32) / 255.0),
        np.asarray(scr_i),
    )


class SISBOSIDataset:
    """Single-image scribble dataset with optional augmentation; each
    __getitem__ draws a fresh augmentation of the SAME image (the
    reference trains many epochs on one augmented image)."""

    def __init__(
        self,
        samples: Sequence[ConvexitySample],
        augmentation: bool = True,
        scribble_percentage: float = 1.0,
        seed: int = 42,
    ):
        self.samples = list(samples)
        self.augmentation = augmentation
        self.scribble_percentage = scribble_percentage
        self.rng = np.random.default_rng(seed)
        self.seed = seed

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        s = self.samples[index]
        if not self.augmentation:
            return s.pixels(self.scribble_percentage, seed=self.seed)
        scribble = np.zeros(s.gt.shape, np.uint8)
        scribble[s.bg_mask] = 1
        scribble[s.fg_mask] = 2
        img, gt, scr = augment(s.image, s.gt, scribble, self.rng)
        aug = ConvexitySample(
            image=img,
            gt=gt,
            fg_mask=scr == 2,
            bg_mask=scr == 1,
            index=s.index,
        )
        return aug.pixels(self.scribble_percentage, seed=self.seed)
