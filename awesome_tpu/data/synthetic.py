"""Synthetic dataset generator producing ``ConvexitySample``-shaped data.

The reference benchmark images must be downloaded (`scripts/setup.py`);
this container has zero egress, so tests and benches run on procedurally
generated scenes that exercise the exact same code paths: colored convex
shapes (disks/ellipses) with occlusions, scribble masks, and ground truth
with the fg=0 convention.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from awesome_tpu.data.convexity import ConvexitySample


def _shape_mask(rng, h: int, w: int) -> np.ndarray:
    cy = rng.uniform(0.35 * h, 0.65 * h)
    cx = rng.uniform(0.35 * w, 0.65 * w)
    ry = rng.uniform(0.18 * h, 0.3 * h)
    rx = rng.uniform(0.18 * w, 0.3 * w)
    theta = rng.uniform(0, np.pi)
    yy, xx = np.mgrid[0:h, 0:w]
    yr = (yy - cy) * np.cos(theta) + (xx - cx) * np.sin(theta)
    xr = -(yy - cy) * np.sin(theta) + (xx - cx) * np.cos(theta)
    return (yr / ry) ** 2 + (xr / rx) ** 2 <= 1.0


def make_sample(
    seed: int,
    h: int = 64,
    w: int = 64,
    occlude: bool = True,
) -> ConvexitySample:
    """One synthetic scene: a colored convex object on textured background,
    optionally with an occluding stripe (the 'tomato behind leaves' case —
    the prior should recover the full object)."""
    rng = np.random.default_rng(seed)
    obj = _shape_mask(rng, h, w)
    image = rng.uniform(0.0, 0.35, size=(h, w, 3)).astype(np.float32)
    color = rng.uniform(0.6, 1.0, size=(3,)).astype(np.float32)
    image[obj] = color + rng.normal(0, 0.03, size=(int(obj.sum()), 3)).astype(
        np.float32
    )
    image = np.clip(image, 0.0, 1.0)

    visible = obj.copy()
    if occlude:
        # occluder: a rotated stripe of bounded width so a guaranteed
        # majority of the object stays visible (a full random shape could
        # swallow it entirely and leave no fg scribbles)
        yy, xx = np.mgrid[0:h, 0:w]
        theta = rng.uniform(0, np.pi)
        d = (yy - h / 2) * np.cos(theta) + (xx - w / 2) * np.sin(theta)
        offset = rng.uniform(-0.15, 0.15) * min(h, w)
        # thin occluder (~leaf over tomato): hides 10-20% of the object so
        # the full-GT IoU cap stays realistic
        stripe = (np.abs(d - offset) < 0.04 * min(h, w)) & obj
        image[stripe] = rng.uniform(0.0, 0.25, size=(3,)).astype(np.float32)
        visible = obj & ~stripe

    gt = 1.0 - obj.astype(np.float32)  # fg = 0 convention

    # scribbles: random subsets of visible fg and of bg, with a floor so
    # every sample carries both classes
    fg_scr = visible & (rng.random((h, w)) < 0.25)
    bg_scr = (~obj) & (rng.random((h, w)) < 0.1)
    if fg_scr.sum() < 8:
        idx = np.argwhere(visible)
        take = idx[rng.permutation(len(idx))[: max(8, len(idx) // 4)]]
        fg_scr[take[:, 0], take[:, 1]] = True
    return ConvexitySample(
        image=image, gt=gt, fg_mask=fg_scr, bg_mask=bg_scr, index=seed
    )


def synthetic_convexity_dataset(
    n: int = 8, h: int = 64, w: int = 64, occlude: bool = True, seed0: int = 0
) -> List[ConvexitySample]:
    return [make_sample(seed0 + i, h, w, occlude) for i in range(n)]
