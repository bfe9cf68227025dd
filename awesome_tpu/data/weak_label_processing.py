"""Weak-label preprocessing: outlier removal and confidence-based
uncertainty re-labeling.

Behavior port of `awesome/dataset/fbms_sequence_sample.py:505-706`
(``_process_weak_label`` + ``_closest_node``): before training on sparse
trajectory labels,

1. **outlier removal** — a foreground point whose nearest other
   foreground point is further than OUTLIER_THRESHOLD (squared pixel
   distance) becomes unlabeled (`:540-546`),
2. **uncertainty re-labeling** — points with tracker confidence < 0.4 get
   re-voted from a 128x128 patch around them: class votes in the patch,
   normalized by global class frequency, decide whether the label flips
   (`:560-660`).

The reference runs these as per-point Python loops; here both are
vectorized numpy (KD-tree for neighbors, summed-area tables for patch
votes) — host-side preprocessing, cached per frame.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def remove_foreground_outliers(
    unaries: np.ndarray,
    labeled: np.ndarray,
    outlier_threshold_sq: float = 1000.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Unlabel isolated fg points (unaries==0 & labeled)."""
    from scipy.spatial import cKDTree

    fg = (unaries == 0.0) & labeled
    pts = np.argwhere(fg)
    if len(pts) < 2:
        return unaries, labeled
    tree = cKDTree(pts)
    # nearest neighbor excluding self: k=2
    dists, _ = tree.query(pts, k=2)
    nearest_sq = dists[:, 1] ** 2
    bad = nearest_sq > outlier_threshold_sq
    labeled = labeled.copy()
    unaries = unaries.copy()
    labeled[pts[bad, 0], pts[bad, 1]] = False
    unaries[pts[bad, 0], pts[bad, 1]] = 1.0
    return unaries, labeled


def _box_sum(img: np.ndarray, radius: int) -> np.ndarray:
    """Sum over a (2r x 2r) box via a summed-area table."""
    h, w = img.shape
    sat = np.zeros((h + 1, w + 1), np.float64)
    sat[1:, 1:] = np.cumsum(np.cumsum(img, 0), 1)
    ys = np.arange(h)
    xs = np.arange(w)
    y0 = np.clip(ys - radius, 0, h)[:, None]
    y1 = np.clip(ys + radius, 0, h)[:, None]
    x0 = np.clip(xs - radius, 0, w)[None, :]
    x1 = np.clip(xs + radius, 0, w)[None, :]
    return (
        sat[y1, x1] - sat[y0, x1] - sat[y1, x0] + sat[y0, x0]
    )


def relabel_uncertain(
    unaries: np.ndarray,
    labeled: np.ndarray,
    confidence: np.ndarray,
    uncertainty_threshold: float = 0.4,
    patch_radius: int = 64,
) -> Tuple[np.ndarray, np.ndarray]:
    """Re-vote low-confidence labeled points by the patch-majority class.

    Deviation from the reference noted: the reference samples flips from
    probabilities combining patch votes with global class frequencies
    (`fbms_sequence_sample.py:562-706`, partially commented-out logic);
    here the flip is the deterministic patch-majority decision — the
    documented intent ("uncertain points take the label of their
    surroundings") without the stochastic machinery."""
    fg = ((unaries == 0.0) & labeled).astype(np.float64)
    bg = ((unaries == 1.0) & labeled).astype(np.float64)
    fg_votes = _box_sum(fg, patch_radius)
    bg_votes = _box_sum(bg, patch_radius)
    conf = np.where(confidence == -1, 100.0, confidence)
    uncertain = (conf < uncertainty_threshold) & labeled
    # patch must contain both classes for a re-vote (reference requires
    # > 2 labels in the patch incl. the none label)
    both = (fg_votes > 0) & (bg_votes > 0)
    flip_to_fg = uncertain & both & (fg_votes > bg_votes) & (unaries == 1.0)
    flip_to_bg = uncertain & both & (bg_votes > fg_votes) & (unaries == 0.0)
    out = unaries.copy()
    out[flip_to_fg] = 0.0
    out[flip_to_bg] = 1.0
    return out, labeled


def process_weak_label(
    unaries: np.ndarray,
    labeled: np.ndarray,
    confidence: Optional[np.ndarray] = None,
    outlier_threshold_sq: float = 1000.0,
    uncertainty_threshold: float = 0.4,
    patch_radius: int = 64,
) -> Tuple[np.ndarray, np.ndarray]:
    unaries, labeled = remove_foreground_outliers(
        unaries, labeled, outlier_threshold_sq
    )
    if confidence is not None:
        unaries, labeled = relabel_uncertain(
            unaries, labeled, confidence, uncertainty_threshold, patch_radius
        )
    return unaries, labeled
