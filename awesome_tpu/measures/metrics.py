"""Segmentation metrics in pure JAX (no sklearn — jit/vmap-safe).

Ports of behavior from `awesome/measures/miou.py:10` (binary jaccard with
optional noneclass masking and fg-inversion) and
`awesome/measures/pixel_accuracy.py`.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def iou(
    output,
    target,
    invert: bool = False,
    noneclass: Optional[float] = None,
    noneclass_replacement: float = 0.0,
    eps: float = 0.0,
):
    """Binary intersection-over-union of thresholded masks.

    ``invert=True`` computes IoU of the complement (the reference uses this
    to score against foreground when fg is encoded as 0 — e.g. the prior-fit
    acceptance gate, `awesome/model/path_connected_net.py:784-786`).
    Matches sklearn ``jaccard_score(average='binary')`` incl. its
    "all-zero target -> 0.0" convention.
    """
    o = jnp.asarray(output).astype(jnp.float32)
    t = jnp.asarray(target).astype(jnp.float32)
    if noneclass is not None:
        o = jnp.where(t == noneclass, noneclass_replacement, o)
        t = jnp.where(t == noneclass, noneclass_replacement, t)
    if invert:
        o = 1.0 - o
        t = 1.0 - t
    o = o > 0.5
    t = t > 0.5
    inter = jnp.logical_and(o, t).sum().astype(jnp.float32)
    union = jnp.logical_or(o, t).sum().astype(jnp.float32)
    # sklearn: if target all zero (and output all zero) -> 0.0
    return jnp.where(union > 0, inter / jnp.maximum(union, eps + 1.0e-30), 0.0)


def iou_np(
    output,
    target,
    invert: bool = False,
    noneclass: Optional[float] = None,
    noneclass_replacement: float = 0.0,
) -> float:
    """Host-side numpy twin of :func:`iou` (same thresholds, inversion,
    noneclass masking, and all-zero-union -> 0.0 convention).

    For per-image host loops over heterogeneous shapes (runner eval):
    the jnp version dispatches an eager device computation + sync per
    call, which on the tunneled chip costs ~ms each. Parity with the
    device version is test-locked (tests/test_measures.py)."""
    import numpy as _np

    o = _np.asarray(output, _np.float32)
    t = _np.asarray(target, _np.float32)
    if noneclass is not None:
        o = _np.where(t == noneclass, noneclass_replacement, o)
        t = _np.where(t == noneclass, noneclass_replacement, t)
    if invert:
        o = 1.0 - o
        t = 1.0 - t
    o = o > 0.5
    t = t > 0.5
    union = _np.logical_or(o, t).sum()
    if union == 0:
        return 0.0
    return float(_np.logical_and(o, t).sum() / union)


def pixel_accuracy_np(output, target,
                      noneclass: Optional[float] = None) -> float:
    """Host-side numpy twin of :func:`pixel_accuracy`."""
    import numpy as _np

    o = _np.asarray(output) > 0.5
    t = _np.asarray(target) > 0.5
    match = (o == t).astype(_np.float32)
    if noneclass is not None:
        valid = (_np.asarray(target) != noneclass)
        return float((match * valid).sum() / max(valid.sum(), 1.0))
    return float(match.mean())


def miou(outputs, targets, invert: bool = False, axis=None):
    """Mean IoU over a leading batch axis of (B, ...) mask stacks."""
    import jax

    per = jax.vmap(lambda o, t: iou(o, t, invert=invert))(outputs, targets)
    return per.mean() if axis is None else per


def pixel_accuracy(output, target, noneclass: Optional[float] = None):
    """Fraction of matching thresholded pixels.

    Spec: `awesome/measures/pixel_accuracy.py`.
    """
    o = jnp.asarray(output) > 0.5
    t = jnp.asarray(target) > 0.5
    match = (o == t).astype(jnp.float32)
    if noneclass is not None:
        valid = (jnp.asarray(target) != noneclass).astype(jnp.float32)
        return (match * valid).sum() / jnp.maximum(valid.sum(), 1.0)
    return match.mean()


def boundary_f1(output, target, tolerance: int = 2):
    """Boundary F-measure with pixel tolerance via dilation (used by FBMS
    evaluation protocols). Pure JAX: morphological dilation as max-pool."""
    import jax

    def boundary(mask):
        m = mask.astype(jnp.float32)
        # 4-neighbourhood gradient magnitude > 0 marks the boundary
        up = jnp.pad(m, ((1, 0), (0, 0)))[:-1]
        dn = jnp.pad(m, ((0, 1), (0, 0)))[1:]
        lf = jnp.pad(m, ((0, 0), (1, 0)))[:, :-1]
        rt = jnp.pad(m, ((0, 0), (0, 1)))[:, 1:]
        diff = (
            jnp.abs(m - up) + jnp.abs(m - dn) + jnp.abs(m - lf) + jnp.abs(m - rt)
        )
        return (diff > 0) & (m > 0)

    def dilate(mask, it):
        m = mask.astype(jnp.float32)[None, :, :, None]
        for _ in range(it):
            m = jax.lax.reduce_window(
                m, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
            )
        return m[0, :, :, 0] > 0

    o = jnp.asarray(output) > 0.5
    t = jnp.asarray(target) > 0.5
    bo, bt = boundary(o), boundary(t)
    bo_d, bt_d = dilate(bo, tolerance), dilate(bt, tolerance)
    precision = (bo & bt_d).sum() / jnp.maximum(bo.sum(), 1)
    recall = (bt & bo_d).sum() / jnp.maximum(bt.sum(), 1)
    return 2 * precision * recall / jnp.maximum(precision + recall, 1e-12)
