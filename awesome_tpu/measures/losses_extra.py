"""Additional loss/metric family: image-mode joint losses, regularizer
wrapper, unary conversion, prior-image loss, true-pixel accuracy.

Behavior ports from `awesome/measures/`:
- :func:`awesome_image_loss`       `awesome_image_loss.py:9-52` (channel-
  split seg/prior BCE with gamma-scaled extra-penalty alignment)
- :func:`awesome_loss_joint`       `awesome_loss_joint.py:10-60` (pixel-
  mode joint variant with beta alignment weight)
- :func:`regularizer_loss`         `regularizer_loss.py:9-40` (criterion +
  tau * regularizer(output))
- :func:`unaries_conversion_loss`  `unaries_conversion_loss.py:7-24`
  (threshold soft targets to hard before the criterion)
- :func:`prior_image_loss`         `prior_image_loss.py:9-44` (noneclass-
  masked seg+prior BCE + alignment on ALL pixels)
- :func:`true_pixel_accuracy`      `true_pixel_accuracy.py:9-46`
  (accuracy counted over true-positive target pixels only)

All jit-safe: noneclass exclusion uses masked reductions, not boolean
indexing.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from awesome_tpu.measures.losses import bce


def _masked_mean(values, mask):
    m = mask.astype(values.dtype)
    return (values * m).sum() / jnp.maximum(m.sum(), 1.0)


def awesome_image_loss(
    output,
    target,
    criterion: Callable = bce,
    prior_criterion: Callable = bce,
    alpha: float = 1.0,
    beta: float = 100.0,
    gamma: float = 0.1,
    extra_penalty=False,
):
    """Image-mode loss: output (B, 2C, H, W) channel-split halves."""
    half = output.shape[1] // 2
    seg = output[:, :half]
    prior = output[:, half:]
    loss = criterion(seg, target) + alpha * prior_criterion(prior, target)
    hard_seg = jax.lax.stop_gradient((seg > 0.5).astype(output.dtype))
    with_pen = gamma * loss + beta * jnp.mean((prior - hard_seg) ** 2)
    return jnp.where(jnp.asarray(extra_penalty), with_pen, loss)


def awesome_loss_joint(
    output,
    target,
    criterion: Callable = bce,
    alpha: float = 1.0,
    beta: float = 1.0,
    gamma: float = 1.0,
    scribble_percentage: float = 1.0,
    extra_penalty=False,
):
    """Pixel-mode joint loss (N, 2): crit(seg) + alpha*crit(prior), plus a
    beta-weighted seg/prior alignment when extra_penalty, scaled gamma."""
    n_total = output.shape[-2]
    n_scr = int(n_total * scribble_percentage)
    seg = output[..., :n_scr, 0:1]
    prior = output[..., :n_scr, 1:2]
    loss = criterion(seg, target) + alpha * criterion(prior, target)
    hard_seg = jax.lax.stop_gradient(
        (output[..., 0:1] > 0.5).astype(output.dtype)
    )
    align = jnp.mean((output[..., 1:2] - hard_seg) ** 2)
    with_pen = gamma * loss + beta * align
    return jnp.where(jnp.asarray(extra_penalty), with_pen, loss)


def regularizer_loss(
    output,
    target,
    criterion: Callable,
    tau: float = 0.0,
    regularizer: Optional[Callable] = None,
):
    loss = criterion(output, target)
    if tau > 0.0:
        if regularizer is None:
            raise ValueError(
                "regularizer must not be None if tau is larger zero!"
            )
        loss = loss + tau * regularizer(output)
    return loss


def unaries_conversion_loss(output, target, criterion: Callable):
    """Threshold soft unary targets to hard classes before the criterion."""
    hard = (target >= 0.5).astype(output.dtype)
    return criterion(output, hard)


def prior_image_loss(
    output,
    target,
    criterion: Callable = bce,
    alpha: float = 1.0,
    beta: float = 100.0,
    delta: float = 1.0,
    noneclass: Optional[float] = 2.0,
):
    """Seg+prior BCE over non-noneclass pixels + alignment over ALL pixels.

    output (B, 2C, ...), target (B, C, ...) possibly containing the
    noneclass label.
    """
    half = output.shape[1] // 2
    seg = output[:, :half]
    prior = output[:, half:]
    if noneclass is not None:
        valid = (target != noneclass).astype(output.dtype)
        t = jnp.where(valid > 0, target, 0.0)
        seg_raw = bce_like(criterion, seg, t)
        prior_raw = bce_like(criterion, prior, t)
        loss = delta * _masked_mean(seg_raw, valid) + alpha * _masked_mean(
            prior_raw, valid
        )
    else:
        loss = delta * criterion(seg, target) + alpha * criterion(
            prior, target
        )
    hard_seg = jax.lax.stop_gradient((seg > 0.5).astype(output.dtype))
    return loss + beta * jnp.mean((prior - hard_seg) ** 2)


def bce_like(criterion: Callable, output, target):
    """Elementwise version of a criterion for masked reductions."""
    try:
        return criterion(output, target, reduction="none")
    except TypeError:
        return (output - target) ** 2


def true_pixel_accuracy(output, target, noneclass: Optional[float] = None):
    """Fraction of target-positive pixels predicted positive (recall of
    the true class)."""
    o = jnp.asarray(output)
    t = jnp.asarray(target)
    valid = (
        (t != noneclass) if noneclass is not None else jnp.ones_like(t, bool)
    )
    is_true = (t == 1.0) & valid
    correct = ((o == t) & is_true).astype(jnp.float32)
    denom = jnp.maximum(is_true.sum().astype(jnp.float32), 1.0)
    return correct.sum() / denom
