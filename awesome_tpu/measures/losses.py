"""Losses as pure functions (jit/vmap/grad-safe — no dynamic shapes).

Ports of behavior (not code) from `awesome/measures/`:

- :func:`se` / :func:`ae`                `se.py:7`, `ae.py`
- :func:`unaries_weighted_loss`          `unaries_weighted_loss.py:9-69`
  with modes none/equal/ratio/sssdms. Reference computes fg/bg counts via
  ``torch.unique`` (dynamic); here via masked sums (static, compilable).
- :func:`awesome_loss`                   `awesome_loss.py:11-63` incl. the
  extra-penalty phase.
- :func:`fbms_joint_loss`                `fbms_joint_loss.py:13-59` incl.
  the soft clip of the prior penalty.
- :func:`gradient_penalty`               `gradient_penalty_loss.py:11-113`
  via ``jax.grad`` w.r.t. inputs instead of autograd.grad.
- :func:`total_variation`                `tv.py`

Convention: losses return scalars under 'mean'/'sum' reduction, or the raw
elementwise tensor under 'none'.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


def _reduce(x, reduction: str = "mean", axis=None):
    if reduction == "mean":
        return x.mean() if axis is None else x.mean(axis=axis)
    if reduction == "sum":
        return x.sum() if axis is None else x.sum(axis=axis)
    if reduction == "none":
        return x
    raise ValueError(f"Unknown reduction {reduction}")


def se(output, target, reduction: str = "mean", axis=None):
    """Squared error. Spec: `awesome/measures/se.py:7-24`."""
    return _reduce((target - output) ** 2, reduction, axis)


def ae(output, target, reduction: str = "mean", axis=None):
    """Absolute error."""
    return _reduce(jnp.abs(target - output), reduction, axis)


def bce(output, target, reduction: str = "mean", eps: float = 1e-7,
        weight=None):
    """Binary cross-entropy on probabilities (torch nn.BCELoss semantics,
    incl. input clamping for numerical safety)."""
    p = jnp.clip(output, eps, 1.0 - eps)
    ll = -(target * jnp.log(p) + (1.0 - target) * jnp.log1p(-p))
    if weight is not None:
        ll = ll * weight
    return _reduce(ll, reduction)


def total_variation(img, reduction: str = "mean"):
    """Anisotropic TV on (..., H, W). Spec: `awesome/measures/tv.py`."""
    dh = jnp.abs(jnp.diff(img, axis=-2))
    dw = jnp.abs(jnp.diff(img, axis=-1))
    return _reduce(dh, reduction) + _reduce(dw, reduction)


def unaries_weight(target, mode: str = "none", ratio: float = 1.0,
                   mask=None):
    """Class-balancing pixel weights from soft unaries.

    fg = target < 0.5, bg = target >= 0.5 (foreground is encoded as 0 in the
    reference's unaries convention). Modes, spec
    `awesome/measures/unaries_weighted_loss.py:34-69`:

    - 'none':   all ones
    - 'equal':  fg pixels weighted bg_count/fg_count
    - 'ratio':  fg pixels weighted ((bg/fg - 1) * ratio) + 1
    - 'sssdms': fg pixels weighted round((bg/fg)/10) + 1

    ``mask`` (same shape as / broadcastable to ``target``): padded points
    get weight 0 and are excluded from the class counts (pad-to-bucket +
    mask — heterogeneous image sizes must not skew the fg/bg balance).
    """
    if mode == "none":
        ones = jnp.ones_like(target)
        return ones if mask is None else ones * mask.astype(target.dtype)
    is_bg = (target >= 0.5).astype(target.dtype)
    if mask is not None:
        m = jnp.broadcast_to(mask.astype(target.dtype), target.shape)
        bg_count = (is_bg * m).sum()
        fg_count = jnp.maximum(((1.0 - is_bg) * m).sum(), 1.0)
    else:
        m = None
        bg_count = is_bg.sum()
        fg_count = jnp.maximum((1.0 - is_bg).sum(), 1.0)
    cc = bg_count / fg_count
    if mode == "equal":
        w_fg = cc
    elif mode == "ratio":
        w_fg = (cc - 1.0) * ratio + 1.0
    elif mode == "sssdms":
        w_fg = jnp.round(cc / 10.0) + 1.0
    else:
        raise ValueError(f"Mode {mode} is not supported")
    w = jnp.where(is_bg > 0, 1.0, w_fg)
    return w if m is None else w * m


def unaries_weighted_loss(
    output,
    target,
    criterion: Callable = se,
    mode: str = "none",
    ratio: float = 1.0,
    reduction: str = "mean",
):
    """Weighted criterion with unary-derived class weights.

    Matches WeightedLoss semantics (`awesome/measures/weighted_loss.py:12`):
    elementwise criterion * weight, then mean/sum.
    """
    raw = criterion(output, target, reduction="none")
    w = unaries_weight(target, mode=mode, ratio=ratio)
    return _reduce(raw * w, reduction)


def awesome_loss(
    output,
    target,
    criterion: Callable = bce,
    alpha: float = 1.0,
    extra_penalty: bool = False,
    scribble_percentage: float = 1.0,
):
    """Pixel-mode 2-channel loss: crit(seg) + alpha * crit(prior), with an
    optional extra-penalty phase that aligns the prior to the *thresholded*
    segmentation on the random-pixel tail of the batch.

    ``output`` is (..., N, 2): channel 0 = segmentation prob, channel 1 =
    prior prob; the first ``floor(N * scribble_percentage)`` points are
    scribble points (supervised), the rest random points.
    Spec: `awesome/measures/awesome_loss.py:38-63`.
    """
    n_total = output.shape[-2]
    n_scribbles = int(n_total * scribble_percentage)
    n_random = n_total - n_scribbles

    out_seg = output[..., :n_scribbles, 0:1]
    out_prior = output[..., :n_scribbles, 1:2]
    loss = criterion(out_seg, target) + alpha * criterion(out_prior, target)

    if extra_penalty and n_random > 0:
        seg_rand = output[..., n_random:, 0:1]
        prior_rand = output[..., n_random:, 1:2]
        hard_seg = (seg_rand > 0.5).astype(output.dtype)
        hard_seg = jax.lax.stop_gradient(hard_seg)
        loss = 0.1 * loss + 100.0 * jnp.mean((prior_rand - hard_seg) ** 2)
    return loss


def fbms_joint_loss(
    output,
    target,
    criterion: Optional[Callable] = None,
    penalty_criterion: Callable = se,
    alpha: float = 1.0,
    beta: float = 1.0,
    clip_penalty: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Joint FBMS loss: weighted seg BCE + soft-clipped prior alignment.

    ``output`` is (B, 2C, H, W): first half channels segmentation, second
    half prior. The penalty is soft-clipped so it can never dominate the
    segmentation loss (`awesome/measures/fbms_joint_loss.py:44-51`).

    Returns a dict with 'loss' plus the logged sub-terms (the reference
    logs them through TrackerLoss; we return them for the tracker).
    """
    if criterion is None:
        def criterion(o, t):
            return unaries_weighted_loss(o, t, criterion=_bce_none, mode="sssdms")

    c_half = output.shape[1] // 2
    out_seg = output[:, :c_half]
    out_prior = output[:, c_half:]

    seg_raw = criterion(out_seg, target)
    seg_loss = alpha * seg_raw
    pen_raw = penalty_criterion(out_prior, out_seg)
    pen_loss = beta * pen_raw
    if clip_penalty:
        scale = jax.lax.stop_gradient(
            jnp.where(pen_loss > seg_loss, seg_loss / jnp.maximum(pen_loss, 1e-12), 1.0)
        )
        pen_loss = pen_loss * scale
    loss = seg_loss + pen_loss
    return {
        "loss": loss,
        "segmentation_loss": seg_raw,
        "penalty_loss": pen_raw,
        "penalty_loss_frac": pen_loss / jnp.maximum(loss, 1e-12),
        "segmentation_loss_frac": seg_loss / jnp.maximum(loss, 1e-12),
    }


def _bce_none(output, target, reduction="none"):
    return bce(output, target, reduction=reduction)


def gradient_penalty(
    model_fn: Callable,
    inputs,
    target,
    criterion: Callable = bce,
    xy_weight: float = 0.0,
    feat_weight: float = 0.0,
    rgb_weight: float = 0.0,
    xy_slice=slice(0, 2),
    feat_slice=slice(2, 4),
    rgb_slice=slice(4, 7),
):
    """BCE + penalties on d(output)/d(input-channel-groups).

    The reference differentiates the output w.r.t. the network input via
    ``torch.autograd.grad`` (`awesome/measures/gradient_penalty_loss.py:42-113`);
    here the input-Jacobian comes from ``jax.grad`` of the summed output —
    identical quantity, but fused by XLA into the same backward pass.

    ``model_fn(inputs) -> output``; inputs (N, C) point matrix.
    """
    output = model_fn(inputs)
    loss = criterion(output, target)

    def summed_out(x):
        return model_fn(x).sum()

    g = jax.grad(summed_out)(inputs)
    if xy_weight:
        loss = loss + xy_weight * jnp.mean(g[..., xy_slice] ** 2)
    if feat_weight:
        loss = loss + feat_weight * jnp.mean(g[..., feat_slice] ** 2)
    if rgb_weight:
        loss = loss + rgb_weight * jnp.mean(g[..., rgb_slice] ** 2)
    return loss
