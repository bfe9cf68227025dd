"""Pixel-mode training — the convexity-benchmark path.

Reference semantics (`awesome/run/awesome_runner.py` 'single' mode +
`awesome/measures/awesome_loss.py:11-63`): every image has its OWN model
(the whole seg+prior wrapper is per-image, swapped through the prior
cache); each epoch takes one full-batch optimizer step on that image's
scribble pixels with ``crit(seg) + alpha*crit(prior)``; after
``extra_penalty_after_n_epochs`` the loss switches to the extra-penalty
phase (0.1x base + 100x prior-to-thresholded-seg alignment on random
pixels), optionally dropping the LR; convexity is clipped after every
step; training stops when the plateau LR decays under the watchdog
threshold.

TPU design: per-image independence -> ALL images train simultaneously:
``vmap`` over a stacked wrapper-param tree, ``lax.scan`` over epochs.
Variable pixel counts are bucket-padded with masks (weight 0). The
extra-penalty epoch switch is a traced comparison inside the scan (one
compiled program, no re-trace).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from awesome_tpu.core import tree as T
from awesome_tpu.fit import optim
from awesome_tpu.measures.losses import bce

Params = Any


@dataclasses.dataclass(frozen=True)
class PixelTrainConfig:
    """Defaults mirror `config/convexity/sequential/*.yaml` (3000 epochs,
    Adam lr 0.02, AwesomeLoss alpha=1)."""

    num_epochs: int = 3000
    lr: float = 0.02
    optimizer: str = "adam"
    alpha: float = 1.0
    extra_penalty_after: Optional[int] = None  # epoch index or None
    extra_penalty_lr_factor: float = 1.0  # reduce_lr_in_extra_penalty
    plateau_patience: int = 200
    plateau_factor: float = 0.5
    use_plateau: bool = False
    lr_stop_scale: float = 0.0
    nan_guard: bool = True


def masked_awesome_loss(
    output,
    target,
    scribble_mask,
    random_mask,
    alpha: float,
    extra_penalty,
):
    """AwesomeLoss with explicit pixel-role masks (padding-safe).

    output (N, 2): [seg, prior] probabilities; target (N, 1); masks (N,).
    Base: mean-BCE over scribble pixels of seg + alpha * same for prior.
    Extra-penalty phase (`awesome_loss.py:55-61`): 0.1 * base +
    100 * mean((prior - (seg > .5))^2) over random pixels.
    ``extra_penalty`` may be a traced bool.
    """
    sw = scribble_mask.astype(output.dtype)[:, None]
    n_scr = jnp.maximum(sw.sum(), 1.0)

    def mbce(pred):
        raw = bce(pred, target, reduction="none")
        return (raw * sw).sum() / n_scr

    base = mbce(output[:, 0:1]) + alpha * mbce(output[:, 1:2])

    rw = random_mask.astype(output.dtype)[:, None]
    n_rnd = jnp.maximum(rw.sum(), 1.0)
    hard_seg = jax.lax.stop_gradient(
        (output[:, 0:1] > 0.5).astype(output.dtype)
    )
    align = ((output[:, 1:2] - hard_seg) ** 2 * rw).sum() / n_rnd
    with_pen = 0.1 * base + 100.0 * align
    return jnp.where(extra_penalty, with_pen, base)


def make_pixel_train_fn(wrapper, cfg: PixelTrainConfig):
    """Build ``train(params, px, gt, scribble_mask, random_mask) ->
    (params, aux)`` for ONE image; vmap for the stacked version."""
    init_fn, update_fn = {
        "adam": (optim.adam_init, optim.adam_update),
        "adamax": (optim.adamax_init, optim.adamax_update),
    }[cfg.optimizer]

    def loss_fn(params, px, gt, smask, rmask, extra_penalty):
        out = wrapper.apply(params, px)
        return masked_awesome_loss(
            out, gt, smask, rmask, cfg.alpha, extra_penalty
        )

    vg = jax.value_and_grad(loss_fn)
    has_clip = hasattr(wrapper, "enforce_convexity")

    def train(params, px, gt, smask, rmask):
        opt_state = init_fn(params)
        sched = optim.plateau_init()

        def step(carry, epoch):
            params, opt_state, sched = carry
            extra = (
                epoch >= cfg.extra_penalty_after
                if cfg.extra_penalty_after is not None
                else jnp.asarray(False)
            )
            loss, grads = vg(params, px, gt, smask, rmask, extra)
            lr = cfg.lr * (sched.scale if cfg.use_plateau else 1.0)
            if cfg.extra_penalty_after is not None:
                lr = jnp.where(
                    extra, lr * cfg.extra_penalty_lr_factor, lr
                )
            new_params, new_opt = update_fn(params, grads, opt_state, lr)
            if has_clip:
                new_params = wrapper.enforce_convexity(new_params)
            ok = jnp.isfinite(loss) if cfg.nan_guard else jnp.asarray(True)
            if cfg.use_plateau and cfg.lr_stop_scale > 0.0:
                ok = jnp.logical_and(ok, sched.scale > cfg.lr_stop_scale)
            params = T.tree_where(ok, new_params, params)
            opt_state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new_opt, opt_state
            )
            if cfg.use_plateau:
                sched = optim.plateau_update(
                    sched, loss, factor=cfg.plateau_factor,
                    patience=cfg.plateau_patience,
                )
            return (params, opt_state, sched), loss

        (params, _, sched), loss_hist = jax.lax.scan(
            step,
            (params, opt_state, sched),
            jnp.arange(cfg.num_epochs),
        )
        return params, {"loss_hist": loss_hist, "lr_scale": sched.scale}

    return train


def train_pixel_models(
    wrapper,
    stacked_params: Params,
    px: jnp.ndarray,  # (B, N, C)
    gt: jnp.ndarray,  # (B, N, 1)
    scribble_mask: jnp.ndarray,  # (B, N)
    random_mask: jnp.ndarray,  # (B, N)
    cfg: PixelTrainConfig,
) -> Tuple[Params, dict]:
    """Train ALL per-image wrapper models at once (stacked + vmapped)."""
    train = make_pixel_train_fn(wrapper, cfg)
    return jax.jit(jax.vmap(train))(
        stacked_params, px, gt, scribble_mask, random_mask
    )
