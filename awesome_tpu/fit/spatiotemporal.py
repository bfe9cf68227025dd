"""Spatio-temporal prior fitting: ONE shared (x, y, t) prior for a whole
video sequence.

Behavior port of `awesome/model/path_connected_net.py:511-722`
``_non_prior_based_pretrain``: per epoch, iterate the frames (batch 1) and
take one Adamax step per frame against that frame's weak unaries
(UnariesWeighted SE), convexity clip after every step, ReduceLROnPlateau
on the epoch loss. The spatio-temporal net sees (x, y, t/t_max) points, so
temporal connectedness is enforced by the same architecture that enforces
spatial connectedness (SURVEY.md §5.7).

TPU design: the epoch x frame double loop is one ``lax.scan`` over epochs
with an inner scan over frames — a single compiled program. Sparse weak
labels arrive as dense (T, N, 1) unaries + (T, N) labeled masks; unlabeled
points get weight 0. The frame axis is also the natural mesh 'grid'
sharding axis for long sequences (points independent through the MLP).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from awesome_tpu.core import tree as T
from awesome_tpu.fit import optim
from awesome_tpu.fit.prior_fit import FitConfig, make_weight_decay_tree
from awesome_tpu.measures.losses import unaries_weight

Params = Any


def make_frame_weights(targets, labeled, cfg: FitConfig):
    """(T, N, 1) unaries + (T, N) labeled -> per-point weights with class
    balancing computed per frame over labeled points only."""

    def one(t, lab):
        w = unaries_weight(t[:, 0], mode=cfg.weight_mode)
        w = w * lab.astype(t.dtype)
        return (w / jnp.maximum(lab.sum(), 1.0))[:, None]

    return jax.vmap(one)(targets, labeled)


def make_spatiotemporal_fit_fn(
    model,
    cfg: FitConfig,
    num_epochs: Optional[int] = None,
):
    """Build the reusable jitted spatio-temporal fit:
    ``fit(params, frame_points, frame_targets, labeled_masks) ->
    (params, aux)``. Build ONCE for repeated fits — the convenience
    wrapper below re-traces per call."""
    epochs = num_epochs if num_epochs is not None else cfg.num_steps

    init_fn, update_fn = (
        (optim.adamax_init, optim.adamax_update)
        if cfg.optimizer == "adamax"
        else (optim.adam_init, optim.adam_update)
    )
    has_clip = hasattr(model, "enforce_convexity")

    def loss_fn(p, pts, tgt, w):
        prob = jax.nn.sigmoid(model.apply(p, pts))
        return jnp.sum(w * (prob - tgt) ** 2)

    vg = jax.value_and_grad(loss_fn)

    def fit(params, frame_points, frame_targets, labeled_masks=None):
        t_frames = frame_targets.shape[0]
        if labeled_masks is None:
            labeled_masks = jnp.ones(frame_targets.shape[:2], bool)
        weights = make_frame_weights(frame_targets, labeled_masks, cfg)
        wd_tree = make_weight_decay_tree(model, params, cfg)
        pts = (
            frame_points
            if frame_points.ndim == 3
            else jnp.broadcast_to(
                frame_points, (t_frames,) + frame_points.shape
            )
        )

        def frame_step(carry, xs):
            p, opt_state, sched = carry
            fpts, tgt, w = xs
            loss, grads = vg(p, fpts, tgt, w)
            lr = cfg.lr * sched.scale
            new_p, new_opt = update_fn(p, grads, opt_state, lr,
                                       weight_decay=wd_tree)
            if has_clip:
                new_p = model.enforce_convexity(new_p)
            ok = jnp.isfinite(loss)
            p = T.tree_where(ok, new_p, p)
            opt_state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new_opt, opt_state
            )
            return (p, opt_state, sched), loss

        def epoch_step(carry, _):
            p, opt_state, sched = carry
            (p, opt_state, sched), losses = jax.lax.scan(
                frame_step, (p, opt_state, sched),
                (pts, frame_targets, weights),
            )
            epoch_loss = losses.mean()
            sched = optim.plateau_update(
                sched, epoch_loss, factor=cfg.plateau_factor,
                patience=cfg.plateau_patience,
            )
            return (p, opt_state, sched), epoch_loss

        opt_state = init_fn(params)
        sched = optim.plateau_init()
        (params, _, sched), epoch_losses = jax.lax.scan(
            epoch_step, (params, opt_state, sched), None, length=epochs
        )
        return params, {"epoch_loss": epoch_losses, "lr_scale": sched.scale}

    return jax.jit(fit)


def fit_spatiotemporal_prior(
    model,
    params: Params,
    frame_points: jnp.ndarray,  # (T, N, 3) or (N, 3) shared
    frame_targets: jnp.ndarray,  # (T, N, 1)
    labeled_masks: Optional[jnp.ndarray],  # (T, N) bool
    cfg: FitConfig,
    num_epochs: Optional[int] = None,
) -> Tuple[Params, dict]:
    """Returns (fitted shared params, aux with per-epoch loss). For
    repeated fits build :func:`make_spatiotemporal_fit_fn` once."""
    fit = make_spatiotemporal_fit_fn(model, cfg, num_epochs)
    return fit(params, frame_points, frame_targets, labeled_masks)


def sequence_points(
    shape: Tuple[int, int], num_frames: int, dtype=jnp.float32
) -> jnp.ndarray:
    """(T, H*W, 3) (x, y, t/t_max) point matrices for a sequence."""
    from awesome_tpu.core import grids as G

    h, w = shape
    t_max = max(num_frames - 1, 1)
    frames = []
    for t in range(num_frames):
        g = G.positional_grid(w, h, t=float(t), t_max=float(t_max),
                              dtype=dtype)
        frames.append(G.flatten_grid(g[None]))
    return jnp.stack(frames)
