"""Fused flagship fit engine: the whole fit step = ONE Pallas kernel
(fwd+bwd+loss, `awesome_tpu.ops.pallas_flagship`) + an Adamax update over
the handful of packed buffers + plateau/NaN-guard scalars.

Semantics mirror :func:`awesome_tpu.fit.prior_fit.make_fit_fn` exactly
(Adamax with flow weight-decay group, ReduceLROnPlateau, convexity clip
AFTER the step, NaN-guard skip, LR-watchdog freeze) — the only change is
HOW the loss/grad is computed: one kernel launch instead of ~150 serial
XLA ops, which removes the per-op issue overhead that bounds the XLA
path's step time (docs/design.md perf notes).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from awesome_tpu.fit import optim
from awesome_tpu.fit.prior_fit import FitConfig, make_point_weights
from awesome_tpu.ops.pallas_flagship import (
    flagship_supported,
    make_flagship_loss_grad,
    pack_flagship,
    packed_enforce_convexity,
    packed_weight_decay,
    unpack_flagship,
)

Params = Any


def make_fused_fit_fn(
    model,
    cfg: FitConfig,
    interpret: Optional[bool] = None,
    tile_n: Optional[int] = None,
) -> Callable:
    """Build ``fit(params, points, target_points, active=True) ->
    (params, aux)`` with the fused kernel. Same contract as
    ``prior_fit.make_fit_fn`` (standard param trees in and out).

    ``interpret=None`` auto-selects: compiled on TPU, Pallas interpreter
    elsewhere (so ``FitConfig(fused=True)`` is safe in CPU tests)."""
    if not flagship_supported(model):
        raise ValueError("model not supported by the fused flagship kernel")
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    kwargs = {"interpret": interpret}
    if tile_n is not None:
        kwargs["tile_n"] = tile_n
    if cfg.compute_dtype is not None:
        kwargs["use_bf16"] = True  # bf16 matmul inputs, f32 accum/master
    fused = make_flagship_loss_grad(model, use_sigmoid=cfg.use_sigmoid,
                                    **kwargs)
    init_fn, update_fn = {
        "adamax": (optim.adamax_init, optim.adamax_update),
        "adam": (optim.adam_init, optim.adam_update),
    }[cfg.optimizer]

    def fit(params, points, target_points, active=True, point_mask=None):
        weights = make_point_weights(target_points, cfg, point_mask)
        packed = pack_flagship(model, params)
        wd = packed_weight_decay(packed, cfg.flow_weight_decay)
        opt_state = init_fn(packed)
        sched = optim.plateau_init(cfg.dtype)

        def step(carry, _):
            packed, opt_state, sched = carry
            loss, grads = fused(packed, points, target_points, weights)
            lr = cfg.lr * sched.scale
            new_packed, new_opt = update_fn(
                packed, grads, opt_state, lr, weight_decay=wd
            )
            new_packed = packed_enforce_convexity(new_packed)
            ok = jnp.isfinite(loss) if cfg.nan_guard else jnp.asarray(True)
            if cfg.lr_stop_scale > 0.0:
                ok = jnp.logical_and(ok, sched.scale > cfg.lr_stop_scale)
            ok = jnp.logical_and(ok, active)
            packed = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new_packed, packed
            )
            opt_state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new_opt, opt_state
            )
            sched = optim.plateau_update(
                sched, loss,
                factor=cfg.plateau_factor, patience=cfg.plateau_patience,
            )
            return (packed, opt_state, sched), loss

        (packed, _, sched), loss_hist = jax.lax.scan(
            step, (packed, opt_state, sched), None, length=cfg.num_steps,
            unroll=min(cfg.unroll, cfg.num_steps),
        )
        return unpack_flagship(model, packed), {
            "loss_hist": loss_hist, "lr_scale": sched.scale,
        }

    return fit


def make_grouped_fused_fit_fn(
    model,
    cfg: FitConfig,
    group: int,
    interpret: Optional[bool] = None,
    tile_n: Optional[int] = None,
    interleave: bool = False,
) -> Callable:
    """Grouped fused fit: ``fit(stacked_params, points, stacked_targets,
    active=True) -> (stacked_params, aux)`` where the leading axis has
    length ``group`` and ALL images share one kernel program per step —
    amortizing the fixed per-program cost that bounds small tiles.

    ``interleave=True`` uses the alternating-chain rematerializing kernel
    (`ops/pallas_flagship.py:_kernel_interleaved`): the group members'
    independent matmul chains pipeline on the MXU and the full tile fits
    per member — the full-resolution PAIRED-fit throughput path.

    Semantics deviation vs the per-image engines: the plateau scheduler
    and NaN guard act on the MEAN loss of the group (one LR for the
    group); per-image losses are still returned in ``aux['loss_hist']``
    (steps, G)."""
    if not flagship_supported(model):
        raise ValueError("model not supported by the fused flagship kernel")
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    kwargs = {"interpret": interpret, "group": group,
              "interleave": interleave}
    if tile_n is not None:
        kwargs["tile_n"] = tile_n
    if cfg.compute_dtype is not None:
        kwargs["use_bf16"] = True
    fused = make_flagship_loss_grad(model, use_sigmoid=cfg.use_sigmoid,
                                    **kwargs)
    init_fn, update_fn = {
        "adamax": (optim.adamax_init, optim.adamax_update),
        "adam": (optim.adam_init, optim.adam_update),
    }[cfg.optimizer]

    def fit(stacked_params, points, stacked_targets, active=True,
            point_masks=None):
        if point_masks is None:
            weights = jax.vmap(lambda t: make_point_weights(t, cfg))(
                stacked_targets
            )  # (G, N, 1)
        else:
            weights = jax.vmap(
                lambda t, m: make_point_weights(t, cfg, m)
            )(stacked_targets, point_masks)
        packed = jax.vmap(lambda p: pack_flagship(model, p))(stacked_params)
        wd = packed_weight_decay(packed, cfg.flow_weight_decay)
        opt_state = init_fn(packed)
        sched = optim.plateau_init(cfg.dtype)

        def step(carry, _):
            packed, opt_state, sched = carry
            loss_vec, grads = fused(packed, points, stacked_targets, weights)
            loss = loss_vec.mean()
            lr = cfg.lr * sched.scale
            new_packed, new_opt = update_fn(
                packed, grads, opt_state, lr, weight_decay=wd
            )
            new_packed = packed_enforce_convexity(new_packed)
            ok = (
                jnp.all(jnp.isfinite(loss_vec))
                if cfg.nan_guard else jnp.asarray(True)
            )
            if cfg.lr_stop_scale > 0.0:
                ok = jnp.logical_and(ok, sched.scale > cfg.lr_stop_scale)
            ok = jnp.logical_and(ok, active)
            packed = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new_packed, packed
            )
            opt_state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new_opt, opt_state
            )
            sched = optim.plateau_update(
                sched, loss,
                factor=cfg.plateau_factor, patience=cfg.plateau_patience,
            )
            return (packed, opt_state, sched), loss_vec

        (packed, _, sched), loss_hist = jax.lax.scan(
            step, (packed, opt_state, sched), None, length=cfg.num_steps,
            unroll=min(cfg.unroll, cfg.num_steps),
        )
        fitted = jax.vmap(lambda p: unpack_flagship(model, p))(packed)
        return fitted, {"loss_hist": loss_hist, "lr_scale": sched.scale}

    return fit


def fit_prior_fused(
    model, params: Params, points, target_points, cfg: FitConfig,
    interpret: bool = False,
) -> Tuple[Params, dict]:
    """Single-image fused fit (jitted on first call per shape)."""
    fit = make_fused_fit_fn(model, cfg, interpret=interpret)
    return jax.jit(fit)(params, points, target_points)
