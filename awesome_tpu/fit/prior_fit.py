"""The prior-fit engine: one compiled ``lax.scan`` per fit, ``vmap`` over
images, IoU-gated retry — the TPU-native replacement of the reference's
serial per-image fitting (`awesome/model/path_connected_net.py:730-1008`
``_prior_based_pretrain`` / ``_non_prior_based_pretrain`` and the how-to
notebooks' Python training loops).

What the reference does per image — 2000 Adamax steps of
``sigmoid(prior(grid))`` vs. unaries with UnariesWeighted SE,
ReduceLROnPlateau, convexity clip after every step, IoU>=0.5 acceptance
gate with one reset+retry, optional warm start from the previous image —
is here a single jitted program:

- the whole step loop is ``lax.scan`` (no Python per step),
- plateau LR and the NaN guard are scan carry state,
- the convexity projection runs inside the step (clip AFTER the optimizer
  update, matching `path_connected_net.py:950-952`),
- *all images fit simultaneously* under ``vmap`` (stacked param PyTree),
- the IoU gate+retry is a second vmapped pass on reinitialized params with
  a ``tree_where`` select — no host round trips.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from awesome_tpu.core import tree as T
from awesome_tpu.fit import optim
from awesome_tpu.measures.losses import unaries_weight
from awesome_tpu.measures.metrics import iou

Params = Any


@dataclasses.dataclass(frozen=True)
class FitConfig:
    """Static configuration of a prior fit (hashable -> jit cache key).

    Defaults mirror `awesome/model/path_connected_net.py:756-767` and the
    joint FBMS config.
    """

    num_steps: int = 2000
    lr: float = 1e-3
    optimizer: str = "adamax"  # 'adamax' | 'adam'
    flow_weight_decay: float = 1e-5
    use_sigmoid: bool = True
    weight_mode: str = "none"  # unaries_weight mode; 'howto' uses fg_weight
    fg_weight: Optional[float] = None  # how-to fg/bg weighting (cell 9)
    plateau_patience: int = 200
    plateau_factor: float = 0.5
    # LR watchdog: when the plateau scale decays below this, updates freeze —
    # the in-scan equivalent of LearningRateStopTrainingWatchdog
    # (`awesome/event/watchdogs/learning_rate_stop_training_watchdog.py:64`).
    lr_stop_scale: float = 0.0
    nan_guard: bool = True
    # also verify every gradient leaf is finite before applying the update
    # (a finite loss with Inf grads — exp overflow in an unbounded flow —
    # would otherwise poison the scan). ~50 extra reductions per step;
    # disable for tanh-bounded flows where loss-finiteness suffices.
    nan_guard_grads: bool = True
    gate_threshold: Optional[float] = None  # IoU acceptance gate
    gate_retries: int = 1
    dtype: Any = jnp.float32
    # scan unrolling amortizes the fixed per-iteration overhead that
    # dominates this latency-bound step (measured +8% at 8 on TPU).
    # Default 1: compile time grows with the factor (matters for CPU test
    # runs); production fits set 4-8.
    unroll: int = 1
    # Opt-in mixed precision: run the model forward/backward in bf16
    # (MXU-native, ~2x rate) while keeping master params, optimizer state
    # and the loss in f32. Flow exp-scales stay bounded (tanh) so bf16 is
    # safe there; expect ~1e-2 softer mask boundaries.
    compute_dtype: Any = None  # e.g. jnp.bfloat16
    # Opt-in fused Pallas step (ops/pallas_flagship): whole loss+grad in
    # one kernel. Measured 1.9x the XLA path for SINGLE-image fits on the
    # TPU (latency-bound there); large vmapped batches stay faster on the
    # XLA path (its per-op overhead amortizes over the batch), so this is
    # a per-call choice, not a default. TPU-only; flagship models only.
    fused: bool = False


def make_point_weights(
    target_points: jnp.ndarray,
    cfg: FitConfig,
    point_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Precompute per-point loss weights W so loss = sum(W * se).

    Two reference schemes collapse into one weighted sum:
    - UnariesWeightedLoss(mode) with mean reduction -> W = class_w / N
      (`awesome/measures/unaries_weighted_loss.py:34`),
    - the how-to fg_weight scheme -> W = fg_w/fg_count on fg points and
      (1-fg_w)/bg_count on bg (`notebooks/how_to/convexity.ipynb` cell 9).

    ``point_mask`` (N,) bool: bucket-padded points get weight 0 and are
    excluded from every count/normalization, so a padded heterogeneous
    batch computes EXACTLY the unpadded per-image loss (the reference is
    shape-agnostic per image,
    `awesome/dataset/convexity_segmentation_dataset.py:178-246`).
    """
    t = target_points
    m = None
    if point_mask is not None:
        m = jnp.broadcast_to(
            point_mask.astype(cfg.dtype).reshape(t.shape[:-1] + (1,)), t.shape
        )
    if cfg.fg_weight is not None:
        is_bg = (t >= 0.5).astype(cfg.dtype)
        if m is not None:
            is_bg = is_bg * m
            not_bg = (1.0 - (t >= 0.5).astype(cfg.dtype)) * m
        else:
            not_bg = 1.0 - is_bg
        bg_count = jnp.maximum(is_bg.sum(), 1.0)
        fg_count = jnp.maximum(not_bg.sum(), 1.0)
        w = jnp.where(
            (t >= 0.5),
            (1.0 - cfg.fg_weight) / bg_count,
            cfg.fg_weight / fg_count,
        )
        return w if m is None else w * m
    w = unaries_weight(t, mode=cfg.weight_mode, mask=m)
    if m is None:
        return w / t.size
    return w / jnp.maximum(m.sum(), 1.0)


def _optim_fns(cfg: FitConfig):
    if cfg.optimizer == "adamax":
        return optim.adamax_init, optim.adamax_update
    if cfg.optimizer == "adam":
        return optim.adam_init, optim.adam_update
    raise ValueError(f"Unknown optimizer {cfg.optimizer}")


def make_weight_decay_tree(model, params: Params, cfg: FitConfig) -> Params:
    """Flow leaves get ``flow_weight_decay``, everything else 0 — the
    reference's optimizer param groups (`path_connected_net.py:913-918`)."""
    if hasattr(model, "param_groups"):
        groups = model.param_groups(params)
        return jax.tree_util.tree_map(
            lambda s: cfg.flow_weight_decay if s == "flow" else 0.0, groups
        )
    return jax.tree_util.tree_map(lambda _: 0.0, params)


def make_fit_fn(
    model,
    cfg: FitConfig,
    loss_fn: Optional[Callable] = None,
) -> Callable:
    """Build ``fit(params, points, target_points) -> (params, aux)``.

    ``points``: (N, C) coordinate matrix; ``target_points``: (N, 1) unaries.
    ``loss_fn(params, points, target, weights) -> scalar`` may override the
    default weighted-SE-on-sigmoid objective.
    """
    if cfg.fused and loss_fn is None:
        from awesome_tpu.fit.fused_fit import make_fused_fit_fn

        return make_fused_fit_fn(model, cfg)
    init_fn, update_fn = _optim_fns(cfg)

    if loss_fn is None:

        def loss_fn(params, points, target, weights):
            if cfg.compute_dtype is not None:
                cparams = jax.tree_util.tree_map(
                    lambda p: p.astype(cfg.compute_dtype), params
                )
                out = model.apply(
                    cparams, points.astype(cfg.compute_dtype)
                ).astype(jnp.float32)
            else:
                out = model.apply(params, points)
            prob = jax.nn.sigmoid(out) if cfg.use_sigmoid else out
            return jnp.sum(weights * (prob - target) ** 2)

    has_clip = hasattr(model, "enforce_convexity")

    def fit(params, points, target_points, active=True, point_mask=None):
        weights = make_point_weights(target_points, cfg, point_mask)
        wd_tree = make_weight_decay_tree(model, params, cfg)
        opt_state = init_fn(params)
        sched = optim.plateau_init(cfg.dtype)
        vg = jax.value_and_grad(loss_fn)

        def step(carry, _):
            params, opt_state, sched = carry
            loss, grads = vg(params, points, target_points, weights)
            lr = cfg.lr * sched.scale
            new_params, new_opt = update_fn(
                params, grads, opt_state, lr, weight_decay=wd_tree
            )
            if has_clip:
                new_params = model.enforce_convexity(new_params)
            if cfg.nan_guard:
                # Reference merely raises on NaN loss
                # (`path_connected_net.py:949`); skipping the bad step is
                # the compiled-loop equivalent of "abort at current state".
                ok = jnp.isfinite(loss)
                if cfg.nan_guard_grads:
                    grads_ok = jax.tree_util.tree_reduce(
                        jnp.logical_and,
                        jax.tree_util.tree_map(
                            lambda g: jnp.all(jnp.isfinite(g)), grads
                        ),
                        jnp.asarray(True),
                    )
                    ok = jnp.logical_and(ok, grads_ok)
            else:
                ok = jnp.asarray(True)
            if cfg.lr_stop_scale > 0.0:
                ok = jnp.logical_and(ok, sched.scale > cfg.lr_stop_scale)
            ok = jnp.logical_and(ok, active)
            params = T.tree_where(ok, new_params, params)
            opt_state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new_opt, opt_state
            )
            sched = optim.plateau_update(
                sched,
                loss,
                factor=cfg.plateau_factor,
                patience=cfg.plateau_patience,
            )
            return (params, opt_state, sched), loss

        (params, _, sched), loss_hist = jax.lax.scan(
            step, (params, opt_state, sched), None, length=cfg.num_steps,
            unroll=min(cfg.unroll, cfg.num_steps),
        )
        return params, {"loss_hist": loss_hist, "lr_scale": sched.scale}

    return fit


def fit_prior(
    model,
    params: Params,
    points: jnp.ndarray,
    target_points: jnp.ndarray,
    cfg: FitConfig,
    loss_fn: Optional[Callable] = None,
) -> Tuple[Params, dict]:
    """Single-image prior fit (jitted on first call per shape)."""
    fit = make_fit_fn(model, cfg, loss_fn)
    return jax.jit(fit, static_argnames=())(params, points, target_points)


def _gate_iou(model, params, points, target_points, cfg: FitConfig,
              point_mask=None):
    """Acceptance IoU: thresholded prior vs. thresholded unaries, computed
    against foreground (fg encoded as 0 -> invert), matching
    `path_connected_net.py:784-786,964-969`. Padded points are forced to
    agree as background so they contribute to neither intersection nor
    union of the fg IoU."""
    out = model.apply(params, points)
    prob = jax.nn.sigmoid(out) if cfg.use_sigmoid else out
    target = target_points
    if point_mask is not None:
        m = point_mask.reshape(target.shape[:-1] + (1,))
        prob = jnp.where(m, prob, 1.0)
        target = jnp.where(m, target, 1.0)
    return iou(prob > 0.5, target > 0.5, invert=True)


def make_batched_fit_fn(
    model,
    cfg: FitConfig,
    per_image_points: bool = False,
    with_point_masks: bool = False,
    loss_fn: Optional[Callable] = None,
) -> Callable:
    """Build the REUSABLE batched fit ``fit(stacked_params, points,
    stacked_targets, valid_mask=None, retry_keys=None, point_masks=None)
    -> (fitted, aux)`` — jitted ONCE, so repeated calls (e.g. chunked
    sweeps over a big dataset) hit the trace cache instead of re-tracing
    per call. ``fit_priors_batched`` is the one-shot convenience wrapper.

    Includes the IoU acceptance gate + fresh-init retry when
    ``cfg.gate_threshold`` is set (`path_connected_net.py:964-982`).
    """
    fit = make_fit_fn(model, cfg, loss_fn)
    pts_ax = 0 if per_image_points else None
    in_axes = (0, pts_ax, 0, 0) + ((0,) if with_point_masks else ())
    vfit = jax.jit(jax.vmap(fit, in_axes=in_axes))
    gate_retry = make_gate_retry_fn(
        model, cfg, per_image_points=per_image_points,
        with_point_masks=with_point_masks, loss_fn=loss_fn,
    )

    def run(stacked_params, points, stacked_targets, valid_mask=None,
            retry_keys=None, point_masks=None):
        batch = stacked_targets.shape[0]
        if valid_mask is None:
            valid_mask = jnp.ones((batch,), dtype=bool)
        mask_args = (point_masks,) if with_point_masks else ()
        fitted, aux = vfit(stacked_params, points, stacked_targets,
                           valid_mask, *mask_args)
        gate = jnp.ones((batch,), dtype=bool)
        if cfg.gate_threshold is not None:
            fitted, scores = gate_retry(
                fitted, points, stacked_targets, valid_mask,
                retry_keys=retry_keys, point_masks=point_masks,
            )
            aux["gate_iou"] = scores
            gate = scores >= cfg.gate_threshold
        aux["gate_pass"] = gate
        aux["valid"] = valid_mask
        return fitted, aux

    return run


def make_gate_retry_fn(
    model,
    cfg: FitConfig,
    per_image_points: bool = False,
    with_point_masks: bool = False,
    loss_fn: Optional[Callable] = None,
) -> Callable:
    """Build the reusable acceptance gate + retry:
    ``gr(fitted, points, targets, valid_mask, retry_keys=None,
    point_masks=None) -> (fitted, scores)``.

    Scores every fit's masked gate IoU against ``cfg.gate_threshold``
    (NaN scores count as FAILED — ``>=`` is False for NaN) and, when
    ``retry_keys`` are given, refits failures from FRESH inits at the
    full ``cfg.num_steps`` in one vmapped pass, keeping the retry result
    (the reference keeps the last attempt,
    `path_connected_net.py:964-982`). Shared by the batched and the
    sequential (reuse_state) pretrain paths.
    """
    pts_ax = 0 if per_image_points else None
    in_axes = (0, pts_ax, 0, 0) + ((0,) if with_point_masks else ())
    gate_axes = (0, pts_ax, 0) + ((0,) if with_point_masks else ())
    vgate = jax.jit(jax.vmap(
        lambda p, x, t, *m: _gate_iou(model, p, x, t, cfg, *m),
        in_axes=gate_axes,
    ))
    refit_cfg = dataclasses.replace(cfg, gate_threshold=None)
    refit = make_fit_fn(model, refit_cfg, loss_fn)
    vrefit = jax.jit(jax.vmap(refit, in_axes=in_axes))
    vinit = jax.jit(jax.vmap(model.init))

    def gr(fitted, points, stacked_targets, valid_mask, retry_keys=None,
           point_masks=None):
        mask_args = (point_masks,) if with_point_masks else ()
        scores = vgate(fitted, points, stacked_targets, *mask_args)
        if retry_keys is None or cfg.gate_retries <= 0 or (
            cfg.gate_threshold is None
        ):
            return fitted, scores
        gate = scores >= cfg.gate_threshold
        failed = jnp.logical_and(~gate, valid_mask)
        fresh = vinit(retry_keys)
        refitted, _ = vrefit(
            fresh, points, stacked_targets, failed, *mask_args
        )
        retry_scores = vgate(refitted, points, stacked_targets, *mask_args)
        # keep the retry only where it actually ran; prefer it even if
        # still under threshold (reference keeps the last attempt).
        take_retry = failed
        fitted = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                take_retry.reshape((-1,) + (1,) * (new.ndim - 1)),
                new, old,
            ),
            refitted,
            fitted,
        )
        return fitted, jnp.where(take_retry, retry_scores, scores)

    return gr


def fit_priors_batched(
    model,
    stacked_params: Params,
    points: jnp.ndarray,
    stacked_targets: jnp.ndarray,
    cfg: FitConfig,
    retry_keys: Optional[jax.Array] = None,
    valid_mask: Optional[jnp.ndarray] = None,
    loss_fn: Optional[Callable] = None,
    point_masks: Optional[jnp.ndarray] = None,
) -> Tuple[Params, dict]:
    """Fit ALL images' priors in one compiled program.

    - ``stacked_params``: PyTree with leading image axis (see
      ``core.tree.stack_trees``) — replaces the PriorCache + serial
      ``load_state_dict`` swap (`awesome/dataset/prior_dataset.py:96-110`).
    - ``points``: shared (N, C) grid, or (B, N, C) per-image grids.
    - ``stacked_targets``: (B, N, 1) unaries.
    - ``valid_mask``: (B,) bool; images whose unaries are single-valued are
      skipped (params pass through), matching `path_connected_net.py:848-855`.
    - ``retry_keys``: (B,) PRNG keys enabling the IoU-gated reset+retry
      (`path_connected_net.py:964-982`) as one extra vmapped pass.
    - ``point_masks``: (B, N) bool for bucket-padded heterogeneous sizes —
      padded points carry loss weight 0 and are excluded from the gate IoU.

    Builds the engine fresh each call; for repeated same-shape calls use
    :func:`make_batched_fit_fn` once.
    """
    run = make_batched_fit_fn(
        model, cfg,
        per_image_points=points.ndim == 3,
        with_point_masks=point_masks is not None,
        loss_fn=loss_fn,
    )
    return run(stacked_params, points, stacked_targets,
               valid_mask=valid_mask, retry_keys=retry_keys,
               point_masks=point_masks)


def fit_multi_object_priors(
    child_model,
    stacked_children: Params,  # (B, K, ...) child param tree
    points: jnp.ndarray,  # (N, C) shared or (B, N, C) per-image
    per_object_targets: jnp.ndarray,  # (B, K, N, 1) per-object unaries
    cfg: FitConfig,
    retry_keys: Optional[jax.Array] = None,  # (B, K) keys
    valid_mask: Optional[jnp.ndarray] = None,  # (B, K) bool
    loss_fn: Optional[Callable] = None,
    point_masks: Optional[jnp.ndarray] = None,  # (B, N) bool
) -> Tuple[Params, dict]:
    """Fit N objects per image SIMULTANEOUSLY: the (image x object) axes
    flatten into one batch for the vmapped engine — the TPU replacement of
    the reference's per-object Python loop in
    `awesome/model/multiple_object_aware_path_connected_net.py:24-68`
    (each child prior fit serially against its object's unaries).

    ``stacked_children`` is a ``MultiPriorModule.init(...)['children']``
    tree with an extra leading image axis (e.g. from
    ``jax.vmap(mp.init)``); inactive object slots pass ``valid_mask``
    False (params pass through untouched, matching ``assure_prior_count``
    growth: newly grown slots simply join the next fit call).
    """
    b, k = per_object_targets.shape[:2]

    def flat(x):
        return x.reshape((b * k,) + x.shape[2:])

    flat_children = jax.tree_util.tree_map(flat, stacked_children)
    flat_targets = flat(per_object_targets)
    if points.ndim == 3:
        pts = jnp.repeat(points, k, axis=0)  # (B*K, N, C)
    else:
        pts = points
    flat_pmasks = (
        jnp.repeat(point_masks, k, axis=0) if point_masks is not None
        else None
    )
    fitted, aux = fit_priors_batched(
        child_model,
        flat_children,
        pts,
        flat_targets,
        cfg,
        retry_keys=retry_keys.reshape(b * k, -1)
        if retry_keys is not None
        else None,
        valid_mask=valid_mask.reshape(b * k)
        if valid_mask is not None
        else None,
        loss_fn=loss_fn,
        point_masks=flat_pmasks,
    )
    unflat = jax.tree_util.tree_map(
        lambda x: x.reshape((b, k) + x.shape[1:]), fitted
    )
    aux = {
        key: (v.reshape((b, k) + v.shape[1:]) if hasattr(v, "reshape")
              and v.shape[:1] == (b * k,) else v)
        for key, v in aux.items()
    }
    return unflat, aux


def make_sequential_fit_fn(
    model,
    cfg: FitConfig,
    warm_cfg: Optional[FitConfig] = None,
    loss_fn: Optional[Callable] = None,
) -> Callable:
    """Build the reusable sequential (reuse_state) fit:
    ``fit(init_params, points, stacked_targets, valid_mask=None) ->
    (stacked_params, aux)``. Build ONCE and call many times — every call
    of the convenience wrapper :func:`fit_priors_sequential` rebuilds the
    closures and re-traces (the trace + remote-compile round trip can
    dominate the actual fit time on the tunneled chip)."""
    warm_cfg = warm_cfg or dataclasses.replace(cfg, num_steps=200)
    cold_fit = jax.jit(make_fit_fn(model, cfg, loss_fn))
    warm_fit = make_fit_fn(model, warm_cfg, loss_fn)

    def body(carry, xs):
        prev = carry
        target, valid, pts = xs[:3]
        mask_args = xs[3:]
        fitted, aux = warm_fit(prev, pts, target, valid, *mask_args)
        carry = T.tree_where(valid, fitted, prev)
        return carry, (fitted, aux["lr_scale"])

    @jax.jit
    def warm_sweep(params0, targets, valid, pts, *mask_args):
        # the whole warm-start sweep is ONE compiled program — a bare
        # lax.scan outside jit would dispatch every step op eagerly
        # (measured 25x slower before this was jitted)
        return jax.lax.scan(body, params0, (targets, valid, pts) + mask_args)

    def fit(init_params, points, stacked_targets, valid_mask=None,
            point_masks=None):
        batch = stacked_targets.shape[0]
        if valid_mask is None:
            valid_mask = jnp.ones((batch,), dtype=bool)
        per_image_points = points.ndim == 3
        pts0 = points[0] if per_image_points else points
        cold_mask = (point_masks[0],) if point_masks is not None else ()
        params0, aux0 = cold_fit(
            init_params, pts0, stacked_targets[0], valid_mask[0], *cold_mask
        )
        if batch > 1:
            rest_pts = (
                points[1:]
                if per_image_points
                else jnp.broadcast_to(points, (batch - 1,) + points.shape)
            )
            rest_masks = (
                (point_masks[1:],) if point_masks is not None else ()
            )
            _, (rest_params, rest_scale) = warm_sweep(
                params0, stacked_targets[1:], valid_mask[1:], rest_pts,
                *rest_masks
            )
            stacked = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a[None], b], axis=0),
                params0,
                rest_params,
            )
        else:
            stacked = jax.tree_util.tree_map(lambda a: a[None], params0)
            rest_scale = jnp.zeros((0,))
        return stacked, {"first_aux": aux0, "warm_lr_scale": rest_scale}

    return fit


def fit_priors_sequential(
    model,
    init_params: Params,
    points: jnp.ndarray,
    stacked_targets: jnp.ndarray,
    cfg: FitConfig,
    warm_cfg: Optional[FitConfig] = None,
    valid_mask: Optional[jnp.ndarray] = None,
    loss_fn: Optional[Callable] = None,
    point_masks: Optional[jnp.ndarray] = None,
) -> Tuple[Params, dict]:
    """Reference-faithful *sequential* fit with warm-start carry
    (``reuse_state`` semantics, `path_connected_net.py:869-875`): image 0
    gets a full cold fit; each later image starts from the previous fitted
    state and runs ``warm_cfg.num_steps`` (reuse_state_epochs). The whole
    sweep is ONE compiled scan over images.

    Returns the stacked per-image fitted params and aux. For repeated
    calls, build :func:`make_sequential_fit_fn` once instead.
    """
    fit = make_sequential_fit_fn(model, cfg, warm_cfg, loss_fn)
    return fit(init_params, points, stacked_targets, valid_mask, point_masks)


# --- prefits -------------------------------------------------------------


def apply_prefits(
    model,
    params: Params,
    points: jnp.ndarray,
    prefit_flow_identity: bool = False,
    flow_identity_lr: float = 1e-2,
    flow_identity_weight_decay: float = 1e-5,
    flow_identity_steps: int = 100,
    prefit_convex: bool = False,
    convex_mode: str = "circle",
    convex_target: Optional[jnp.ndarray] = None,
    grid_shape: Optional[Tuple[int, int]] = None,
    convex_lr: float = 1e-3,
    convex_weight_decay: float = 0.0,
    convex_steps: int = 200,
    zoo=None,
    zoo_key: Optional[str] = None,
) -> Params:
    """The reference's warm-start prefits as ONE entry point (shared by
    the FBMS and the generic pretrain paths): flow ~ identity on the grid
    (Zoo-cached under ``zoo_key``) and the ICNN on a circle approximation
    or the unaries. Spec: `awesome/model/path_connected_net.py:155-390` +
    the Zoo round trip at `:873-882`. Returns params with updated flow /
    convex subtrees; models without those parts pass through untouched.
    """
    supports = hasattr(model, "flow_net") and hasattr(model, "convex_net")
    if not supports:
        return params
    if prefit_flow_identity:
        name = zoo_key or f"flow_identity_{points.shape}_0"
        cached = None
        if zoo is not None:
            cached, _ = zoo.load_model_state(
                name, model.flow_net, params["flow"]
            )
            if cached is not None:
                params = dict(params, flow=cached)
        if cached is None:
            params, _ = learn_flow_identity(
                model, params, points,
                lr=flow_identity_lr,
                weight_decay=flow_identity_weight_decay,
                max_iter=flow_identity_steps,
            )
            if zoo is not None:
                zoo.save_model_state(name, model.flow_net, params["flow"])
    if prefit_convex and convex_target is not None:
        params, _ = learn_convex_net(
            model, params, points, convex_target,
            mode=convex_mode, grid_shape=grid_shape,
            lr=convex_lr, weight_decay=convex_weight_decay,
            max_iter=convex_steps,
        )
    return params


def learn_flow_identity(
    model,
    params: Params,
    points: jnp.ndarray,
    lr: float = 1e-2,
    weight_decay: float = 1e-5,
    max_iter: int = 100,
) -> Tuple[Params, jnp.ndarray]:
    """Prefit the flow (incl. norm wrap) to the identity on the grid.

    Spec: `awesome/model/path_connected_net.py:155-251` — SE loss between
    flow(x) and x, Adamax(lr, wd). Operates on the 'flow' (and norm) part of
    a PathConnectedNet param tree; returns full params with updated flow.
    """

    def flow_apply(flow_params, x):
        if model.norm is not None:
            x_in = model.norm.transform(x)
        else:
            x_in = x
        y = model.flow_net.apply(flow_params, x_in)
        if model.norm is not None:
            y = model.norm.inverse_transform(y)
        return y

    def loss_fn(flow_params, x):
        return jnp.mean((flow_apply(flow_params, x) - x) ** 2)

    opt_state = optim.adamax_init(params["flow"])
    wd = jax.tree_util.tree_map(lambda _: weight_decay, params["flow"])
    vg = jax.value_and_grad(loss_fn)

    def step(carry, _):
        fp, opt_state = carry
        loss, grads = vg(fp, points)
        ok = jnp.isfinite(loss)
        new_fp, new_opt = optim.adamax_update(fp, grads, opt_state, lr,
                                              weight_decay=wd)
        fp = T.tree_where(ok, new_fp, fp)
        opt_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), new_opt, opt_state
        )
        return (fp, opt_state), loss

    @jax.jit
    def run(fp, opt_state):
        return jax.lax.scan(step, (fp, opt_state), None, length=max_iter)

    (flow_params, _), hist = run(params["flow"], opt_state)
    return dict(params, flow=flow_params), hist


def learn_convex_net(
    model,
    params: Params,
    points: jnp.ndarray,
    target_points: jnp.ndarray,
    mode: str = "circle",
    use_deformed_grid: bool = True,
    grid_shape: Optional[Tuple[int, int]] = None,
    lr: float = 1e-3,
    weight_decay: float = 0.0,
    max_iter: int = 200,
) -> Tuple[Params, jnp.ndarray]:
    """Prefit the ICNN on a circle approximation (or the unaries) evaluated
    on the *deformed* grid. Spec: `path_connected_net.py:307-390`.

    ``target_points``: (N, 1) unaries; for mode='circle' a circle matching
    the fg area/center-of-mass is built (needs ``grid_shape``).
    """
    from awesome_tpu.core.grids import unary_circle_approximation

    if mode == "circle":
        if grid_shape is None:
            raise ValueError("grid_shape required for circle mode")
        fg = 1.0 - target_points.reshape(grid_shape)  # fg encoded as 0
        circle = unary_circle_approximation(fg)
        y = (1.0 - circle.astype(points.dtype)).reshape(-1, 1)
    elif mode == "unaries":
        y = target_points
    else:
        raise ValueError("Mode must be either 'circle' or 'unaries'!")

    x = (
        jax.lax.stop_gradient(model.deformation(params, points))
        if use_deformed_grid
        else points
    )

    def loss_fn(cp, x_, y_):
        prob = jax.nn.sigmoid(model.convex_net.apply(cp, x_))
        return jnp.mean((prob - y_) ** 2)

    opt_state = optim.adam_init(params["convex"])
    wd = jax.tree_util.tree_map(lambda _: weight_decay, params["convex"])
    vg = jax.value_and_grad(loss_fn)

    def step(carry, _):
        cp, opt_state = carry
        loss, grads = vg(cp, x, y)
        ok = jnp.isfinite(loss)
        new_cp, new_opt = optim.adam_update(cp, grads, opt_state, lr,
                                            weight_decay=wd)
        new_cp = model.convex_net.enforce_convexity(new_cp)
        cp = T.tree_where(ok, new_cp, cp)
        opt_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), new_opt, opt_state
        )
        return (cp, opt_state), loss

    @jax.jit
    def run(cp, opt_state):
        return jax.lax.scan(step, (cp, opt_state), None, length=max_iter)

    (convex_params, _), hist = run(params["convex"], opt_state)
    return dict(params, convex=convex_params), hist
