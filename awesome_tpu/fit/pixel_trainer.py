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
from typing import Any, NamedTuple, Optional, Tuple

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
    # extra-penalty scales: AwesomeLoss uses (0.1, 100); the joint loss
    # passes (gamma, beta) from its config
    pen_base_scale: float = 0.1
    pen_align_scale: float = 100.0
    extra_penalty_after: Optional[int] = None  # epoch index or None
    extra_penalty_lr_factor: float = 1.0  # reduce_lr_in_extra_penalty
    plateau_patience: int = 200
    plateau_factor: float = 0.5
    use_plateau: bool = False
    lr_stop_scale: float = 0.0
    nan_guard: bool = True
    # segmentation_training_mode 'none' (`awesome/run/awesome_runner.py:448`
    # exclude_segmentation_model): the seg subtree is excluded from updates.
    train_segmentation: bool = True
    # split_params_in_param_groups + weight_decay_on_weight_norm_modules
    # (`awesome/run/awesome_runner.py:427-444`): decay ONLY weight-norm
    # magnitude leaves ('g') by this factor. 0 = off.
    wn_weight_decay: float = 0.0


class PixelTrainState(NamedTuple):
    """Resumable per-image train state (stack for the vmapped engine).

    Training in SEGMENTS (each one compiled scan over ``segment_len``
    epochs) lets the runner fire the reference's between-epoch handles —
    eval cadence, best-model checks, image dumps, checkpoints
    (`awesome/run/awesome_runner.py:294-475`) — without a per-epoch host
    loop: one host visit per cadence tick, not per epoch.
    """

    params: Params
    opt_state: Any
    sched: Any
    epoch: jnp.ndarray  # absolute epoch counter (int32 scalar per image)


def masked_awesome_loss(
    output,
    target,
    scribble_mask,
    random_mask,
    alpha: float,
    extra_penalty,
    pen_base_scale: float = 0.1,
    pen_align_scale: float = 100.0,
):
    """AwesomeLoss with explicit pixel-role masks (padding-safe).

    output (N, 2): [seg, prior] probabilities; target (N, 1); masks (N,).
    Base: mean-BCE over scribble pixels of seg + alpha * same for prior.
    Extra-penalty phase (`awesome_loss.py:55-61`): pen_base_scale * base +
    pen_align_scale * mean((prior - (seg > .5))^2) over random pixels —
    (0.1, 100) is the classic AwesomeLoss; the JOINT variant passes
    (gamma, beta) from its config (`awesome/measures/awesome_loss_joint.py`).
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
    with_pen = pen_base_scale * base + pen_align_scale * align
    return jnp.where(extra_penalty, with_pen, base)


def _make_pixel_step(wrapper, cfg: PixelTrainConfig, loss_impl=None):
    """One training epoch for one image: (state-tuple, epoch) -> state."""
    _, update_fn = _pixel_optim(cfg)
    if loss_impl is None:

        def loss_impl(params, px, gt, smask, rmask, extra_penalty):
            out = wrapper.apply(params, px)
            return masked_awesome_loss(
                out, gt, smask, rmask, cfg.alpha, extra_penalty,
                pen_base_scale=cfg.pen_base_scale,
                pen_align_scale=cfg.pen_align_scale,
            )

    vg = jax.value_and_grad(loss_impl)
    has_clip = hasattr(wrapper, "enforce_convexity")

    def step(carry, epoch, px, gt, smask, rmask, trainable=True):
        params, opt_state, sched = carry
        extra = (
            epoch >= cfg.extra_penalty_after
            if cfg.extra_penalty_after is not None
            else jnp.asarray(False)
        )
        loss, grads = vg(params, px, gt, smask, rmask, extra)
        lr = cfg.lr * (sched.scale if cfg.use_plateau else 1.0)
        if cfg.extra_penalty_after is not None:
            lr = jnp.where(extra, lr * cfg.extra_penalty_lr_factor, lr)
        if cfg.wn_weight_decay > 0.0:
            new_params, new_opt = update_fn(
                params, grads, opt_state, lr,
                weight_decay=optim.wn_param_groups(
                    params, cfg.wn_weight_decay
                ),
            )
        else:
            new_params, new_opt = update_fn(params, grads, opt_state, lr)
        if has_clip:
            new_params = wrapper.enforce_convexity(new_params)
        if not cfg.train_segmentation and isinstance(new_params, dict) and (
            "seg" in new_params
        ):
            # segmentation_training_mode 'none': seg subtree excluded from
            # optimization (`awesome/run/awesome_runner.py:448-457`).
            new_params = dict(new_params, seg=params["seg"])
        ok = jnp.isfinite(loss) if cfg.nan_guard else jnp.asarray(True)
        if cfg.use_plateau and cfg.lr_stop_scale > 0.0:
            ok = jnp.logical_and(ok, sched.scale > cfg.lr_stop_scale)
        # validation holdout: a non-trainable (val) image's params are
        # NEVER stepped — its loss is a pure forward measurement (the
        # reference's no-grad val phase, `agent/torch_agent.py:233-243`).
        ok = jnp.logical_and(ok, trainable)
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

    return step


def _pixel_optim(cfg: PixelTrainConfig):
    return {
        "adam": (optim.adam_init, optim.adam_update),
        "adamax": (optim.adamax_init, optim.adamax_update),
    }[cfg.optimizer]


def pixel_train_init(
    wrapper, stacked_params: Params, cfg: PixelTrainConfig
) -> PixelTrainState:
    """Initial stacked train state for the vmapped segment engine."""
    init_fn, _ = _pixel_optim(cfg)
    batch = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    opt_state = jax.vmap(init_fn)(stacked_params)
    sched = jax.vmap(lambda _: optim.plateau_init())(jnp.arange(batch))
    return PixelTrainState(
        params=stacked_params,
        opt_state=opt_state,
        sched=sched,
        epoch=jnp.zeros((batch,), jnp.int32),
    )


def make_pixel_segment_fn(
    wrapper, cfg: PixelTrainConfig, segment_len: int, loss_impl=None
):
    """Build ``segment(state, px, gt, smask, rmask, trainable) ->
    (state, aux)``: ``segment_len`` epochs for ALL images in one compiled
    program (vmap of a per-image ``lax.scan``), resumable across calls
    (absolute epoch, optimizer moments and plateau state live in the
    carry). ``trainable`` (B,) bool: False = validation holdout — the
    image's params stay frozen, its loss is forward-only."""
    step = _make_pixel_step(wrapper, cfg, loss_impl)

    def one(state: PixelTrainState, px, gt, smask, rmask, trainable):
        def body(carry, e):
            return step(carry, e, px, gt, smask, rmask, trainable)

        (params, opt_state, sched), loss_hist = jax.lax.scan(
            body,
            (state.params, state.opt_state, state.sched),
            state.epoch + jnp.arange(segment_len),
        )
        new_state = PixelTrainState(
            params, opt_state, sched, state.epoch + segment_len
        )
        return new_state, {"loss_hist": loss_hist, "lr_scale": sched.scale}

    vone = jax.jit(jax.vmap(one))

    def segment(state, px, gt, smask, rmask, trainable=None):
        if trainable is None:
            trainable = jnp.ones((gt.shape[0],), dtype=bool)
        return vone(state, px, gt, smask, rmask, trainable)

    return segment


def make_pixel_train_fn(wrapper, cfg: PixelTrainConfig):
    """Build ``train(params, px, gt, scribble_mask, random_mask) ->
    (params, aux)`` for ONE image; vmap for the stacked version."""
    init_fn, _ = _pixel_optim(cfg)
    step = _make_pixel_step(wrapper, cfg)

    def train(params, px, gt, smask, rmask):
        opt_state = init_fn(params)
        sched = optim.plateau_init()

        def body(carry, epoch):
            return step(carry, epoch, px, gt, smask, rmask)

        (params, _, sched), loss_hist = jax.lax.scan(
            body,
            (params, opt_state, sched),
            jnp.arange(cfg.num_epochs),
        )
        return params, {"loss_hist": loss_hist, "lr_scale": sched.scale}

    return train


def shared_pixel_train_init(
    wrapper,
    key,
    num_images: int,
    cfg: PixelTrainConfig,
    params: Optional[Params] = None,
) -> PixelTrainState:
    """State for segmentation_training_mode='multi': ONE shared seg net +
    stacked per-image priors (`awesome/run/awesome_config.py:98-106`).
    ``params`` reuses an existing {'seg', 'prior'} tree (e.g. pretrained
    priors) instead of fresh inits."""
    k_seg, k_prior = jax.random.split(key)
    if params is None:
        seg_params = wrapper.segmentation_module.init(k_seg)
        params = {"seg": seg_params}
        if wrapper.prior_module is not None:
            prior_keys = jax.random.split(k_prior, num_images)
            params["prior"] = jax.vmap(wrapper.prior_module.init)(prior_keys)
    init_fn, _ = _pixel_optim(cfg)
    return PixelTrainState(
        params=params,
        opt_state=init_fn(params),
        sched=optim.plateau_init(),
        epoch=jnp.zeros((), jnp.int32),
    )


def make_shared_pixel_segment_fn(
    wrapper, cfg: PixelTrainConfig, segment_len: int
):
    """Segment engine for the shared-seg ('multi') mode: the seg net sees
    every image each epoch (mean loss over images -> averaged grads, the
    full-batch analogue of the reference's per-image steps), priors stay
    per-image. One compiled program per segment.

    ``trainable`` (B,) bool implements the validation holdout: val images
    contribute NOTHING to the shared-seg gradient (the mean is weighted by
    the trainable mask) and their per-image priors stay frozen; their
    losses are still computed (forward-only) so the runner can read the
    held-out validation curve. ``aux['loss_hist']`` is per-image (B, L)."""
    _, update_fn = _pixel_optim(cfg)
    has_clip = wrapper.prior_module is not None and hasattr(
        wrapper.prior_module, "enforce_convexity"
    )

    def losses_all(params, px, gt, smask, rmask, extra):
        has_prior = "prior" in params

        def per_image(prior_p, px_i, gt_i, sm_i, rm_i):
            p = {"seg": params["seg"]}
            if has_prior:
                p["prior"] = prior_p
            out = wrapper.apply(p, px_i)
            if not has_prior:
                sw = sm_i.astype(out.dtype)[:, None]
                raw = bce(out[:, 0:1], gt_i, reduction="none")
                return (raw * sw).sum() / jnp.maximum(sw.sum(), 1.0)
            return masked_awesome_loss(
                out, gt_i, sm_i, rm_i, cfg.alpha, extra,
                pen_base_scale=cfg.pen_base_scale,
                pen_align_scale=cfg.pen_align_scale,
            )

        prior_stack = params.get("prior")
        if has_prior:
            return jax.vmap(per_image)(prior_stack, px, gt, smask, rmask)
        return jax.vmap(lambda *a: per_image(None, *a))(px, gt, smask, rmask)

    def loss_for_grad(params, px, gt, smask, rmask, extra, tw):
        losses = losses_all(params, px, gt, smask, rmask, extra)
        # trainable-weighted mean: held-out images carry weight 0
        train_loss = (losses * tw).sum() / jnp.maximum(tw.sum(), 1.0)
        return train_loss, losses

    vg = jax.value_and_grad(loss_for_grad, has_aux=True)

    def segment(state: PixelTrainState, px, gt, smask, rmask,
                trainable=None):
        if trainable is None:
            trainable = jnp.ones((gt.shape[0],), dtype=bool)
        tw = trainable.astype(px.dtype)

        def step(carry, epoch):
            params, opt_state, sched = carry
            extra = (
                epoch >= cfg.extra_penalty_after
                if cfg.extra_penalty_after is not None
                else jnp.asarray(False)
            )
            (loss, losses), grads = vg(
                params, px, gt, smask, rmask, extra, tw
            )
            lr = cfg.lr * (sched.scale if cfg.use_plateau else 1.0)
            if cfg.extra_penalty_after is not None:
                lr = jnp.where(extra, lr * cfg.extra_penalty_lr_factor, lr)
            if cfg.wn_weight_decay > 0.0:
                # same WN-magnitude decay tree as the per-image engine
                # (`awesome/run/awesome_runner.py:427-444` splits param
                # groups for BOTH training modes)
                new_params, new_opt = update_fn(
                    params, grads, opt_state, lr,
                    weight_decay=optim.wn_param_groups(
                        params, cfg.wn_weight_decay
                    ),
                )
            else:
                new_params, new_opt = update_fn(params, grads, opt_state, lr)
            if has_clip:
                new_params = dict(
                    new_params,
                    prior=jax.vmap(wrapper.prior_module.enforce_convexity)(
                        new_params["prior"]
                    ),
                )
            if "prior" in state.params:
                # per-image priors of held-out images stay bit-identical
                # (their grads are zero through the weighted mean, but the
                # optimizer would still decay moments — mask the update)
                def keep_frozen(new, old):
                    m = trainable.reshape(
                        (-1,) + (1,) * (new.ndim - 1)
                    )
                    return jnp.where(m, new, old)

                new_params = dict(
                    new_params,
                    prior=jax.tree_util.tree_map(
                        keep_frozen, new_params["prior"], params["prior"]
                    ),
                )
            if not cfg.train_segmentation:
                new_params = dict(new_params, seg=params["seg"])
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
            return (params, opt_state, sched), losses

        (params, opt_state, sched), loss_hist = jax.lax.scan(
            step,
            (state.params, state.opt_state, state.sched),
            state.epoch + jnp.arange(segment_len),
        )
        new_state = PixelTrainState(
            params, opt_state, sched, state.epoch + segment_len
        )
        # per-image history (B, L), matching the vmapped engine's layout
        return new_state, {
            "loss_hist": jnp.moveaxis(loss_hist, 0, 1),
            "lr_scale": sched.scale,
        }

    return jax.jit(segment, static_argnames=())


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
