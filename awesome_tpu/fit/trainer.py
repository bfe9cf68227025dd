"""Joint training engine: segmentation net + per-image priors in one
compiled step — the TPU-native replacement of the reference's TorchAgent
epoch/step loops (`awesome/agent/torch_agent.py:183-527`).

Reference semantics per step (batch=1 image): swap that image's prior
weights into the live model (PriorManager), forward seg + prior, joint
loss, backward, optimizer step on BOTH, convexity clip, write mutated prior
weights back to the cache. Host syncs every batch.

TPU design: prior parameters for ALL images live in one stacked PyTree
(with per-image optimizer moments stacked alongside). A step takes a batch
of image indices, gathers their prior slices, ``vmap``s the prior forward,
computes the joint loss, and scatters updated slices back — one XLA
program, no host round trips. Sharding: batch axis over the mesh's 'data'
axis; the shared seg params are replicated (XLA inserts the grad psum).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from awesome_tpu.core import tree as T
from awesome_tpu.fit import optim
from awesome_tpu.measures.losses import fbms_joint_loss

Params = Any


@dataclasses.dataclass(frozen=True)
class JointTrainConfig:
    """Defaults mirror the joint FBMS config
    (`config/path-connectedness/joint/UNET+cars3+edge+diffeo+original+joint.yaml`):
    lr 1e-4, Adam on the seg net, Adamax on the priors, sssdms-weighted BCE
    + soft-clipped SE penalty."""

    lr: float = 1e-4
    prior_lr: float = 1e-4
    optimizer: str = "adam"
    prior_optimizer: str = "adamax"
    flow_weight_decay: float = 1e-5
    alpha: float = 1.0
    beta: float = 1.0
    clip_penalty: bool = True
    train_segmentation: bool = True  # mode 'single'/'multi' vs 'none'
    nan_guard: bool = True


class JointTrainState(NamedTuple):
    seg_params: Params
    seg_state: Any  # batchnorm running stats (or None)
    seg_opt: Any
    prior_params: Params  # stacked over ALL dataset images
    prior_opt: Any  # stacked optimizer moments
    step: jnp.ndarray


def _optim(name: str):
    return {
        "adam": (optim.adam_init, optim.adam_update),
        "adamax": (optim.adamax_init, optim.adamax_update),
    }[name]


def joint_train_init(
    wrapper,
    key: jax.Array,
    num_images: int,
    cfg: JointTrainConfig,
    seg_init=None,
    prior_init=None,
) -> JointTrainState:
    """Build the train state: seg params + stacked per-image prior params
    (the prior cache as a device array, `awesome/util/prior_cache.py:10`).

    ``prior_init``: pre-fitted stacked prior params (the pretrain state the
    reference loads before joint training, `agent/torch_agent.py:569-607`);
    fresh per-image inits otherwise.
    """
    k_seg, k_prior = jax.random.split(key)
    if seg_init is not None:
        seg_params, seg_state = seg_init
    elif wrapper.seg_stateful:
        seg_params, seg_state = wrapper.segmentation_module.init(k_seg)
    else:
        seg_params, seg_state = wrapper.segmentation_module.init(k_seg), None
    seg_opt = _optim(cfg.optimizer)[0](seg_params)
    if wrapper.prior_module is None:
        # refit-unet family: retrain the seg net alone
        # (`config/path-connectedness/refit-unet/*.yaml` use_prior_model:
        # false) — the prior slots are empty pytrees
        prior_params, prior_opt = {}, {}
    else:
        if prior_init is not None:
            prior_params = prior_init
        else:
            prior_keys = jax.random.split(k_prior, num_images)
            prior_params = jax.vmap(wrapper.prior_module.init)(prior_keys)
        prior_opt = jax.vmap(_optim(cfg.prior_optimizer)[0])(prior_params)
    return JointTrainState(
        seg_params=seg_params,
        seg_state=seg_state,
        seg_opt=seg_opt,
        prior_params=prior_params,
        prior_opt=prior_opt,
        step=jnp.zeros((), jnp.int32),
    )


def make_joint_train_step(
    wrapper,
    cfg: JointTrainConfig,
    loss_fn: Optional[Callable] = None,
) -> Callable:
    """Build ``step(state, batch) -> (state, metrics)``.

    ``batch``: dict with 'image' (B,H,W,C), 'features' (B,H,W,F), 'grid'
    (B,N,2) or (N,2) shared, 'target' (B,H,W,1), 'index' (B,) int32 —
    dataset indices selecting prior slices.
    """
    seg_upd = _optim(cfg.optimizer)[1]
    prior_upd = _optim(cfg.prior_optimizer)[1]
    has_prior = wrapper.prior_module is not None

    if loss_fn is None and not has_prior:
        # seg-only training: sssdms-weighted BCE (WeightedLoss semantics,
        # the refit-unet family's criterion,
        # `config/path-connectedness/refit-unet/*.yaml` loss_type
        # WeightedLoss(mode='sssdms'))
        from awesome_tpu.measures.losses import bce, unaries_weighted_loss

        def loss_fn(output, target, weight=None):
            out_cf = jnp.moveaxis(output, -1, 1)
            tgt_cf = jnp.moveaxis(target, -1, 1)
            if weight is None:
                return {"loss": unaries_weighted_loss(
                    out_cf, tgt_cf, criterion=bce, mode="sssdms"
                )}
            per = jax.vmap(
                lambda o, t: unaries_weighted_loss(
                    o[None], t[None], criterion=bce, mode="sssdms"
                )
            )(out_cf, tgt_cf)
            wsum = jnp.maximum(weight.sum(), 1.0)
            return {"loss": (per * weight).sum() / wsum}

    elif loss_fn is None:

        def loss_fn(output, target, weight=None):
            # output (B,H,W,2): [seg, prior] channels; fbms_joint_loss wants
            # channel-first halves -> transpose to (B, 2, H, W)
            out_cf = jnp.moveaxis(output, -1, 1)
            tgt_cf = jnp.moveaxis(target, -1, 1)
            if weight is None:
                return fbms_joint_loss(
                    out_cf,
                    tgt_cf,
                    alpha=cfg.alpha,
                    beta=cfg.beta,
                    clip_penalty=cfg.clip_penalty,
                )
            # Padded batches (tail of an epoch scan): per-sample losses,
            # weight-0 entries contribute nothing (pad-to-bucket + mask,
            # CLAUDE.md invariant). Class weights (sssdms) become
            # per-sample, matching the reference's batch-of-1 semantics.
            per = jax.vmap(
                lambda o, t: fbms_joint_loss(
                    o[None],
                    t[None],
                    alpha=cfg.alpha,
                    beta=cfg.beta,
                    clip_penalty=cfg.clip_penalty,
                )
            )(out_cf, tgt_cf)
            wsum = jnp.maximum(weight.sum(), 1.0)
            return {k: (v * weight).sum() / wsum for k, v in per.items()}

    def forward(seg_params, prior_batch, seg_state, batch):
        image, feats, grid = batch["image"], batch["features"], batch["grid"]
        if wrapper.seg_stateful:
            seg_logits, new_seg_state = wrapper.segmentation_module.apply(
                seg_params, seg_state, image, feats, train=cfg.train_segmentation
            )
        else:
            seg_logits = wrapper.segmentation_module.apply(
                seg_params, image, feats
            )
            new_seg_state = seg_state
        seg = wrapper.process_segmentation_output(seg_logits)
        if not has_prior:
            return seg, new_seg_state

        def prior_one(pp, g):
            return wrapper.process_prior_output(
                wrapper.prior_module.apply(pp, g)
            )

        grid_axes = 0 if grid.ndim == 3 else None
        prior_pts = jax.vmap(prior_one, in_axes=(0, grid_axes))(
            prior_batch, grid
        )  # (B, N, 1)
        b, h, w, c = seg.shape
        prior_img = prior_pts.reshape(b, h, w, c)
        out = jnp.concatenate([seg, prior_img], axis=-1)
        return out, new_seg_state

    def step(state: JointTrainState, batch):
        idx = batch["index"]
        # epoch-level LR scheduling (StepLR / plateau / watchdog) rides a
        # traced scale so schedulers never retrace the epoch program
        lr_scale = batch.get("lr_scale", 1.0)
        if has_prior:
            prior_batch = T.tree_select(state.prior_params, idx)
            prior_opt_batch = jax.tree_util.tree_map(
                lambda x: x[idx] if x.ndim > 0 else x, state.prior_opt
            )
        else:
            prior_batch, prior_opt_batch = {}, {}

        weight = batch.get("weight")

        def compute_loss(seg_params, prior_batch):
            out, new_seg_state = forward(
                seg_params, prior_batch, state.seg_state, batch
            )
            if weight is not None:
                res = loss_fn(out, batch["target"], weight)
            else:
                res = loss_fn(out, batch["target"])
            if isinstance(res, dict):
                return res["loss"], (res, new_seg_state)
            return res, ({"loss": res}, new_seg_state)

        (loss, (metrics, new_seg_state)), (seg_g, prior_g) = jax.value_and_grad(
            compute_loss, argnums=(0, 1), has_aux=True
        )(state.seg_params, prior_batch)

        ok = jnp.isfinite(loss) if cfg.nan_guard else jnp.asarray(True)

        # --- segmentation update (shared params) -------------------------
        if cfg.train_segmentation:
            new_seg, new_seg_opt = seg_upd(
                state.seg_params, seg_g, state.seg_opt,
                cfg.lr * lr_scale
            )
            new_seg = T.tree_where(ok, new_seg, state.seg_params)
            new_seg_opt = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new_seg_opt, state.seg_opt
            )
        else:
            new_seg, new_seg_opt = state.seg_params, state.seg_opt

        # --- per-image prior update (vmapped, scattered back) ------------
        if not has_prior:
            new_state = JointTrainState(
                seg_params=new_seg,
                seg_state=new_seg_state,
                seg_opt=new_seg_opt,
                prior_params=state.prior_params,
                prior_opt=state.prior_opt,
                step=state.step + 1,
            )
            return new_state, dict(
                metrics, nan_skipped=jnp.logical_not(ok)
            )
        wd = None
        if hasattr(wrapper.prior_module, "param_groups"):
            groups = wrapper.prior_module.param_groups(
                T.tree_select(prior_batch, 0)
            )
            wd = jax.tree_util.tree_map(
                lambda s: cfg.flow_weight_decay if s == "flow" else 0.0, groups
            )

        def upd_one(pp, g, op):
            new_pp, new_op = prior_upd(pp, g, op, cfg.prior_lr * lr_scale,
                                       weight_decay=wd)
            if hasattr(wrapper.prior_module, "enforce_convexity"):
                new_pp = wrapper.prior_module.enforce_convexity(new_pp)
            return new_pp, new_op

        new_prior_batch, new_prior_opt_batch = jax.vmap(upd_one)(
            prior_batch, prior_g, prior_opt_batch
        )
        if weight is not None:
            # weight-0 (padded) samples: keep their gathered value so the
            # scatter below is a no-op for them (no spurious moment decay).
            live = weight > 0

            def keep_live(new, old):
                mask = live.reshape((-1,) + (1,) * (new.ndim - 1))
                return jnp.where(mask, new, old)

            new_prior_batch = jax.tree_util.tree_map(
                keep_live, new_prior_batch, prior_batch
            )
            new_prior_opt_batch = jax.tree_util.tree_map(
                keep_live, new_prior_opt_batch, prior_opt_batch
            )
        new_prior_batch = T.tree_where(ok, new_prior_batch, prior_batch)
        new_prior_opt_batch = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b),
            new_prior_opt_batch,
            prior_opt_batch,
        )
        new_prior = T.tree_update(state.prior_params, idx, new_prior_batch)
        new_prior_opt = jax.tree_util.tree_map(
            lambda s, v: s.at[idx].set(v) if s.ndim > 0 else v,
            state.prior_opt,
            new_prior_opt_batch,
        )

        new_state = JointTrainState(
            seg_params=new_seg,
            seg_state=new_seg_state,
            seg_opt=new_seg_opt,
            prior_params=new_prior,
            prior_opt=new_prior_opt,
            step=state.step + 1,
        )
        metrics = dict(metrics, nan_skipped=jnp.logical_not(ok))
        return new_state, metrics

    return step


# --- multi-object joint training ------------------------------------------


class MultiObjectTrainState(NamedTuple):
    """Joint training state for multi-object sequences: the shared seg net
    emits one channel per object slot; each frame carries a STACK of K
    child priors (static capacity, `nn.multi_prior.MultiPriorModule`) with
    per-slot optimizer moments and an active mask. Growth
    (``assure_prior_count``) re-initializes inactive slots host-side
    between compiled segments — the functional equivalent of the
    reference's dynamic child modules synced into the optimizer
    (`awesome/run/awesome_runner.py:460-490` _alter_optimizer +
    `abstract_multi_prior_module.py:55-74`)."""

    seg_params: Params
    seg_state: Any
    seg_opt: Any
    prior_params: Params  # {'children': (T, K, ...)}
    prior_opt: Any  # per-(frame, child) moments, count (T, K)
    active: jnp.ndarray  # (T, K) bool
    step: jnp.ndarray


def multi_object_train_init(
    wrapper,
    key: jax.Array,
    num_images: int,
    cfg: JointTrainConfig,
    initial_count: int = 1,
    seg_init=None,
    prior_init=None,
) -> MultiObjectTrainState:
    """``wrapper.prior_module`` must be a ``MultiPriorModule`` (capacity
    ``max_priors``); the seg module must emit ``max_priors`` channels.
    ``initial_count`` activates the first slots of every frame."""
    mp = wrapper.prior_module
    k_seg, k_prior = jax.random.split(key)
    if seg_init is not None:
        seg_params, seg_state = seg_init
    elif wrapper.seg_stateful:
        seg_params, seg_state = wrapper.segmentation_module.init(k_seg)
    else:
        seg_params, seg_state = wrapper.segmentation_module.init(k_seg), None
    seg_opt = _optim(cfg.optimizer)[0](seg_params)
    if prior_init is not None:
        prior_params = prior_init
    else:
        keys = jax.random.split(k_prior, num_images)
        prior_params = jax.vmap(mp.init)(keys)  # {'children': (T, K, ...)}
    child_init = _optim(cfg.prior_optimizer)[0]
    prior_opt = jax.vmap(jax.vmap(child_init))(prior_params["children"])
    active = jnp.zeros((num_images, mp.max_priors), bool).at[
        :, :initial_count
    ].set(True)
    return MultiObjectTrainState(
        seg_params=seg_params,
        seg_state=seg_state,
        seg_opt=seg_opt,
        prior_params=prior_params,
        prior_opt=prior_opt,
        active=active,
        step=jnp.zeros((), jnp.int32),
    )


def assure_multi_prior_count(
    wrapper,
    state: MultiObjectTrainState,
    cfg: JointTrainConfig,
    count: int,
    key: jax.Array,
) -> MultiObjectTrainState:
    """Grow every frame's active child count to ``count``: inactive slots
    below ``count`` get FRESH child params and ZEROED optimizer moments
    (a newly-added torch param group starts with lazy-zero Adam state —
    `awesome/run/awesome_runner.py:477-490`); existing children and their
    moments are untouched. Shrinking just lowers the active mask.

    Host-side between compiled segments (one re-jit per new active
    pattern at most; the step itself masks by ``active`` so the compiled
    program is count-independent)."""
    mp = wrapper.prior_module
    if count > mp.max_priors:
        raise ValueError(
            f"count {count} exceeds static capacity {mp.max_priors}"
        )
    t = state.active.shape[0]
    slot = jnp.arange(mp.max_priors)[None, :]
    target = slot < count  # (1, K) broadcast over frames
    need_fresh = jnp.logical_and(~state.active, jnp.broadcast_to(
        target, state.active.shape
    ))
    fresh = jax.vmap(mp.init)(jax.random.split(key, t))
    child_init = _optim(cfg.prior_optimizer)[0]
    fresh_opt = jax.vmap(jax.vmap(child_init))(fresh["children"])

    def mix(new, old):
        m = need_fresh.reshape(need_fresh.shape + (1,) * (old.ndim - 2))
        return jnp.where(m, new, old)

    children = jax.tree_util.tree_map(
        mix, fresh["children"], state.prior_params["children"]
    )
    prior_opt = jax.tree_util.tree_map(
        mix, fresh_opt, state.prior_opt
    )
    return state._replace(
        prior_params=dict(state.prior_params, children=children),
        prior_opt=prior_opt,
        active=jnp.broadcast_to(target, state.active.shape),
    )


def make_multi_object_train_step(
    wrapper,
    cfg: JointTrainConfig,
) -> Callable:
    """Build ``step(state, batch) -> (state, metrics)`` for multi-object
    joint training.

    ``batch``: 'image' (B,H,W,C), 'features' (B,H,W,F), 'grid' (N,2) or
    (B,N,2), 'target_obj' (B,H,W,K) per-object unaries (fg=0 per channel),
    'labeled' (B,H,W) bool supervision mask, 'index' (B,), optional
    'weight' (B,).

    Loss per ACTIVE object k: sssdms-weighted BCE(seg_k, target_k) over
    labeled pixels + beta * soft-clipped SE(prior_k, seg_k) — the
    FBMSJointLoss applied per object and averaged over active slots
    (`awesome/measures/fbms_joint_loss.py:34-59` with the multi-channel
    output of `multiple_object_aware_path_connected_net.py`).
    """
    from awesome_tpu.measures.losses import bce, se, unaries_weight

    seg_upd = _optim(cfg.optimizer)[1]
    prior_upd = _optim(cfg.prior_optimizer)[1]
    mp = wrapper.prior_module

    def forward(seg_params, children_batch, seg_state, batch):
        image, feats, grid = batch["image"], batch["features"], batch["grid"]
        if wrapper.seg_stateful:
            seg_logits, new_seg_state = wrapper.segmentation_module.apply(
                seg_params, seg_state, image, feats,
                train=cfg.train_segmentation,
            )
        else:
            seg_logits = wrapper.segmentation_module.apply(
                seg_params, image, feats
            )
            new_seg_state = seg_state
        seg = wrapper.process_segmentation_output(seg_logits)  # (B,H,W,K)

        def prior_one(children, g):
            out = mp.apply({"children": children}, g)  # (N, K)
            return wrapper.process_prior_output(out)

        grid_axes = 0 if grid.ndim == 3 else None
        prior_pts = jax.vmap(prior_one, in_axes=(0, grid_axes))(
            children_batch, grid
        )  # (B, N, K)
        b, h, w, k = seg.shape
        prior_img = prior_pts.reshape(b, h, w, k)
        return seg, prior_img, new_seg_state

    def object_loss(seg_k, prior_k, tgt_k, labeled):
        """One object's FBMSJointLoss terms (per image)."""
        w = unaries_weight(tgt_k, mode="sssdms", mask=labeled)
        raw = bce(seg_k, tgt_k, reduction="none")
        seg_loss = cfg.alpha * (raw * w).sum() / jnp.maximum(w.sum(), 1.0)
        pen = cfg.beta * jnp.mean((prior_k - seg_k) ** 2)
        if cfg.clip_penalty:
            scale = jax.lax.stop_gradient(jnp.where(
                pen > seg_loss,
                seg_loss / jnp.maximum(pen, 1e-12),
                1.0,
            ))
            pen = pen * scale
        return seg_loss + pen

    def step(state: MultiObjectTrainState, batch):
        idx = batch["index"]
        lr_scale = batch.get("lr_scale", 1.0)
        children_batch = jax.tree_util.tree_map(
            lambda x: x[idx], state.prior_params["children"]
        )
        opt_batch = jax.tree_util.tree_map(
            lambda x: x[idx], state.prior_opt
        )
        active_b = state.active[idx]  # (B, K)
        weight = batch.get("weight")
        labeled = batch["labeled"].astype(batch["image"].dtype)

        def compute_loss(seg_params, children_batch):
            seg, prior, new_seg_state = forward(
                seg_params, children_batch, state.seg_state, batch
            )
            tgt = batch["target_obj"]  # (B, H, W, K)

            def per_image(seg_i, prior_i, tgt_i, lab_i, act_i):
                per_obj = jax.vmap(
                    lambda k_: object_loss(
                        seg_i[..., k_], prior_i[..., k_], tgt_i[..., k_],
                        lab_i,
                    )
                )(jnp.arange(seg_i.shape[-1]))
                a = act_i.astype(seg_i.dtype)
                return (per_obj * a).sum() / jnp.maximum(a.sum(), 1.0)

            per = jax.vmap(per_image)(seg, prior, tgt, labeled, active_b)
            if weight is not None:
                loss = (per * weight).sum() / jnp.maximum(weight.sum(), 1.0)
            else:
                loss = per.mean()
            return loss, new_seg_state

        (loss, new_seg_state), (seg_g, child_g) = jax.value_and_grad(
            compute_loss, argnums=(0, 1), has_aux=True
        )(state.seg_params, children_batch)

        ok = jnp.isfinite(loss) if cfg.nan_guard else jnp.asarray(True)

        if cfg.train_segmentation:
            new_seg, new_seg_opt = seg_upd(
                state.seg_params, seg_g, state.seg_opt, cfg.lr * lr_scale
            )
            new_seg = T.tree_where(ok, new_seg, state.seg_params)
            new_seg_opt = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new_seg_opt, state.seg_opt
            )
        else:
            new_seg, new_seg_opt = state.seg_params, state.seg_opt

        wd = None
        if hasattr(mp.child, "param_groups"):
            groups = mp.child.param_groups(
                jax.tree_util.tree_map(lambda x: x[0, 0], children_batch)
            )
            wd = jax.tree_util.tree_map(
                lambda s: cfg.flow_weight_decay if s == "flow" else 0.0,
                groups,
            )

        def upd_child(pp, g, op):
            new_pp, new_op = prior_upd(pp, g, op, cfg.prior_lr * lr_scale,
                                       weight_decay=wd)
            if hasattr(mp.child, "enforce_convexity"):
                new_pp = mp.child.enforce_convexity(new_pp)
            return new_pp, new_op

        new_children, new_opt = jax.vmap(jax.vmap(upd_child))(
            children_batch, child_g, opt_batch
        )
        # inactive slots and padded samples keep their gathered values
        keep = active_b
        if weight is not None:
            keep = jnp.logical_and(keep, (weight > 0)[:, None])
        keep = jnp.logical_and(keep, ok)

        def keep_live(new, old):
            m = keep.reshape(keep.shape + (1,) * (new.ndim - 2))
            return jnp.where(m, new, old)

        new_children = jax.tree_util.tree_map(
            keep_live, new_children, children_batch
        )
        new_opt = jax.tree_util.tree_map(keep_live, new_opt, opt_batch)

        scattered = jax.tree_util.tree_map(
            lambda s, v: s.at[idx].set(v),
            state.prior_params["children"],
            new_children,
        )
        scattered_opt = jax.tree_util.tree_map(
            lambda s, v: s.at[idx].set(v), state.prior_opt, new_opt
        )
        new_state = MultiObjectTrainState(
            seg_params=new_seg,
            seg_state=new_seg_state,
            seg_opt=new_seg_opt,
            prior_params=dict(state.prior_params, children=scattered),
            prior_opt=scattered_opt,
            active=state.active,
            step=state.step + 1,
        )
        return new_state, {"loss": loss,
                           "nan_skipped": jnp.logical_not(ok)}

    return step


def make_multi_object_epoch_fn(
    wrapper,
    cfg: JointTrainConfig,
) -> Callable:
    """``epoch(state, data, idx_mat, wgt_mat) -> (state, metrics)``: one
    compiled scan of the multi-object joint step over the permuted batch
    plan. ``data``: 'image' (T,H,W,C), 'features' (T,H,W,F), 'grid',
    'target_obj' (T,H,W,K), 'labeled' (T,H,W)."""
    step = make_multi_object_train_step(wrapper, cfg)

    def epoch(state, data, idx_mat, wgt_mat, lr_scale=1.0):
        per_frame_grid = data["grid"].ndim == 3

        def body(st, xs):
            idx, wgt = xs
            batch = {
                "image": data["image"][idx],
                "features": data["features"][idx],
                "grid": data["grid"][idx] if per_frame_grid else data["grid"],
                "target_obj": data["target_obj"][idx],
                "labeled": data["labeled"][idx],
                "index": idx,
                "weight": wgt,
                "lr_scale": lr_scale,
            }
            return step(st, batch)

        return jax.lax.scan(body, state, (idx_mat, wgt_mat))

    return epoch


def epoch_batches(num_images: int, batch_size: int, rng) -> Tuple[Any, Any]:
    """Permuted, bucket-padded batch plan for one epoch.

    Returns ``(idx_mat, wgt_mat)`` of shape (num_batches, batch_size): a
    random permutation of all image indices, with the tail batch padded by
    wrapping around to the front of the permutation at weight 0 (so no
    batch contains duplicate indices as long as batch_size <= num_images,
    keeping the prior scatter write-once). The reference silently DROPS
    the tail batch each epoch (mirrored previously here); padding trains
    on every image every epoch instead.
    """
    import numpy as np

    if batch_size > num_images:
        raise ValueError("batch_size must be <= num_images")
    perm = rng.permutation(num_images)
    n_batches = -(-num_images // batch_size)
    pad = n_batches * batch_size - num_images
    idx = np.concatenate([perm, perm[:pad]]).reshape(n_batches, batch_size)
    wgt = np.ones(n_batches * batch_size, np.float32)
    if pad:
        wgt[-pad:] = 0.0
    return idx.astype(np.int32), wgt.reshape(n_batches, batch_size)


def make_joint_epoch_fn(
    wrapper,
    cfg: JointTrainConfig,
    loss_fn: Optional[Callable] = None,
) -> Callable:
    """Build ``epoch(state, data, idx_mat, wgt_mat) -> (state, metrics)``:
    a whole training epoch as ONE compiled program — ``lax.scan`` of the
    joint step over the permuted batch plan, gathering each mini-batch from
    the device-resident dataset. Replaces the reference's Python epoch loop
    with per-batch host syncs (`awesome/agent/torch_agent.py:277-527`);
    metrics come back stacked, one host transfer per epoch.

    ``data``: dict with 'image' (T,H,W,C), 'features' (T,H,W,F), 'target'
    (T,H,W,1), 'grid' (N,2) shared (or (T,N,2) per-frame).
    """
    step = make_joint_train_step(wrapper, cfg, loss_fn)

    def epoch(state, data, idx_mat, wgt_mat, lr_scale=1.0):
        per_frame_grid = data["grid"].ndim == 3

        def body(st, xs):
            idx, wgt = xs
            batch = {
                "image": data["image"][idx],
                "features": data["features"][idx],
                "grid": data["grid"][idx] if per_frame_grid else data["grid"],
                "target": data["target"][idx],
                "index": idx,
                "weight": wgt,
                "lr_scale": lr_scale,
            }
            return step(st, batch)

        return jax.lax.scan(body, state, (idx_mat, wgt_mat))

    return epoch
