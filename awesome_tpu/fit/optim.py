"""Optimizers and LR schedules as pure scan-state transitions.

Hand-rolled (rather than optax) for three reasons: (1) exact parity with
torch semantics the reference relies on — torch Adamax's infinity-norm
update and coupled (L2-into-gradient) weight decay
(`awesome/model/path_connected_net.py:920` uses torch.optim.Adamax with a
per-group weight decay on the flow only); (2) the learning rate must be a
*traced* value because ReduceLROnPlateau lives inside the fit ``lax.scan``
(SURVEY.md §7 hard part (e)); (3) per-leaf weight-decay groups are just a
wd-valued PyTree here instead of optimizer param groups.

All functions are pure: ``state = init(params)``,
``params, state = update(params, grads, state, lr)``. XLA fuses the
tree_maps into the fit step's backward pass.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

Params = Any
tmap = jax.tree_util.tree_map


def _zero_wd(params: Params) -> Params:
    return tmap(lambda _: 0.0, params)


class AdamaxState(NamedTuple):
    count: jnp.ndarray  # scalar int32
    m: Params  # first moment
    u: Params  # infinity norm


def adamax_init(params: Params) -> AdamaxState:
    return AdamaxState(
        count=jnp.zeros((), jnp.int32),
        m=tmap(jnp.zeros_like, params),
        u=tmap(jnp.zeros_like, params),
    )


def adamax_update(
    params: Params,
    grads: Params,
    state: AdamaxState,
    lr,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: Optional[Params] = None,
):
    """torch.optim.Adamax semantics.

    ``weight_decay``: None or a PyTree of per-leaf decay scalars (the
    param-group mechanism — e.g. decay only on flow leaves).
    """
    count = state.count + 1
    bc = 1.0 - b1 ** count.astype(jnp.float32)
    wd = weight_decay if weight_decay is not None else _zero_wd(params)
    g = tmap(lambda g_, p, w: g_ + w * p, grads, params, wd)
    m = tmap(lambda m_, g_: b1 * m_ + (1.0 - b1) * g_, state.m, g)
    u = tmap(lambda u_, g_: jnp.maximum(b2 * u_, jnp.abs(g_) + eps), state.u, g)
    new_params = tmap(lambda p, m_, u_: p - (lr / bc) * m_ / u_, params, m, u)
    return new_params, AdamaxState(count=count, m=m, u=u)


class AdamState(NamedTuple):
    count: jnp.ndarray
    m: Params
    v: Params


def adam_init(params: Params) -> AdamState:
    return AdamState(
        count=jnp.zeros((), jnp.int32),
        m=tmap(jnp.zeros_like, params),
        v=tmap(jnp.zeros_like, params),
    )


def adam_update(
    params: Params,
    grads: Params,
    state: AdamState,
    lr,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: Optional[Params] = None,
):
    """torch.optim.Adam semantics (coupled L2 weight decay)."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t
    wd = weight_decay if weight_decay is not None else _zero_wd(params)
    g = tmap(lambda g_, p, w: g_ + w * p, grads, params, wd)
    m = tmap(lambda m_, g_: b1 * m_ + (1.0 - b1) * g_, state.m, g)
    v = tmap(lambda v_, g_: b2 * v_ + (1.0 - b2) * g_ * g_, state.v, g)
    new_params = tmap(
        lambda p, m_, v_: p - lr * (m_ / bc1) / (jnp.sqrt(v_ / bc2) + eps),
        params, m, v,
    )
    return new_params, AdamState(count=count, m=m, v=v)


class PlateauState(NamedTuple):
    """ReduceLROnPlateau carried through ``lax.scan``.

    torch semantics (mode='min', threshold_mode='rel', threshold=1e-4,
    cooldown=0): when no improvement for > patience steps, multiply the LR
    scale by ``factor``. Spec wiring: `awesome/model/path_connected_net.py:935`
    (patience=200, factor=0.5 inside the per-image fit).
    """

    best: jnp.ndarray
    num_bad: jnp.ndarray
    scale: jnp.ndarray


def plateau_init(dtype=jnp.float32) -> PlateauState:
    return PlateauState(
        best=jnp.asarray(jnp.inf, dtype),
        num_bad=jnp.zeros((), jnp.int32),
        scale=jnp.ones((), dtype),
    )


def plateau_update(
    state: PlateauState,
    loss,
    factor: float = 0.5,
    patience: int = 200,
    threshold: float = 1e-4,
    min_scale: float = 0.0,
) -> PlateauState:
    improved = loss < state.best * (1.0 - threshold)
    best = jnp.where(improved, loss, state.best)
    num_bad = jnp.where(improved, 0, state.num_bad + 1)
    reduce_now = num_bad > patience
    scale = jnp.where(
        reduce_now, jnp.maximum(state.scale * factor, min_scale), state.scale
    )
    num_bad = jnp.where(reduce_now, 0, num_bad)
    return PlateauState(best=best, num_bad=num_bad, scale=scale)


def wn_param_groups(params: Params, weight_decay: float) -> Params:
    """Weight-decay tree that decays ONLY weight-norm magnitude leaves
    ('g' keys of WNLinear params) — the reference's param-group splitter
    for weight-normalized modules (`awesome/util/torch.py:19-35`
    ``get_weight_normalized_param_groups``, wired by
    ``weight_decay_on_weight_norm_modules`` in the config)."""
    import jax

    def walk(node):
        if isinstance(node, dict):
            return {
                k: (weight_decay if k == "g" else walk(v))
                for k, v in node.items()
            }
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return 0.0

    del jax
    return walk(params)


@dataclasses.dataclass(frozen=True)
class StepLR:
    """torch StepLR as a pure function of the epoch index."""

    step_size: int
    gamma: float = 0.1

    def scale(self, epoch) -> jnp.ndarray:
        return self.gamma ** jnp.floor_divide(epoch, self.step_size).astype(
            jnp.float32
        )
