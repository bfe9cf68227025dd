"""Multi-object priors: N child priors per image, grown/shrunk on demand.

Behavior port of the reference's multi-prior module family:
`awesome/model/abstract_multi_prior_module.py:13-74` (create/remove child
priors, ``assure_prior_count``),
`awesome/model/number_based_multi_prior_module.py:15-51`
(``forward(num_priors=...)``), `awesome/model/batch_size_multi_prior_module.py:13`
(child count follows batch size), and
`awesome/model/multiple_object_aware_path_connected_net.py:24-68` (the
PathConnectedNet specialization incl. per-object pretrain).

TPU design: children are a stacked param tree with a static capacity
``max_priors``; the *active* count is a runtime integer. Dynamic grow/
shrink (an allocation in the reference) becomes masking: inactive slots
are computed but masked out — XLA-friendly, and with vmap the K children
cost one batched matmul, not K kernel launches. ``assure_prior_count`` on
the host re-initializes slots beyond the previous count
(`abstract_multi_prior_module.py:55-74` semantics).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from awesome_tpu.core import tree as T
from awesome_tpu.nn.module import Module

Params = Any


@dataclasses.dataclass(frozen=True)
class MultiPriorModule(Module):
    """K copies of a child prior evaluated on the same points.

    ``apply`` returns (N, K) outputs (one channel per object) when
    ``stack_outputs`` else a list.
    """

    child: Module
    max_priors: int = 4
    stack_outputs: bool = True

    def init(self, key):
        """Param tree holds ONLY the stacked children. The active count is
        a structural constant tracked by the caller (static config or a
        runtime arg), never a param leaf — see CLAUDE.md invariants."""
        keys = jax.random.split(key, self.max_priors)
        children = jax.vmap(self.child.init)(keys)
        return {"children": children}

    def active_mask(self, count) -> jnp.ndarray:
        """(max_priors,) bool mask of active child slots."""
        return jnp.arange(self.max_priors) < count

    def assure_prior_count(self, params: Params, prev_count: int, count: int,
                           key: Optional[jax.Array] = None) -> Params:
        """Grow to ``count`` children by re-initializing slots in
        [prev_count, count); shrinking is just the caller lowering its
        count (slots beyond it are ignored by ``combine``)."""
        if count > self.max_priors:
            raise ValueError(
                f"count {count} exceeds static capacity {self.max_priors}"
            )
        prev = int(prev_count)
        children = params["children"]
        if count > prev:
            key = key if key is not None else jax.random.PRNGKey(count)
            fresh = jax.vmap(self.child.init)(
                jax.random.split(key, self.max_priors)
            )
            sel = jnp.arange(self.max_priors)
            take_fresh = (sel >= prev) & (sel < count)
            children = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    take_fresh.reshape((-1,) + (1,) * (old.ndim - 1)),
                    new,
                    old,
                ),
                fresh,
                children,
            )
        return {"children": children}

    def apply(self, params, x, num_priors: Optional[int] = None):
        """Evaluate children on points x (N, C) -> (N, K). With a static
        ``num_priors`` the output is sliced to the first K children;
        otherwise all ``max_priors`` channels are returned unmasked (pass
        a count to ``combine``/``active_mask`` to ignore inactive slots).

        Spec: `number_based_multi_prior_module.py:51` forward(num_priors).
        """

        def one(child_params):
            return self.child.apply(child_params, x)

        outs = jax.vmap(one)(params["children"])  # (max, N, 1)
        outs = jnp.moveaxis(outs[..., 0], 0, -1)  # (N, max)
        if num_priors is not None and num_priors < self.max_priors:
            outs = outs[..., :num_priors]
        return outs

    def combine(self, outs: jnp.ndarray, count=None) -> jnp.ndarray:
        """Fuse per-object fields into one: min over objects (union of
        sub-level sets — fg encoded as low values). ``count`` (static or
        traced) restricts the min to active slots; the masking stays
        internal so no non-finite sentinel can leak to consumers."""
        if count is not None:
            active = self.active_mask(count)[None, :]
            big = jnp.finfo(outs.dtype).max
            outs = jnp.where(active, outs, big)
        return outs.min(axis=-1, keepdims=True)

    def enforce_convexity(self, params):
        if not hasattr(self.child, "enforce_convexity"):
            return params
        children = jax.vmap(self.child.enforce_convexity)(params["children"])
        return dict(params, children=children)

    def param_groups(self, params):
        if hasattr(self.child, "param_groups"):
            one = self.child.param_groups(
                T.tree_select(params["children"], 0)
            )
            groups = jax.tree_util.tree_map(lambda s: s, one)
            return {"children": groups}
        return jax.tree_util.tree_map(lambda _: "other", params)


@dataclasses.dataclass(frozen=True)
class MultipleObjectsPathConnectedNet(MultiPriorModule):
    """Multi-object path-connected prior (child = PathConnectedNet).

    Spec: `multiple_object_aware_path_connected_net.py:24-68`. Fitting each
    object's child against its own unary channel reuses the batched fit
    engine: children stack along the image*object axis.
    """

    def deformation(self, params, x, index: int = 0, precision="high"):
        return self.child.deformation(
            T.tree_select(params["children"], index), x, precision=precision
        )

    def inverse(self, params, y, index: int = 0, precision="high"):
        return self.child.inverse(
            T.tree_select(params["children"], index), y, precision=precision
        )
