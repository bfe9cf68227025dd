"""Minimal functional module protocol.

A module is a *static* description (hyperparameters only, hashable) with

- ``init(key) -> params``: build a parameter PyTree (nested dicts of arrays)
- ``apply(params, x, ...) -> out``: pure forward pass

There is deliberately no mutable state and no parameter storage on the
module object: parameters live in plain dict PyTrees so that they can be
stacked along a leading image axis (see ``awesome_tpu.core.tree.stack_trees``),
``vmap``ped, sharded with ``jax.sharding``, and projected (convexity clips)
with ``tree_map`` — the properties the whole TPU design rests on. This
replaces the reference's nn.Module + state_dict machinery
(`awesome/model/*`, `awesome/util/torch.py`).
"""
from __future__ import annotations

from typing import Any

import jax

Params = Any


class Module:
    """Base class; subclasses are frozen dataclass-like hyperparameter
    holders implementing ``init`` and ``apply``."""

    def init(self, key: jax.Array) -> Params:  # pragma: no cover - interface
        raise NotImplementedError

    def apply(self, params: Params, x, **kwargs):  # pragma: no cover
        raise NotImplementedError

    def __call__(self, params: Params, x, **kwargs):
        return self.apply(params, x, **kwargs)
