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

import contextlib
from typing import Any, Optional

import jax

Params = Any


def matmul_precision(precision: Optional[str]):
    """Matmul-precision context for flow eval math.

    On TPU, f32 matmuls lower to single-pass bf16 MXU ops by default;
    measured on v5e this turns the flow roundtrip
    ``inverse(deformation(x)) == x`` from ~1e-6 (CPU f32) into 3.5e-3 —
    22% of a pixel at 64x64 — while ``'high'`` (3-pass bf16) restores
    4.7e-5 at zero eval cost (29.7 ms either way; see docs/design.md).
    Fit loops deliberately stay at ambient/default precision: the learned
    FUNCTION is unaffected (TPU-fitted params round-trip at 1e-6 when
    evaluated in f32) and 'high' costs +27% on the XLA fit step.

    ``None`` inherits the ambient precision (used by the fit-hot
    ``apply`` paths); a string enters ``jax.default_matmul_precision``.
    """
    if precision is None:
        return contextlib.nullcontext()
    return jax.default_matmul_precision(precision)


class Module:
    """Base class; subclasses are frozen dataclass-like hyperparameter
    holders implementing ``init`` and ``apply``."""

    def init(self, key: jax.Array) -> Params:  # pragma: no cover - interface
        raise NotImplementedError

    def apply(self, params: Params, x, **kwargs):  # pragma: no cover
        raise NotImplementedError

    def __call__(self, params: Params, x, **kwargs):
        return self.apply(params, x, **kwargs)
