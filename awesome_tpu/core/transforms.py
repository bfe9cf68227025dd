"""Fittable, invertible normalization transforms as pure functions.

TPU-native equivalent of the reference's nn.Module-with-buffers transforms
(`awesome/transforms/min_max.py:21` ``MinMax``,
`awesome/transforms/mean_std.py` ``MeanStd``). Here a transform is a small
frozen dataclass of statistics produced by ``fit`` and consumed by
``transform`` / ``inverse_transform`` — no mutable state, fully jit/vmap
compatible, and trivially serializable as a PyTree.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

DimSpec = Optional[Union[int, Tuple[int, ...]]]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MinMax:
    """Min-max normalization to [new_min, new_max].

    Spec: `awesome/transforms/min_max.py:21-70`.
    """

    min: jnp.ndarray
    max: jnp.ndarray
    new_min: float = dataclasses.field(default=0.0, metadata=dict(static=True))
    new_max: float = dataclasses.field(default=1.0, metadata=dict(static=True))

    @staticmethod
    def fit(
        x: jnp.ndarray,
        dim: DimSpec = None,
        new_min: float = 0.0,
        new_max: float = 1.0,
    ) -> "MinMax":
        mn = x.min(axis=dim, keepdims=dim is not None)
        mx = x.max(axis=dim, keepdims=dim is not None)
        return MinMax(min=mn, max=mx, new_min=new_min, new_max=new_max)

    def transform(self, x: jnp.ndarray) -> jnp.ndarray:
        span = self.max - self.min
        span = jnp.where(span == 0, 1.0, span)
        return (x - self.min) / span * (self.new_max - self.new_min) + self.new_min

    def inverse_transform(self, x: jnp.ndarray) -> jnp.ndarray:
        new_span = self.new_max - self.new_min
        return (x - self.new_min) / new_span * (self.max - self.min) + self.min

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.transform(x)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MeanStd:
    """Mean/std standardization. Spec: `awesome/transforms/mean_std.py`."""

    mean: jnp.ndarray
    std: jnp.ndarray

    @staticmethod
    def fit(x: jnp.ndarray, dim: DimSpec = None) -> "MeanStd":
        mean = x.mean(axis=dim, keepdims=dim is not None)
        std = x.std(axis=dim, keepdims=dim is not None)
        return MeanStd(mean=mean, std=jnp.where(std == 0, 1.0, std))

    def transform(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x - self.mean) / self.std

    def inverse_transform(self, x: jnp.ndarray) -> jnp.ndarray:
        return x * self.std + self.mean

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.transform(x)


def minmax(v, v_min, v_max, new_min=0.0, new_max=1.0):
    """Scalar min-max helper. Spec: `awesome/model/path_connected_net.py:28-34`."""
    return (v - v_min) / (v_max - v_min) * (new_max - new_min) + new_min
