"""Small adapter modules completing the reference model zoo.

- :class:`ForwardModule` — identity pass-through
  (`awesome/model/forward_module.py:6`), used where a config slot needs a
  no-op segmentation or prior module.
- :class:`DenseNet` — simple dense MLP head. (The reference's
  `awesome/model/dense_net.py` is dead code with a broken import
  (`from torch.nn import nn`); this is the working equivalent of its
  evident intent: a plain depth-N MLP.)
- :class:`NormNet` — explicit normalize -> net -> denormalize wrapper
  (`awesome/model/norm_net.py:6-41`) for cases where the norm is not
  folded into a composite like PathConnectedNet.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from awesome_tpu.nn.linear import Linear
from awesome_tpu.nn.module import Module


@dataclasses.dataclass(frozen=True)
class ForwardModule(Module):
    def init(self, key):
        del key
        return {}

    def apply(self, params, x, *args, **kwargs):
        return x


@dataclasses.dataclass(frozen=True)
class DenseNet(Module):
    in_features: int = 5
    out_features: int = 1
    width: int = 128
    depth: int = 2

    def init(self, key):
        keys = jax.random.split(key, self.depth + 1)
        layers = [Linear(self.in_features, self.width).init(keys[0])]
        for i in range(self.depth - 1):
            layers.append(Linear(self.width, self.width).init(keys[i + 1]))
        layers.append(Linear(self.width, self.out_features).init(keys[-1]))
        return {"layers": layers}

    def apply(self, params, x):
        *hidden, last = params["layers"]
        for lyr in hidden:
            x = jax.nn.relu(x @ lyr["w"] + lyr["b"])
        return x @ last["w"] + last["b"]


@dataclasses.dataclass(frozen=True)
class NormNet(Module):
    net: Module = None
    norm: object = None  # MinMax | MeanStd (static stats)

    def init(self, key):
        return self.net.init(key)

    def apply(self, params, x):
        if self.norm is not None:
            x = self.norm.transform(x)
        y = self.net.apply(params, x)
        if self.norm is not None:
            y = self.norm.inverse_transform(y)
        return y

    def inverse(self, params, y):
        if self.norm is not None:
            y = self.norm.transform(y)
        x = self.net.inverse(params, y)
        if self.norm is not None:
            x = self.norm.inverse_transform(x)
        return x


@dataclasses.dataclass(frozen=True)
class PixelMatrixSeg(Module):
    """Adapt an (image, grid)-signature segmentation net to pixel
    matrices (N, C): rgb = the last 3 channels, the encoding channels go
    in as the 'grid' — the functional form of the reference's ``pixelize``
    flow around FCNet in 2d mode (`awesome/util/pixelize.py:7`,
    `awesome/model/fc_net.py:10`)."""

    base: Module

    def init(self, key):
        return self.base.init(key)

    def apply(self, params, px, **kwargs):
        return self.base.apply(params, px[:, -3:], px[:, :-3])
