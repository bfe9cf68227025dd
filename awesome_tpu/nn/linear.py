"""Linear layers as pure param-dict functions.

``Linear`` mirrors torch nn.Linear; ``WNLinear`` mirrors the reference's
weight-normalized linear with a *scalar* norm (weight_norm dim=None,
`awesome/model/real_nvp/resnet_1d.py:40-65`): w = g * v / ||v||_F.

Parameters are dicts so stacked-tree vmapping and convexity clipping stay
trivial. Weight layout is (in, out): forward is ``x @ w + b``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from awesome_tpu.nn import init as winit
from awesome_tpu.nn.module import Module


@dataclasses.dataclass(frozen=True)
class Linear(Module):
    in_features: int
    out_features: int
    bias: bool = True
    # init: 'torch_default' | ('uniform', act) | ('normal', act) | 'ones' | 'zeros'
    init_mode: str = "torch_default"
    init_activation: str = "relu"

    def init(self, key):
        if self.init_mode == "torch_default":
            w, b = winit.torch_linear_default(
                key, self.in_features, self.out_features, bias=self.bias
            )
        else:
            wk, bk = jax.random.split(key)
            if self.init_mode == "uniform":
                w = winit.kaiming_uniform(
                    wk, self.in_features, self.out_features, self.init_activation
                )
            elif self.init_mode == "normal":
                w = winit.kaiming_normal(
                    wk, self.in_features, self.out_features, self.init_activation
                )
            elif self.init_mode == "zeros":
                w = jnp.zeros((self.in_features, self.out_features), jnp.float32)
            elif self.init_mode == "ones":
                w = jnp.ones((self.in_features, self.out_features), jnp.float32)
            else:
                raise ValueError(f"Unknown init_mode {self.init_mode}")
            b = (
                winit.fan_in_bias(
                    bk, self.in_features, self.out_features, self.init_activation
                )
                if self.bias
                else None
            )
        params = {"w": w}
        if self.bias:
            params["b"] = b if b is not None else jnp.zeros((self.out_features,), jnp.float32)
        return params

    def apply(self, params, x):
        y = x @ params["w"]
        if self.bias:
            y = y + params["b"]
        return y


def wn_weight(params) -> jnp.ndarray:
    """Effective weight of a WNLinear param dict: g * v / ||v||_F."""
    v = params["v"]
    norm = jnp.sqrt(jnp.sum(v * v))
    return params["g"] * v / jnp.maximum(norm, 1e-12)


@dataclasses.dataclass(frozen=True)
class WNLinear(Module):
    """Weight-normalized linear, scalar g (torch weight_norm dim=None).

    Spec: `awesome/model/real_nvp/resnet_1d.py:40-65`. torch initializes
    g = ||w||_F of the torch-default-initialized w; ``reset_parameters``
    sets g = 1 and v ~ kaiming_uniform(activation). We support both via
    ``init_mode``.
    """

    in_features: int
    out_features: int
    bias: bool = True
    init_mode: str = "torch_default"  # or 'uniform'/'normal' (g=1)
    init_activation: str = "relu"

    def init(self, key):
        if self.init_mode == "torch_default":
            v, b = winit.torch_linear_default(
                key, self.in_features, self.out_features, bias=self.bias
            )
            g = jnp.sqrt(jnp.sum(v * v))
        else:
            vk, bk = jax.random.split(key)
            if self.init_mode == "uniform":
                v = winit.kaiming_uniform(
                    vk, self.in_features, self.out_features, self.init_activation
                )
            elif self.init_mode == "normal":
                v = winit.kaiming_normal(
                    vk, self.in_features, self.out_features, self.init_activation
                )
            else:
                raise ValueError(f"Unknown init_mode {self.init_mode}")
            g = jnp.asarray(1.0)
            b = (
                winit.fan_in_bias(
                    bk, self.in_features, self.out_features, self.init_activation
                )
                if self.bias
                else None
            )
        params = {"v": v, "g": g}
        if self.bias:
            params["b"] = b if b is not None else jnp.zeros((self.out_features,), jnp.float32)
        return params

    def apply(self, params, x):
        y = x @ wn_weight(params)
        if self.bias:
            y = y + params["b"]
        return y


@dataclasses.dataclass(frozen=True)
class PerChannelAffine(Module):
    """Per-channel scale & shift on point matrices (N, C).

    The reference implements this as a 1x1 grouped Conv2d used for global
    coordinate translation in front of the flow
    (`awesome/model/path_connected_net.py:66` with init w=1, b=0 at :73-77).
    On flattened point matrices it is just ``x * w + b`` per channel.
    """

    channels: int

    def init(self, key):
        del key
        return {
            "w": jnp.ones((self.channels,), jnp.float32),
            "b": jnp.zeros((self.channels,), jnp.float32),
        }

    def apply(self, params, x):
        return x * params["w"] + params["b"]

    def inverse(self, params, y):
        """Spec: `awesome/model/path_connected_net.py:88-104`."""
        return (y - params["b"]) / params["w"]
