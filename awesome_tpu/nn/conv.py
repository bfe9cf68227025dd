"""Functional conv / batchnorm primitives in NHWC (TPU-native layout).

torch uses NCHW; XLA on TPU prefers NHWC, so all image tensors inside
models are (B, H, W, C) and converted at the data boundary. Weight layout
is HWIO. Init matches torch Conv2d defaults (kaiming_uniform a=sqrt(5) =>
bound 1/sqrt(fan_in), fan_in = kh*kw*cin).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from awesome_tpu.nn.module import Module


def conv2d(x, w, b=None, stride: int = 1, padding="SAME",
           compute_dtype=None):
    """x: (B, H, W, Cin), w: (kh, kw, Cin, Cout).

    ``compute_dtype`` (e.g. 'bfloat16'): cast the conv INPUTS so the MXU
    runs at its native bf16 rate (it accumulates in f32 internally); the
    output is cast back up so bias/batchnorm and master params stay f32.
    The backward pass then runs bf16 transposed convs too (the output
    cast's grad re-casts the cotangent) — the standard mixed-precision
    conv recipe."""
    out_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if compute_dtype is not None:
        y = y.astype(out_dtype)
    if b is not None:
        y = y + b
    return y


@dataclasses.dataclass(frozen=True)
class Conv2d(Module):
    in_channels: int
    out_channels: int
    kernel_size: int = 3
    bias: bool = True
    groups: int = 1

    def init(self, key):
        k = self.kernel_size
        fan_in = k * k * (self.in_channels // self.groups)
        bound = 1.0 / math.sqrt(fan_in)
        wk, bk = jax.random.split(key)
        w = jax.random.uniform(
            wk,
            (k, k, self.in_channels // self.groups, self.out_channels),
            minval=-bound,
            maxval=bound,
        )
        params = {"w": w}
        if self.bias:
            params["b"] = jax.random.uniform(
                bk, (self.out_channels,), minval=-bound, maxval=bound
            )
        return params

    def apply(self, params, x):
        if self.groups == 1:
            return conv2d(x, params["w"], params.get("b"))
        y = jax.lax.conv_general_dilated(
            x,
            params["w"],
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if self.bias:
            y = y + params["b"]
        return y


def batchnorm_init(channels: int):
    return {
        "scale": jnp.ones((channels,), jnp.float32),
        "bias": jnp.zeros((channels,), jnp.float32),
    }, {
        "mean": jnp.zeros((channels,), jnp.float32),
        "var": jnp.ones((channels,), jnp.float32),
        "count": jnp.zeros((), jnp.int32),
    }


def batchnorm_apply(params, state, x, train: bool, momentum: float = 0.1,
                    eps: float = 1e-5):
    """torch BatchNorm2d semantics on NHWC input. Returns (y, new_state).

    train=True uses batch stats and updates running stats; train=False uses
    running stats.
    """
    if train:
        mean = x.mean(axis=(0, 1, 2))
        var = x.var(axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
            "count": state["count"] + 1,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"] + params["bias"]
    return y, new_state


def max_pool2x2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def upsample_bilinear_2x(x):
    """Bilinear 2x upsample with align_corners=True (torch Upsample in the
    reference UNet, `awesome/model/unet_parts.py:55`)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


def pad_to_match(x, target_h: int, target_w: int):
    """F.pad to match skip-connection spatial dims (`unet_parts.py:66-70`)."""
    dh = target_h - x.shape[1]
    dw = target_w - x.shape[2]
    return jnp.pad(
        x,
        (
            (0, 0),
            (dh // 2, dh - dh // 2),
            (dw // 2, dw - dw // 2),
            (0, 0),
        ),
    )
