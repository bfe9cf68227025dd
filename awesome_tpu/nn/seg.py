"""Segmentation networks: pointwise MLPs (Net/FCNet) and conv nets
(CNNNet/UNet) — the baseline segmentors of the reference model zoo.

Input convention: pointwise nets take (N, C) point matrices; conv nets take
NHWC images. ``concat_input`` implements the rgb|xy|rgbxy input switch
(`awesome/model/cnn_net.py:18-28`).

Stateful batchnorm (UNet) returns ``(out, new_state)``; run with
``train=False`` for inference against frozen running stats.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from awesome_tpu.nn.conv import (
    Conv2d,
    batchnorm_apply,
    batchnorm_init,
    max_pool2x2,
    pad_to_match,
    upsample_bilinear_2x,
)
from awesome_tpu.nn.linear import Linear
from awesome_tpu.nn.module import Module


def concat_input(in_type: str, image, grid, axis: int = -1):
    """rgb | xy | rgbxy input selection. Spec: `awesome/model/cnn_net.py:18-28`."""
    if in_type == "rgb":
        return image
    if in_type == "xy":
        return grid
    if in_type == "rgbxy":
        return jnp.concatenate((image, grid), axis=axis)
    raise ValueError(
        f"in_type must be one of: rgb, xy, rgbxy but was: {in_type}"
    )


@dataclasses.dataclass(frozen=True)
class Net(Module):
    """5->1 pointwise MLP over (y, x, r, g, b) pixels — the convexity
    benchmark's segmentor. Spec: `awesome/model/net.py:8-25`."""

    n_hidden: int = 130
    in_features: int = 5

    def init(self, key):
        k = jax.random.split(key, 3)
        return {
            "W0": Linear(self.in_features, self.n_hidden).init(k[0]),
            "W1": Linear(self.n_hidden, self.n_hidden).init(k[1]),
            "W2": Linear(self.n_hidden, 1).init(k[2]),
        }

    def apply(self, params, x):
        h = jax.nn.relu(x @ params["W0"]["w"] + params["W0"]["b"])
        h = jax.nn.relu(h @ params["W1"]["w"] + params["W1"]["b"])
        return h @ params["W2"]["w"] + params["W2"]["b"]


@dataclasses.dataclass(frozen=True)
class FCNet(Module):
    """Variable width/depth pointwise MLP with in_type switch.

    Spec: `awesome/model/fc_net.py:10-60`.
    """

    in_chn: int
    out_chn: int
    width: int
    depth: int
    in_type: str = "rgbxy"

    def init(self, key):
        keys = jax.random.split(key, self.depth + 2)
        layers = [Linear(self.in_chn, self.width).init(keys[0])]
        for i in range(self.depth):
            layers.append(Linear(self.width, self.width).init(keys[i + 1]))
        layers.append(Linear(self.width, self.out_chn).init(keys[-1]))
        return {"layers": layers}

    def apply(self, params, image, grid):
        x = concat_input(self.in_type, image, grid)
        *hidden, last = params["layers"]
        for lyr in hidden:
            x = jax.nn.relu(x @ lyr["w"] + lyr["b"])
        return x @ last["w"] + last["b"]


@dataclasses.dataclass(frozen=True)
class CNNNet(Module):
    """Variable width/depth conv net (LeakyReLU first, ReLU blocks).

    Spec: `awesome/model/cnn_net.py:31-110`. NHWC images.
    """

    in_chn: int
    out_chn: int
    kernel_size: int = 3
    width: int = 32
    depth: int = 2
    in_type: str = "rgbxy"

    def init(self, key):
        assert self.kernel_size % 2 == 1
        keys = jax.random.split(key, self.depth + 2)
        convs = [
            Conv2d(self.in_chn, self.width, self.kernel_size).init(keys[0])
        ]
        for i in range(self.depth):
            convs.append(
                Conv2d(self.width, self.width, self.kernel_size).init(
                    keys[i + 1]
                )
            )
        convs.append(Conv2d(self.width, self.out_chn, 1).init(keys[-1]))
        return {"convs": convs}

    def apply(self, params, image, grid):
        from awesome_tpu.nn.conv import conv2d

        x = concat_input(self.in_type, image, grid)
        first, *blocks, last = params["convs"]
        x = jax.nn.leaky_relu(conv2d(x, first["w"], first.get("b")),
                              negative_slope=0.01)
        for blk in blocks:
            x = jax.nn.relu(conv2d(x, blk["w"], blk.get("b")))
        return conv2d(x, last["w"], last.get("b"))


def _double_conv_init(key, in_ch: int, out_ch: int):
    k1, k2 = jax.random.split(key)
    p1, s1 = batchnorm_init(out_ch)
    p2, s2 = batchnorm_init(out_ch)
    return (
        {
            "conv1": Conv2d(in_ch, out_ch, 3).init(k1),
            "bn1": p1,
            "conv2": Conv2d(out_ch, out_ch, 3).init(k2),
            "bn2": p2,
        },
        {"bn1": s1, "bn2": s2},
    )


def _double_conv_apply(params, state, x, train, compute_dtype=None):
    from awesome_tpu.nn.conv import conv2d

    x = conv2d(x, params["conv1"]["w"], params["conv1"].get("b"),
               compute_dtype=compute_dtype)
    x, s1 = batchnorm_apply(params["bn1"], state["bn1"], x, train)
    x = jax.nn.relu(x)
    x = conv2d(x, params["conv2"]["w"], params["conv2"].get("b"),
               compute_dtype=compute_dtype)
    x, s2 = batchnorm_apply(params["bn2"], state["bn2"], x, train)
    x = jax.nn.relu(x)
    return x, {"bn1": s1, "bn2": s2}


@dataclasses.dataclass(frozen=True)
class UNet(Module):
    """4-down/4-up UNet, input = concat(image, feature_encoding) — the FBMS
    segmentation backbone. Spec: `awesome/model/unet.py:10-46` with parts at
    `awesome/model/unet_parts.py` (bilinear 2x upsample, pad-to-match skip).

    Stateful: ``init`` returns ``(params, state)``; ``apply(params, state,
    image, features, train)`` returns ``(logits, new_state)``.
    """

    in_chn: int = 5
    out_chn: int = 1
    # 'bfloat16' runs every conv's MXU pass at the native bf16 rate
    # (f32 accumulation, batchnorm and master params — see nn.conv.conv2d)
    compute_dtype: str = None

    _CH = (64, 128, 256, 512, 512)

    def init(self, key):
        keys = jax.random.split(key, 10)
        params, state = {}, {}
        params["inc"], state["inc"] = _double_conv_init(keys[0], self.in_chn, 64)
        down_io = [(64, 128), (128, 256), (256, 512), (512, 512)]
        for i, (ci, co) in enumerate(down_io):
            params[f"down{i+1}"], state[f"down{i+1}"] = _double_conv_init(
                keys[1 + i], ci, co
            )
        # Up(in_ch, out_ch): conv sees cat(skip, upsampled) with in_ch total
        up_io = [(1024, 256), (512, 128), (256, 64), (128, 64)]
        for i, (ci, co) in enumerate(up_io):
            params[f"up{i+1}"], state[f"up{i+1}"] = _double_conv_init(
                keys[5 + i], ci, co
            )
        params["outc"] = Conv2d(64, self.out_chn, 1).init(keys[9])
        return params, state

    def apply(self, params, state, image, features, train: bool = False):
        from awesome_tpu.nn.conv import conv2d

        cd = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        x = jnp.concatenate((image, features), axis=-1)
        new_state = {}
        x1, new_state["inc"] = _double_conv_apply(
            params["inc"], state["inc"], x, train, cd
        )
        skips = [x1]
        h = x1
        for i in range(1, 5):
            h = max_pool2x2(h)
            h, new_state[f"down{i}"] = _double_conv_apply(
                params[f"down{i}"], state[f"down{i}"], h, train, cd
            )
            skips.append(h)
        x1, x2, x3, x4, x5 = skips
        h = x5
        for i, skip in enumerate((x4, x3, x2, x1), start=1):
            h = upsample_bilinear_2x(h)
            h = pad_to_match(h, skip.shape[1], skip.shape[2])
            h = jnp.concatenate([skip, h], axis=-1)
            h, new_state[f"up{i}"] = _double_conv_apply(
                params[f"up{i}"], state[f"up{i}"], h, train, cd
            )
        out = conv2d(h, params["outc"]["w"], params["outc"].get("b"),
                     compute_dtype=cd)
        return out, new_state
