"""Parameter initializers matching the reference's PyTorch distributions.

The reference's prior nets are sensitive to init (mIoU parity depends on it,
cf. SURVEY.md §7 hard part (g)), so we reproduce torch's kaiming family
semantics exactly: `awesome/model/real_nvp/resnet_1d.py:9-38`
(``weights_init_normal`` / ``weights_init_uniform``) and torch's default
``nn.Linear.reset_parameters`` (kaiming_uniform with a=sqrt(5)).

Weights are stored as ``(in_features, out_features)`` (transposed vs. torch)
so the forward pass is ``x @ w + b``; fan_in is therefore ``w.shape[0]``.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def calculate_gain(activation: str, param: float = 0.0) -> float:
    """torch.nn.init.calculate_gain equivalent for the activations we use."""
    if activation in ("linear", "identity", "sigmoid", "conv1d", "conv2d"):
        return 1.0
    if activation == "tanh":
        return 5.0 / 3.0
    if activation == "relu":
        return math.sqrt(2.0)
    if activation == "leaky_relu":
        return math.sqrt(2.0 / (1.0 + param**2))
    if activation == "selu":
        return 3.0 / 4.0
    raise ValueError(f"Unsupported activation: {activation}")


def kaiming_uniform(key, in_features: int, out_features: int,
                    activation: str = "relu", param: float = 0.0,
                    dtype=jnp.float32) -> jnp.ndarray:
    """U(-bound, bound), bound = gain * sqrt(3 / fan_in)."""
    gain = calculate_gain(activation, param)
    bound = gain * math.sqrt(3.0 / in_features)
    return jax.random.uniform(
        key, (in_features, out_features), dtype, minval=-bound, maxval=bound
    )


def kaiming_normal(key, in_features: int, out_features: int,
                   activation: str = "relu", param: float = 0.0,
                   dtype=jnp.float32) -> jnp.ndarray:
    """N(0, std^2), std = gain / sqrt(fan_in)."""
    gain = calculate_gain(activation, param)
    std = gain / math.sqrt(in_features)
    return jax.random.normal(key, (in_features, out_features), dtype) * std


def fan_in_bias(key, in_features: int, out_features: int,
                activation: str = "relu", param: float = 0.0,
                dtype=jnp.float32) -> jnp.ndarray:
    """Bias ~ U(-std, std) with std = gain/sqrt(fan_in) — the convention of
    `awesome/model/real_nvp/resnet_1d.py:19-22`."""
    gain = calculate_gain(activation, param)
    std = gain / math.sqrt(in_features)
    return jax.random.uniform(
        key, (out_features,), dtype, minval=-std, maxval=std
    )


def torch_linear_default(key, in_features: int, out_features: int,
                         bias: bool = True, dtype=jnp.float32):
    """torch's default nn.Linear init: kaiming_uniform(a=sqrt(5)) for the
    weight (=> bound 1/sqrt(fan_in)) and U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    for the bias."""
    wk, bk = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    w = jax.random.uniform(
        wk, (in_features, out_features), dtype, minval=-bound, maxval=bound
    )
    if not bias:
        return w, None
    b = jax.random.uniform(
        bk, (out_features,), dtype, minval=-bound, maxval=bound
    )
    return w, b
