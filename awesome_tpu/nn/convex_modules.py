"""Alternative ICNN building blocks: positivity reparameterizations and
principled convex initialisation.

Behavior port of `awesome/model/convex_modules.py:12-231` (Positivity
family, ConvexLinear/ConvexConv2d/ConvexLayerNorm, skip wrappers) and
`awesome/model/convex_init.py` (Hoedt & Klambauer, "Principled Weight
Initialisation for Input-Convex Neural Networks": log-normal weights
targeting variance/correlation fixed points).

Unlike the projection-based ICNNs in ``awesome_tpu.nn.icnn`` (clip after
the optimizer step), these keep convexity by a *forward-pass weight
transform* — exp / relu / negexp of a free parameter — which is the
natural functional formulation: no post-step hook needed, gradients flow
through the transform.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from awesome_tpu.nn.linear import Linear
from awesome_tpu.nn.module import Module

# --- positivity transforms ----------------------------------------------


def no_positivity(w):
    """Dummy — compare ICNNs to regular nets. Spec: `:25-33`."""
    return w


def clipped_positivity(w):
    """relu(w) in the forward pass. Spec: `:79-86`."""
    return jax.nn.relu(w)


def negexp_positivity(w):
    """exp(w) for negative entries only (Sivaprasad et al.). Spec: `:53-64`."""
    return jnp.where(w < 0, jnp.exp(w), w)


def exponential_positivity(w):
    """exp(w) — always positive. Spec: `:66-76`."""
    return jnp.exp(w)


def exponential_inverse(w_pos):
    return jnp.log(w_pos)


POSITIVITIES: dict = {
    "none": no_positivity,
    "clipped": clipped_positivity,
    "negexp": negexp_positivity,
    "exp": exponential_positivity,
}

# NOTE: the reference's LazyClippedPositivity (clip the stored weight after
# each update, `:36-50`) is exactly the projection implemented by
# ``enforce_convexity`` in awesome_tpu.nn.icnn — it is a training-loop
# transform, not a forward transform, so it lives there.


@dataclasses.dataclass(frozen=True)
class ConvexLinear(Module):
    """Linear layer whose effective weight is positivity(weight).

    Spec: `convex_modules.py:89-100`.
    """

    in_features: int
    out_features: int
    positivity: str = "exp"
    bias: bool = True

    def init(self, key, initialiser: Optional["ConvexInitialiser"] = None):
        if initialiser is None and self.positivity == "exp":
            initialiser = ConvexInitialiser()
        if initialiser is not None:
            return initialiser.init(
                key, self.in_features, self.out_features,
                positivity=self.positivity, bias=self.bias,
            )
        return Linear(self.in_features, self.out_features,
                      bias=self.bias).init(key)

    def apply(self, params, x):
        w = POSITIVITIES[self.positivity](params["w"])
        y = x @ w
        if self.bias and "b" in params:
            y = y + params["b"]
        return y


@dataclasses.dataclass(frozen=True)
class ConvexConv2d(Module):
    """NHWC conv with positive effective weights. Spec: `:103-117`."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    positivity: str = "exp"

    def init(self, key):
        from awesome_tpu.nn.conv import Conv2d

        params = Conv2d(self.in_channels, self.out_channels,
                        self.kernel_size).init(key)
        if self.positivity == "exp":
            # start near the magnitude of the raw init
            params = dict(
                params, w=jnp.log(jnp.abs(params["w"]) + 1e-4)
            )
        return params

    def apply(self, params, x):
        from awesome_tpu.nn.conv import conv2d

        w = POSITIVITIES[self.positivity](params["w"])
        return conv2d(x, w, params.get("b"))


@dataclasses.dataclass(frozen=True)
class ConvexLayerNorm(Module):
    """LayerNorm with positive scale — affine transform stays convexity-
    preserving. Spec: `convex_modules.py:120-160`."""

    features: int
    positivity: str = "exp"
    eps: float = 1e-5

    def init(self, key):
        del key
        scale0 = (
            jnp.zeros((self.features,))  # exp(0) = 1
            if self.positivity == "exp"
            else jnp.ones((self.features,))
        )
        return {"scale": scale0, "bias": jnp.zeros((self.features,))}

    def apply(self, params, x):
        # NOTE: mean subtraction breaks convexity in general; like the
        # reference, normalization uses a positive scale and is intended
        # for the unconstrained input path.
        mean = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        xn = (x - mean) * jax.lax.rsqrt(var + self.eps)
        scale = POSITIVITIES[self.positivity](params["scale"])
        return xn * scale + params["bias"]


@dataclasses.dataclass(frozen=True)
class LinearSkip(Module):
    """Residual wrapper: main(x) + skip(x) with a plain linear skip from
    the ORIGINAL input (keeps convexity: affine + convex). Spec: `:163-190`."""

    in_features: int
    out_features: int
    main: Module = None

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "main": self.main.init(k1),
            "skip": Linear(self.in_features, self.out_features,
                           bias=False).init(k2),
        }

    def apply(self, params, x, x_input=None):
        x_input = x if x_input is None else x_input
        return self.main.apply(params["main"], x) + (
            x_input @ params["skip"]["w"]
        )


# --- principled convex initialisation ------------------------------------


@dataclasses.dataclass(frozen=True)
class TraditionalInitialiser:
    """Variance-scaling normal init. Spec: `convex_init.py:12-33`."""

    gain: float = 1.0

    def init(self, key, in_features, out_features, bias=True, **_):
        wk, _ = jax.random.split(key)
        std = math.sqrt(self.gain / in_features)
        params = {
            "w": std * jax.random.normal(wk, (in_features, out_features))
        }
        if bias:
            params["b"] = jnp.zeros((out_features,))
        return params


@dataclasses.dataclass(frozen=True)
class ConvexInitialiser:
    """Log-normal weight init for ICNN layers targeting variance/
    correlation fixed points (var=1, corr=0.5 defaults).

    Spec: `convex_init.py:77-195`: weights ~ LogNormal with squared mean
    ``corr / f_c(fan_in)`` and variance ``relu_scale (1-corr)/fan_in``;
    bias mean ``-fan_in sqrt(mean_sq var / 2 pi)``.

    For positivity='exp' layers the *raw* parameter stores log(weight).
    """

    var: float = 1.0
    corr: float = 0.5
    bias_noise: float = 0.0
    alpha: float = 0.0

    def corr_func(self, fan_in: int) -> float:
        rho = self.corr
        mix_mom = math.sqrt(1 - rho**2) + rho * math.acos(-rho)
        return fan_in / (2 * math.pi) * mix_mom + fan_in * (fan_in - 1) / 4.0

    def compute_parameters(self, fan_in: int):
        relu_scale = 2.0 / (1.0 + self.alpha**2)
        mean_sq = self.corr / self.corr_func(fan_in)
        w_var = relu_scale * (1.0 - self.corr) / fan_in
        shift = fan_in * math.sqrt(mean_sq * self.var / (2 * math.pi))
        b_var = 0.0
        if self.bias_noise > 0:
            w_var *= 1 - self.bias_noise
            b_var = self.bias_noise * (1.0 - self.corr) * self.var
        return (mean_sq, w_var), (-shift, b_var)

    def init(self, key, in_features, out_features, positivity="exp",
             bias=True):
        (mean_sq, w_var), (b_mean, b_var) = self.compute_parameters(
            in_features
        )
        wk, bk = jax.random.split(key)
        # log-normal sampling (convex_init.py:119-140)
        log_mom2 = math.log(mean_sq + w_var)
        log_mean = math.log(mean_sq) - log_mom2 / 2.0
        log_var = log_mom2 - math.log(mean_sq)
        log_w = log_mean + math.sqrt(log_var) * jax.random.normal(
            wk, (in_features, out_features)
        )
        if positivity == "exp":
            raw_w = log_w  # exp(raw) = weight
        else:
            raw_w = jnp.exp(log_w)
        params = {"w": raw_w}
        if bias:
            params["b"] = b_mean + math.sqrt(b_var) * jax.random.normal(
                bk, (out_features,)
            )
        return params


@dataclasses.dataclass(frozen=True)
class ConvexMLP(Module):
    """ICNN built from ConvexLinear layers (exp positivity) with input
    skips and principled init — the convex_modules-flavored alternative to
    ConvexNextNet."""

    in_features: int = 2
    hidden: int = 64
    depth: int = 2
    positivity: str = "exp"

    def init(self, key):
        keys = jax.random.split(key, 2 * self.depth + 2)
        first = Linear(self.in_features, self.hidden).init(keys[0])
        layers = []
        init = ConvexInitialiser()
        for i in range(self.depth - 1):
            layers.append(
                {
                    "main": ConvexLinear(
                        self.hidden, self.hidden, self.positivity
                    ).init(keys[1 + 2 * i], init),
                    "skip": Linear(self.in_features, self.hidden,
                                   bias=False).init(keys[2 + 2 * i]),
                }
            )
        out = {
            "main": ConvexLinear(self.hidden, 1, self.positivity).init(
                keys[-2], init
            ),
            "skip": Linear(self.in_features, 1, bias=False).init(keys[-1]),
        }
        return {"first": first, "layers": layers, "out": out}

    def apply(self, params, x):
        lin = ConvexLinear(self.hidden, self.hidden, self.positivity)
        out_lin = ConvexLinear(self.hidden, 1, self.positivity)
        h = jax.nn.relu(x @ params["first"]["w"] + params["first"]["b"])
        for blk in params["layers"]:
            h = jax.nn.relu(
                lin.apply(blk["main"], h) + x @ blk["skip"]["w"]
            )
        return out_lin.apply(params["out"]["main"], h) + x @ params["out"][
            "skip"
        ]["w"]

    def enforce_convexity(self, params):
        # positivity is a forward reparameterization: nothing to project
        return params
