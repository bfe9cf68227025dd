"""Additional flow families: Glow-style blocks and rational-quadratic
spline couplings.

Equivalents of the reference's normflows-based factories
`awesome/model/net_factory.py:43-68` (``init_glow``: GlowBlock stack =
ActNorm + invertible LU-linear + affine coupling with sigmoid scale map)
and `:17-41` (``init_splines``: autoregressive rational-quadratic splines
with LU-linear permutes) — re-built for point matrices (N, C) with
analytic inverses; spline math follows Durkan et al. (Neural Spline
Flows), implemented as coupling (not autoregressive) layers, which for
C=2 coordinates is the same expressivity with a cheaper inverse.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from awesome_tpu.nn.flows import binary_counting_masks
from awesome_tpu.nn.linear import Linear
from awesome_tpu.nn.module import Module


# --- Glow ---------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GlowFlow(Module):
    """Stack of Glow steps on (N, C): ActNorm -> LU-parameterized
    invertible linear -> masked affine coupling with sigmoid scale map
    (``scale_map='sigmoid'`` semantics: scale = sigmoid(s + 2), bounded,
    never zero)."""

    channels: int = 2
    hidden_channels: int = 64
    n_flows: int = 4

    def _mlp_init(self, key):
        k1, _ = jax.random.split(key)
        return {
            "l1": Linear(self.channels, self.hidden_channels).init(k1),
            "l2": {
                "w": jnp.zeros((self.hidden_channels, 2 * self.channels),
                               jnp.float32),
                "b": jnp.zeros((2 * self.channels,), jnp.float32),
            },
        }

    def _mlp(self, p, x):
        h = jax.nn.leaky_relu(x @ p["l1"]["w"] + p["l1"]["b"],
                              negative_slope=0.01)
        return h @ p["l2"]["w"] + p["l2"]["b"]

    def init(self, key):
        c = self.channels
        keys = jax.random.split(key, 2 * self.n_flows)
        steps = []
        masks = binary_counting_masks(c, self.n_flows)
        for i in range(self.n_flows):
            # LU parameterization: W = P L U with unit-diag L, free U diag
            perm = jax.random.permutation(keys[2 * i], c)
            p_mat = jnp.eye(c)[perm]
            steps.append(
                {
                    "an_s": jnp.zeros((c,), jnp.float32),
                    "an_t": jnp.zeros((c,), jnp.float32),
                    "P": p_mat,
                    "L": jnp.zeros((c, c), jnp.float32),  # strictly lower
                    "U": jnp.zeros((c, c), jnp.float32),  # strictly upper
                    "log_s": jnp.zeros((c,), jnp.float32),  # U diagonal
                    "st": self._mlp_init(keys[2 * i + 1]),
                    "mask": jnp.asarray(masks[i]),
                }
            )
        return {"steps": steps}

    @staticmethod
    def _lu_weight(step):
        c = step["P"].shape[0]
        tril = jnp.tril(step["L"], -1) + jnp.eye(c)
        triu = jnp.triu(step["U"], 1) + jnp.diag(jnp.exp(step["log_s"]))
        return step["P"] @ tril @ triu

    def apply(self, params, x):
        z = x
        for step in params["steps"]:
            z = z * jnp.exp(step["an_s"]) + step["an_t"]
            z = z @ self._lu_weight(step).T
            b = jax.lax.stop_gradient(step["mask"])
            zm = b * z
            st = self._mlp(step["st"], zm)
            s, t = st[:, : self.channels], st[:, self.channels:]
            scale = jax.nn.sigmoid(s + 2.0)
            z = zm + (1.0 - b) * (z * scale + t)
        return z

    def inverse(self, params, y):
        z = y
        for step in reversed(params["steps"]):
            b = jax.lax.stop_gradient(step["mask"])
            zm = b * z
            st = self._mlp(step["st"], zm)
            s, t = st[:, : self.channels], st[:, self.channels:]
            scale = jax.nn.sigmoid(s + 2.0)
            z = zm + (1.0 - b) * (z - t) / scale
            w_inv = jnp.linalg.inv(self._lu_weight(step))
            z = z @ w_inv.T
            z = (z - step["an_t"]) * jnp.exp(-step["an_s"])
        return z


# --- rational-quadratic splines -----------------------------------------


def _rqs(x, widths, heights, derivs, bound: float, inverse: bool):
    """Monotonic rational-quadratic spline on [-bound, bound], identity
    outside. widths/heights (..., K) positive normalized bins; derivs
    (..., K+1) positive knot derivatives (boundary derivs pinned to 1)."""
    k = widths.shape[-1]
    cw = jnp.concatenate(
        [jnp.zeros(widths.shape[:-1] + (1,)), jnp.cumsum(widths, -1)], -1
    )
    ch = jnp.concatenate(
        [jnp.zeros(heights.shape[:-1] + (1,)), jnp.cumsum(heights, -1)], -1
    )
    xk = -bound + 2 * bound * cw  # knot x positions (..., K+1)
    yk = -bound + 2 * bound * ch

    inside = (x > -bound) & (x < bound)
    xs = jnp.clip(x, -bound + 1e-6, bound - 1e-6)

    ref = yk if inverse else xk
    idx = jnp.clip(
        jnp.sum((xs[..., None] >= ref[..., :-1]).astype(jnp.int32), -1) - 1,
        0,
        k - 1,
    )

    def take(a):
        return jnp.take_along_axis(a, idx[..., None], axis=-1)[..., 0]

    x_lo, x_hi = take(xk[..., :-1]), take(xk[..., 1:])
    y_lo, y_hi = take(yk[..., :-1]), take(yk[..., 1:])
    d_lo, d_hi = take(derivs[..., :-1]), take(derivs[..., 1:])
    w = jnp.maximum(x_hi - x_lo, 1e-6)
    h = jnp.maximum(y_hi - y_lo, 1e-6)
    slope = h / w

    if not inverse:
        theta = (xs - x_lo) / w
        num = h * (slope * theta**2 + d_lo * theta * (1 - theta))
        den = slope + (d_hi + d_lo - 2 * slope) * theta * (1 - theta)
        out = y_lo + num / den
    else:
        yq = xs - y_lo
        a = h * (slope - d_lo) + yq * (d_hi + d_lo - 2 * slope)
        bq = h * d_lo - yq * (d_hi + d_lo - 2 * slope)
        cq = -slope * yq
        disc = jnp.maximum(bq**2 - 4 * a * cq, 0.0)
        theta = 2 * cq / (-bq - jnp.sqrt(disc))
        out = x_lo + theta * w
    return jnp.where(inside, out, x)


@dataclasses.dataclass(frozen=True)
class SplineFlow(Module):
    """Coupling rational-quadratic spline flow on (N, C) points.

    The transformed channels' spline parameters come from an MLP over the
    masked channels (zero-initialized output layer -> starts near
    identity). ``num_bins`` knots on [-bound, bound]."""

    channels: int = 2
    hidden_units: int = 32
    n_flows: int = 4
    num_bins: int = 8
    bound: float = 3.0

    def _param_dim(self):
        return 3 * self.num_bins + 1

    def _mlp_init(self, key):
        k1, _ = jax.random.split(key)
        out_dim = self.channels * self._param_dim()
        return {
            "l1": Linear(self.channels, self.hidden_units).init(k1),
            "l2": {
                "w": jnp.zeros((self.hidden_units, out_dim), jnp.float32),
                "b": jnp.zeros((out_dim,), jnp.float32),
            },
        }

    def _mlp(self, p, x):
        h = jax.nn.leaky_relu(x @ p["l1"]["w"] + p["l1"]["b"],
                              negative_slope=0.01)
        return h @ p["l2"]["w"] + p["l2"]["b"]

    def init(self, key):
        masks = binary_counting_masks(self.channels, self.n_flows)
        keys = jax.random.split(key, self.n_flows)
        return {
            "steps": [
                {"st": self._mlp_init(keys[i]), "mask": jnp.asarray(masks[i])}
                for i in range(self.n_flows)
            ]
        }

    def _spline_params(self, step, z):
        b = jax.lax.stop_gradient(step["mask"])
        raw = self._mlp(step["st"], b * z)
        n, k = z.shape[0], self.num_bins
        raw = raw.reshape(n, self.channels, self._param_dim())
        widths = jax.nn.softmax(raw[..., :k], -1)
        heights = jax.nn.softmax(raw[..., k : 2 * k], -1)
        d_inner = jax.nn.softplus(raw[..., 2 * k :] + 0.5413)  # ~1 at init
        ones = jnp.ones(d_inner.shape[:-1] + (1,))
        derivs = jnp.concatenate([ones, d_inner[..., 1:-1], ones], -1)
        return b, widths, heights, derivs

    def _couple(self, step, z, inverse: bool):
        b, widths, heights, derivs = self._spline_params(step, z)
        out = _rqs(z, widths, heights, derivs, self.bound, inverse)
        return b * z + (1.0 - b) * out

    def apply(self, params, x):
        z = x
        for step in params["steps"]:
            z = self._couple(step, z, inverse=False)
        return z

    def inverse(self, params, y):
        z = y
        for step in reversed(params["steps"]):
            z = self._couple(step, z, inverse=True)
        return z
