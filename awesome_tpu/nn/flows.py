"""Normalizing flows (diffeomorphisms) for the path-connectedness prior.

A learned diffeomorphism in front of an ICNN relaxes "convex" to
"path-connected" (diffeomorphic image of a convex set). Three families, all
with analytic inverses, all operating on point matrices (N, C) in float32
(bf16 exp scales are a NaN hazard — SURVEY.md §7 hard part (d)):

- :class:`DiffeomorphismNet` — tiny hand-rolled 2-coupling flow with capped
  exp scales (spec: `awesome/model/diffeomorphism_net.py:30-80`).
- :class:`NormalizingFlow1D` — alternating coupling flow with pluggable
  scale/translate backbones and learnable WN scales
  (spec: `awesome/model/diffeomorphism_net.py:235-302`).
- :class:`RealNVPFlow` — masked affine couplings + ActNorm, the equivalent
  of the reference's normflows-based ``init_realnvp`` factory
  (spec: `awesome/model/net_factory.py:70-114`), used by the flagship
  path-connected model.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from awesome_tpu.nn import init as winit
from awesome_tpu.nn.linear import Linear, WNLinear, wn_weight
from awesome_tpu.nn.module import Module


def capped_exp(x, thresh: float = 5.0, slope: float = 1e-2):
    """exp(x) for x < thresh, linear continuation above — keeps scale factors
    finite. Spec: `awesome/model/diffeomorphism_net.py:10-27`."""
    safe = jnp.minimum(x, thresh)
    return jnp.where(x < thresh, jnp.exp(safe), np.exp(thresh) + slope * x)


@dataclasses.dataclass(frozen=True)
class DiffeomorphismNet(Module):
    """Two hand-rolled coupling layers; scale/translate are 1->50->1 MLPs
    with zero-initialized output weights (starts at x2' = x2 * exp(0) + 0).
    """

    hidden: int = 50

    def _mlp_init(self, key, zero_out: bool):
        k1, k2 = jax.random.split(key)
        a = Linear(1, self.hidden).init(k1)
        b = Linear(self.hidden, 1).init(k2)
        if zero_out:
            b = dict(b, w=jnp.zeros_like(b["w"]))
        return {"a": a, "b": b}

    def init(self, key):
        keys = jax.random.split(key, 4)
        return {
            "l1_scale": self._mlp_init(keys[0], True),
            "l1_bias": self._mlp_init(keys[1], True),
            "l2_scale": self._mlp_init(keys[2], True),
            "l2_bias": self._mlp_init(keys[3], True),
        }

    @staticmethod
    def _mlp(p, x):
        h = jax.nn.relu(x @ p["a"]["w"] + p["a"]["b"])
        return h @ p["b"]["w"] + p["b"]["b"]

    def apply(self, params, x):
        x1, x2 = x[:, :1], x[:, 1:2]
        s = self._mlp(params["l1_scale"], x1)
        t = self._mlp(params["l1_bias"], x1)
        xx = x2 * capped_exp(s) + t
        ss = self._mlp(params["l2_scale"], xx)
        tt = self._mlp(params["l2_bias"], xx)
        yy = x1 * capped_exp(ss) + tt
        return jnp.concatenate([xx, yy], axis=1)

    def inverse(self, params, y):
        xx, yy = y[:, :1], y[:, 1:2]
        ss = self._mlp(params["l2_scale"], xx)
        tt = self._mlp(params["l2_bias"], xx)
        x1 = (yy - tt) / capped_exp(ss)
        s = self._mlp(params["l1_scale"], x1)
        t = self._mlp(params["l1_bias"], x1)
        x2 = (xx - t) / capped_exp(s)
        return jnp.concatenate([x1, x2], axis=1)


@dataclasses.dataclass(frozen=True)
class SimpleBackbone(Module):
    """WNLinear -> relu -> WNLinear -> tanh scale/translate backbone.

    Spec: `awesome/model/diffeomorphism_net.py:86-105`.
    """

    in_channels: int = 1
    network_width: int = 10
    out_channels: Optional[int] = None  # default: same as in_channels

    def init(self, key):
        k1, k2 = jax.random.split(key)
        out = self.out_channels or self.in_channels
        return {
            "linear1": WNLinear(self.in_channels, self.network_width).init(k1),
            "linear2": WNLinear(self.network_width, out).init(k2),
        }

    def apply(self, params, x):
        h = jax.nn.relu(
            x @ wn_weight(params["linear1"]) + params["linear1"]["b"]
        )
        return jnp.tanh(h @ wn_weight(params["linear2"]) + params["linear2"]["b"])


@dataclasses.dataclass(frozen=True)
class NormalBlock(Module):
    """WNLinear -> leaky_relu -> WNLinear -> tanh backbone.

    Spec: `awesome/model/diffeomorphism_net.py:173-196`.
    """

    in_channels: int = 1
    mid_channels: int = 128
    out_channels: int = 1

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "in_linear": WNLinear(self.in_channels, self.mid_channels).init(k1),
            "out_linear": WNLinear(self.mid_channels, self.out_channels).init(k2),
        }

    def apply(self, params, x):
        h = jax.nn.leaky_relu(
            x @ wn_weight(params["in_linear"]) + params["in_linear"]["b"],
            negative_slope=0.01,
        )
        return jnp.tanh(
            h @ wn_weight(params["out_linear"]) + params["out_linear"]["b"]
        )


def _wnscale_init(key):
    """Learnable scalar output scale s_out = WN(Linear(1,1))(weight).

    Spec: `awesome/model/diffeomorphism_net.py:211-233` ``WNScale``:
    scale layer w ~ N(0, 1), b = 0, input weight ~ 1 + 0.01 N(0,1).
    """
    k1, k2 = jax.random.split(key)
    return {
        "scale": {
            "v": jax.random.normal(k1, (1, 1)),
            "g": jnp.asarray(1.0),
            "b": jnp.zeros((1,), jnp.float32),
        },
        "weight": 1.0 + 0.01 * jax.random.normal(k2, (1,)),
    }


def _wnscale_apply(p):
    return p["weight"] @ wn_weight(p["scale"]) + p["scale"]["b"]


@dataclasses.dataclass(frozen=True)
class NormalizingFlow1D(Module):
    """Alternating coupling flow over 2 coordinates:
    ``x2' = exp(scale_i * s_i(x1)) * x2 + t_i(x1)`` (even i), swapped (odd i).

    Spec: `awesome/model/diffeomorphism_net.py:235-302`. The analytic
    inverse runs the couplings backwards.
    """

    num_coupling: int = 4
    width: int = 130
    in_features: int = 2
    backbone: str = "default"  # 'default' | 'normal_block'

    def _backbone(self) -> Module:
        # in_features > 2 rotates which channel is transformed (see apply);
        # the conditioning backbone then maps the other d-1 channels -> 1.
        # The reference declares this generalization in its divisibility
        # check (`diffeomorphism_net.py:246-249` num_coupling %
        # in_features) but its forward only implements d = 2.
        cond = max(self.in_features - 1, 1)
        if self.backbone == "default":
            return SimpleBackbone(in_channels=cond, network_width=self.width,
                                  out_channels=1)
        if self.backbone in ("residual_block", "normal_block"):
            return NormalBlock(in_channels=cond, mid_channels=self.width, out_channels=1)
        raise ValueError(f"Unknown backbone: {self.backbone}")

    def init(self, key):
        if self.num_coupling % self.in_features != 0:
            raise ValueError(
                "Number of coupling layers should be divisible by in_features"
            )
        bb = self._backbone()
        keys = jax.random.split(key, 3 * self.num_coupling)
        return {
            "s": [bb.init(keys[3 * i]) for i in range(self.num_coupling)],
            "t": [bb.init(keys[3 * i + 1]) for i in range(self.num_coupling)],
            "scale": [
                _wnscale_init(keys[3 * i + 2]) for i in range(self.num_coupling)
            ],
        }

    def apply(self, params, x):
        # Coupling i transforms channel j = (i+1) % d conditioned on the
        # other d-1 channels. For d = 2 this is exactly the reference's
        # alternating scheme (even i: x2' = exp(s(x1))*x2 + t(x1)); for
        # d > 2 it is the rotation its divisibility check promises.
        bb = self._backbone()
        d = self.in_features
        cols = [x[:, j:j + 1] for j in range(d)]
        for i in range(self.num_coupling):
            j = (i + 1) % d
            cond = jnp.concatenate(
                [cols[k] for k in range(d) if k != j], axis=1
            )
            scale = _wnscale_apply(params["scale"][i])
            s = scale * bb.apply(params["s"][i], cond)
            cols[j] = jnp.exp(s) * cols[j] + bb.apply(params["t"][i], cond)
        return jnp.concatenate(cols, axis=1)

    def inverse(self, params, y):
        bb = self._backbone()
        d = self.in_features
        cols = [y[:, j:j + 1] for j in range(d)]
        for i in reversed(range(self.num_coupling)):
            j = (i + 1) % d
            cond = jnp.concatenate(
                [cols[k] for k in range(d) if k != j], axis=1
            )
            scale = _wnscale_apply(params["scale"][i])
            s = scale * bb.apply(params["s"][i], cond)
            cols[j] = (cols[j] - bb.apply(params["t"][i], cond)) * jnp.exp(-s)
        return jnp.concatenate(cols, axis=1)


def binary_counting_masks(channels: int, n_flows: int) -> np.ndarray:
    """Coupling masks enumerating all non-trivial binary channel subsets,
    repeated/cropped to ``n_flows``. Spec: `awesome/model/net_factory.py:88-103`.
    """
    vals = np.arange(1, 2**channels - 1, dtype=np.int64)
    bits = np.arange(channels)
    all_masks = ((vals[:, None] >> bits[None, :]) & 1).astype(np.float32)
    reps = int(np.ceil(n_flows / len(all_masks)))
    return np.tile(all_masks, (reps, 1))[:n_flows]


@dataclasses.dataclass(frozen=True)
class RealNVPFlow(Module):
    """Masked affine couplings (zero-initialized s/t MLPs) + ActNorm.

    Equivalent of the reference's normflows stack built by ``init_realnvp``
    (`awesome/model/net_factory.py:70-114`): per flow step a
    ``MaskedAffineFlow(mask, t, s)`` with MLP [C, hidden, C] (init_zeros)
    followed by ``ActNorm(C)``. ActNorm starts as identity; call
    :meth:`actnorm_data_init` for normflows-style data-dependent init.

    Coupling: ``z = b*z + (1-b) * (z * exp(s(b*z)) + t(b*z))``.
    ActNorm:  ``z = z * exp(s) + t``.
    """

    channels: int = 2
    hidden_units: int = 130
    n_flows: int = 6
    output_fn: Optional[str] = None  # None | 'tanh' | 'sigmoid' | 'clampexp'
    output_scale: Optional[float] = None

    def _mlp_init(self, key):
        k1, _ = jax.random.split(key)
        lin1 = Linear(self.channels, self.hidden_units).init(k1)
        # init_zeros=True: final layer weight AND bias zero
        lin2 = {
            "w": jnp.zeros((self.hidden_units, self.channels), jnp.float32),
            "b": jnp.zeros((self.channels,), jnp.float32),
        }
        return {"l1": lin1, "l2": lin2}

    def _mlp(self, p, x):
        h = jax.nn.leaky_relu(x @ p["l1"]["w"] + p["l1"]["b"], negative_slope=0.0)
        out = h @ p["l2"]["w"] + p["l2"]["b"]
        if self.output_fn == "tanh":
            out = jnp.tanh(out)
        elif self.output_fn == "sigmoid":
            out = jax.nn.sigmoid(out)
        elif self.output_fn == "clampexp":
            out = jnp.minimum(out, 0.0)
        if self.output_scale is not None:
            out = out * self.output_scale
        return out

    def _masks(self) -> np.ndarray:
        # Static, NOT in the param tree: a mask leaf would be updated by the
        # optimizer, silently breaking bijectivity (the coupling inverse
        # relies on b being exactly 0/1).
        return binary_counting_masks(self.channels, self.n_flows)

    def init(self, key):
        keys = jax.random.split(key, 2 * self.n_flows)
        steps = []
        for i in range(self.n_flows):
            steps.append(
                {
                    "s": self._mlp_init(keys[2 * i]),
                    "t": self._mlp_init(keys[2 * i + 1]),
                    "an_s": jnp.zeros((self.channels,), jnp.float32),
                    "an_t": jnp.zeros((self.channels,), jnp.float32),
                }
            )
        return {"steps": steps}

    def _st(self, step, zm):
        """s and t MLPs with their first layers merged into ONE matmul:
        the fit step is latency-bound on many serial tiny matmuls (see
        docs/design.md perf notes), so halving the op count in the flow
        matters more than the (identical) FLOPs."""
        w1 = jnp.concatenate([step["s"]["l1"]["w"], step["t"]["l1"]["w"]],
                             axis=1)
        b1 = jnp.concatenate([step["s"]["l1"]["b"], step["t"]["l1"]["b"]])
        h = jax.nn.leaky_relu(zm @ w1 + b1, negative_slope=0.0)
        hidden = step["s"]["l1"]["w"].shape[1]
        hs, ht = h[:, :hidden], h[:, hidden:]
        s = hs @ step["s"]["l2"]["w"] + step["s"]["l2"]["b"]
        t = ht @ step["t"]["l2"]["w"] + step["t"]["l2"]["b"]
        s = self._out_fn(s)
        t = self._out_fn(t)
        return s, t

    def _out_fn(self, out):
        if self.output_fn == "tanh":
            out = jnp.tanh(out)
        elif self.output_fn == "sigmoid":
            out = jax.nn.sigmoid(out)
        elif self.output_fn == "clampexp":
            out = jnp.minimum(out, 0.0)
        if self.output_scale is not None:
            out = out * self.output_scale
        return out

    def apply(self, params, x):
        masks = self._masks()
        z = x
        for step, mask in zip(params["steps"], masks):
            b = jnp.asarray(mask)
            zm = b * z
            s, t = self._st(step, zm)
            z = zm + (1.0 - b) * (z * jnp.exp(s) + t)
            z = z * jnp.exp(step["an_s"]) + step["an_t"]
        return z

    def inverse(self, params, y):
        masks = self._masks()
        z = y
        for step, mask in zip(reversed(params["steps"]), reversed(masks)):
            z = (z - step["an_t"]) * jnp.exp(-step["an_s"])
            b = jnp.asarray(mask)
            zm = b * z
            s = self._mlp(step["s"], zm)
            t = self._mlp(step["t"], zm)
            z = zm + (1.0 - b) * (z - t) * jnp.exp(-s)
        return z

    def actnorm_data_init(self, params, x):
        """Data-dependent ActNorm init (normflows semantics): set each
        ActNorm so its output over ``x`` has zero mean / unit std, layer by
        layer. Returns updated params."""
        masks = self._masks()
        z = x
        new_steps = []
        for step, mask in zip(params["steps"], masks):
            b = jnp.asarray(mask)
            zm = b * z
            s = self._mlp(step["s"], zm)
            t = self._mlp(step["t"], zm)
            z = zm + (1.0 - b) * (z * jnp.exp(s) + t)
            std = jnp.maximum(z.std(axis=0), 1e-12)
            an_s = -jnp.log(std)
            an_t = -(z.mean(axis=0)) * jnp.exp(an_s)
            z = z * jnp.exp(an_s) + an_t
            new_steps.append(dict(step, an_s=an_s, an_t=an_t))
        return {"steps": new_steps}
