"""Extra shape priors from the paper's teaser experiments: star-shape,
rotational symmetry, periodicity.

Specs: the ``myNet`` variants in the reference's notebook-only code —
`notebooks/icml_teaser_code/star_shaped/star.ipynb` (radial monotone
ICNN-in-r), `rotation_symmetric/rotation_symmetric.ipynb` (learnable
offset + orientation, |y| fold), `repeating/repeating.ipynb` (sin-feature
net). All operate on (N, 2) point matrices like the other priors and plug
into the same fit engine.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from awesome_tpu.nn.linear import Linear
from awesome_tpu.nn.module import Module


@dataclasses.dataclass(frozen=True)
class StarShapedNet(Module):
    """Star-shape prior: level set r(theta) via a network monotone in r.

    f(x) = r * (W2(h(u)) + W2_r(relu(W1(h(u)) + W1_r(r)))) - 1 with
    u = x/(0.01 + r) the direction. Thresholding f < 0 yields a star-shaped
    region around ``offset`` (offset is NOT trained, matching the notebook:
    ``self.offset.requires_grad = False``).
    """

    n_hidden: int = 130
    train_offset: bool = False

    def init(self, key):
        k = jax.random.split(key, 5)
        return {
            "offset": jnp.zeros((1, 2), jnp.float32),
            "W0": Linear(2, self.n_hidden).init(k[0]),
            "W1": Linear(self.n_hidden, self.n_hidden).init(k[1]),
            "W2": Linear(self.n_hidden, 1).init(k[2]),
            "W1_r": Linear(1, self.n_hidden).init(k[3]),
            "W2_r": Linear(self.n_hidden, 1).init(k[4]),
        }

    def apply(self, params, x):
        offset = params["offset"]
        if not self.train_offset:
            offset = jax.lax.stop_gradient(offset)
        x = x + offset
        r = jnp.sqrt(jnp.sum(x**2, axis=1, keepdims=True))
        u = x / (0.01 + r)
        h = jax.nn.relu(u @ params["W0"]["w"] + params["W0"]["b"])
        r_aug = jax.nn.relu(
            h @ params["W1"]["w"] + params["W1"]["b"]
            + r @ params["W1_r"]["w"] + params["W1_r"]["b"]
        )
        out = r * (
            h @ params["W2"]["w"] + params["W2"]["b"]
            + r_aug @ params["W2_r"]["w"] + params["W2_r"]["b"]
        ) - 1.0
        return out

    def enforce_convexity(self, params):
        """Radial monotonicity projection: clip W2_r >= 0 after the step,
        matching the notebook's ``net.W2_r.weight.data = F.relu(...)``
        (`notebooks/icml_teaser_code/star_shaped/star.ipynb` cell 3)."""
        p = dict(params)
        w2r = dict(p["W2_r"])
        w2r["w"] = jax.nn.relu(w2r["w"])
        p["W2_r"] = w2r
        return p


@dataclasses.dataclass(frozen=True)
class RotationSymmetricNet(Module):
    """Symmetry prior: learnable offset + orientation; folding |y| enforces
    mirror symmetry about the learned axis when ``symmetry_prior=True``."""

    n_hidden: int = 130
    symmetry_prior: bool = True

    def init(self, key):
        k = jax.random.split(key, 3)
        return {
            "offset": jnp.zeros((1, 2), jnp.float32),
            "orientation": -0.05 * jnp.ones((1,), jnp.float32),
            "W0": Linear(3, self.n_hidden).init(k[0]),
            "W1": Linear(self.n_hidden, self.n_hidden).init(k[1]),
            "W2": Linear(self.n_hidden, 1).init(k[2]),
        }

    def apply(self, params, x):
        x = x + params["offset"]
        r = jnp.sqrt(jnp.sum(x**2, axis=1, keepdims=True))
        u = x / (0.001 + r)
        c = jnp.cos(params["orientation"])
        s = jnp.sin(params["orientation"])
        u = jnp.concatenate(
            [
                (u[:, 0] * c - u[:, 1] * s)[:, None],
                (u[:, 0] * s + u[:, 1] * c)[:, None],
            ],
            axis=1,
        )
        if self.symmetry_prior:
            u = jnp.concatenate([u[:, 0:1], jnp.abs(u[:, 1:2])], axis=1)
        h = jnp.concatenate([u, r], axis=1)
        h = jax.nn.relu(h @ params["W0"]["w"] + params["W0"]["b"])
        h = jax.nn.relu(h @ params["W1"]["w"] + params["W1"]["b"])
        return h @ params["W2"]["w"] + params["W2"]["b"]


@dataclasses.dataclass(frozen=True)
class PeriodicNet(Module):
    """Periodicity prior: sin features of an affine coordinate map make the
    represented mask repeat. f(x) = W2(sin(10*pi*W1(W0(x + offset)))) with
    W0 a learnable 2x2 affine pre-map (initialized at identity) that lets
    the period lattice rotate/stretch during the fit.

    ``use_premap=False`` drops W0 entirely — the notebook's own forward
    (`repeating.ipynb` cell 3) DEFINES a W0 but never applies it, so the
    faithful replay is sin features straight off W1(x + offset)."""

    n_hidden: int = 130
    use_premap: bool = True

    def init(self, key):
        k = jax.random.split(key, 3)
        params = {
            "offset": jnp.zeros((1, 2), jnp.float32),
            "W1": Linear(2, self.n_hidden).init(k[1]),
            "W2": Linear(self.n_hidden, 1).init(k[2]),
        }
        if self.use_premap:
            params["W0"] = {
                "w": jnp.eye(2, dtype=jnp.float32),
                "b": jnp.zeros((2,), jnp.float32),
            }
        return params

    def apply(self, params, x):
        x = x + jax.lax.stop_gradient(params["offset"])
        if self.use_premap:
            x = x @ params["W0"]["w"] + params["W0"]["b"]
        h = 10.0 * jnp.pi * (x @ params["W1"]["w"] + params["W1"]["b"])
        return jnp.sin(h) @ params["W2"]["w"] + params["W2"]["b"]
