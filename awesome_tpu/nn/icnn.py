"""Input-convex neural networks (ICNNs) — the convexity prior.

An ICNN's sub-level sets are convex, so thresholding its output yields a
provably convex mask. Convexity requires the hidden-to-hidden weights to be
non-negative; as in the reference this is kept by a *projection after every
optimizer step* rather than a reparameterization
(`awesome/model/convex_net.py:37-40,216-220` ``enforce_convexity``).

Here the projection is a pure function over the param tree
(:func:`enforce_convexity`), applied inside the compiled fit ``lax.scan``
(ordering matches the reference: clip AFTER the optimizer step,
`awesome/model/path_connected_net.py:950-952`).

Models operate on point matrices (N, C) — the whole H·W grid is one big
matmul batch for the MXU; use ``core.grids.flatten_grid`` at the boundary.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from awesome_tpu.nn.linear import Linear
from awesome_tpu.nn.module import Module


@dataclasses.dataclass(frozen=True)
class ConvexNet(Module):
    """2-layer Amos-style ICNN with input skips.

    Spec: `awesome/model/convex_net.py:10-40`.
    """

    n_hidden: int = 130
    in_channels: int = 2

    def init(self, key):
        k = jax.random.split(key, 5)
        return {
            "W0y": Linear(self.in_channels, self.n_hidden).init(k[0]),
            "W1z": Linear(self.n_hidden, self.n_hidden).init(k[1]),
            "W2z": Linear(self.n_hidden, 1).init(k[2]),
            "W1y": Linear(self.in_channels, self.n_hidden, bias=False).init(k[3]),
            "W2y": Linear(self.in_channels, 1, bias=False).init(k[4]),
        }

    def apply(self, params, x):
        x0 = x
        h = jax.nn.relu(x @ params["W0y"]["w"] + params["W0y"]["b"])
        h = jax.nn.relu(
            h @ params["W1z"]["w"] + params["W1z"]["b"] + x0 @ params["W1y"]["w"]
        )
        return h @ params["W2z"]["w"] + params["W2z"]["b"] + x0 @ params["W2y"]["w"]

    def enforce_convexity(self, params):
        """Clip hidden-to-hidden weights to >= 0 (W1z, W2z only)."""
        params = dict(params)
        for name in ("W1z", "W2z"):
            layer = dict(params[name])
            layer["w"] = jax.nn.relu(layer["w"])
            params[name] = layer
        return params


@dataclasses.dataclass(frozen=True)
class ConvexNextNet(Module):
    """Deeper ICNN: input layer + N skip blocks + out block.

    Block: ``h = relu(ln(h) + skp(x_input))``; out: ``ln(h) + skp(x_input)``.
    Only the ``ln`` (hidden-to-hidden) weights are clipped — the input skips
    may be signed. Spec: `awesome/model/convex_net.py:177-220` with blocks
    at :134-175.
    """

    n_hidden: int = 130
    in_features: int = 2
    out_features: int = 1
    n_hidden_layers: int = 1

    def _blocks(self):
        blocks = []
        for _ in range(self.n_hidden_layers):
            blocks.append(
                (
                    Linear(self.n_hidden, self.n_hidden),
                    Linear(self.in_features, self.n_hidden, bias=False),
                )
            )
        return blocks

    def init(self, key):
        keys = jax.random.split(key, 2 * self.n_hidden_layers + 3)
        params = {"input": Linear(self.in_features, self.n_hidden).init(keys[0])}
        skip = []
        for i, (ln, skp) in enumerate(self._blocks()):
            skip.append(
                {
                    "ln": ln.init(keys[1 + 2 * i]),
                    "skp": skp.init(keys[2 + 2 * i]),
                }
            )
        params["skip"] = skip
        params["out"] = {
            "ln": Linear(self.n_hidden, self.out_features).init(keys[-2]),
            "skp": Linear(self.in_features, self.out_features, bias=False).init(
                keys[-1]
            ),
        }
        return params

    def apply(self, params, x):
        # each block's ln + skp matmuls merged into one ([h, x0] @ [[W_ln],
        # [W_skp]]): same FLOPs, half the (latency-dominating) op count
        x0 = x
        h = jax.nn.relu(x @ params["input"]["w"] + params["input"]["b"])
        for blk in params["skip"]:
            w = jnp.concatenate([blk["ln"]["w"], blk["skp"]["w"]], axis=0)
            h = jax.nn.relu(
                jnp.concatenate([h, x0], axis=-1) @ w + blk["ln"]["b"]
            )
        out = params["out"]
        w = jnp.concatenate([out["ln"]["w"], out["skp"]["w"]], axis=0)
        return jnp.concatenate([h, x0], axis=-1) @ w + out["ln"]["b"]

    def enforce_convexity(self, params):
        params = dict(params)
        new_skip = []
        for blk in params["skip"]:
            ln = dict(blk["ln"])
            ln["w"] = jax.nn.relu(ln["w"])
            new_skip.append({"ln": ln, "skp": blk["skp"]})
        params["skip"] = new_skip
        out = dict(params["out"])
        out_ln = dict(out["ln"])
        out_ln["w"] = jax.nn.relu(out_ln["w"])
        out["ln"] = out_ln
        params["out"] = out
        return params
