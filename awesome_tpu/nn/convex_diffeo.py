"""ConvexDiffeomorphismNet — the older composite prior:
Linear -> NormalizingFlow1D -> ConvexNextNet, with affine re-targeting.

Behavior port of `awesome/model/convex_diffeomorphism_net.py:41-190`:

- composite forward through a full linear layer (not just per-channel
  scaling), an alternating coupling flow, and an ICNN,
- :func:`translate` — least-squares refit of the first linear layer so a
  set of target points maps to where given source points used to map,
  shifting the learned prior to a new center of mass without re-fitting
  (the warm-start re-targeting used by reuse_state, `:43-128`),
- weight-norm decay groups in its own pretrain loop (`:130-190`) — served
  by the shared fit engine here via ``param_groups``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from awesome_tpu.nn.flows import NormalizingFlow1D
from awesome_tpu.nn.icnn import ConvexNextNet
from awesome_tpu.nn.linear import Linear
from awesome_tpu.nn.module import Module, matmul_precision


@dataclasses.dataclass(frozen=True)
class ConvexDiffeomorphismNet(Module):
    in_features: int = 2
    flow: Module = dataclasses.field(
        default_factory=lambda: NormalizingFlow1D(num_coupling=4, width=130)
    )
    convex: Module = dataclasses.field(
        default_factory=lambda: ConvexNextNet(n_hidden=130, n_hidden_layers=1)
    )

    @classmethod
    def create(cls, in_features: int = 2, n_hidden: int = 130,
               n_hidden_layers: int = 1, nf_layers: int = 4,
               nf_hidden: int = 70) -> "ConvexDiffeomorphismNet":
        """Reference-constructor equivalent
        (`convex_diffeomorphism_net.py:41-60`): builds flow + convex nets
        with matching feature counts (nf width default 70 there). The
        coupling count is rounded up to a multiple of in_features so
        every channel is transformed equally often."""
        rem = nf_layers % in_features
        if rem:
            nf_layers += in_features - rem
        return cls(
            in_features=in_features,
            flow=NormalizingFlow1D(
                num_coupling=nf_layers, width=nf_hidden,
                in_features=in_features,
            ),
            convex=ConvexNextNet(
                n_hidden=n_hidden, n_hidden_layers=n_hidden_layers,
                in_features=in_features,
            ),
        )

    def init(self, key):
        if getattr(self.flow, "in_features", self.in_features) != (
            self.in_features
        ):
            raise ValueError(
                "flow.in_features must match in_features — use "
                "ConvexDiffeomorphismNet.create(in_features=...)"
            )
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "linear": Linear(self.in_features, self.in_features).init(k1),
            "flow": self.flow.init(k2),
            "convex": self.convex.init(k3),
        }

    def deformation(self, params, x, precision: Optional[str] = "high"):
        # 'high' matmul precision by default for roundtrip-consistent eval
        # on TPU; the fit-hot apply path inherits ambient precision (see
        # nn.module.matmul_precision).
        with matmul_precision(precision):
            h = x @ params["linear"]["w"] + params["linear"]["b"]
            return self.flow.apply(params["flow"], h)

    def apply(self, params, x):
        return self.convex.apply(
            params["convex"], self.deformation(params, x, precision=None)
        )

    def inverse(self, params, y, precision: Optional[str] = "high"):
        with matmul_precision(precision):
            h = self.flow.inverse(params["flow"], y)
            # invert the full linear layer
            w = params["linear"]["w"]  # (in, in), forward is x @ w + b
            b = params["linear"]["b"]
            w_inv = jnp.linalg.inv(w)
            return (h - b) @ w_inv

    def enforce_convexity(self, params):
        return dict(params, convex=self.convex.enforce_convexity(params["convex"]))

    def param_groups(self, params):
        return {
            "linear": jax.tree_util.tree_map(lambda _: "linear", params["linear"]),
            "flow": jax.tree_util.tree_map(lambda _: "flow", params["flow"]),
            "convex": jax.tree_util.tree_map(lambda _: "convex", params["convex"]),
        }

    # --- affine re-targeting --------------------------------------------
    def translate(self, params, from_points, to_points):
        """Refit the first linear layer (least squares) so ``to_points``
        produce the outputs ``from_points`` used to produce.

        Spec: `convex_diffeomorphism_net.py:82-128`. Requires at least
        ``in_features + 1`` linearly independent points.
        """
        if from_points.shape != to_points.shape:
            raise ValueError("From and to points must have the same shape.")
        w, b = params["linear"]["w"], params["linear"]["b"]
        from_transf = from_points @ w + b  # old outputs at source points
        ones = jnp.ones((to_points.shape[0], 1), to_points.dtype)
        X = jnp.concatenate([to_points, ones], axis=1)
        theta = jnp.linalg.lstsq(X, from_transf)[0]
        new_w = theta[:-1, :]
        new_b = theta[-1, :]
        return dict(params, linear={"w": new_w, "b": new_b})

    def translate_only_point(self, params, from_point, to_point):
        """Pure shift variant (`:43-80`): build in_features+1 affinely
        independent point pairs offset by a constant and call translate."""
        d = self.in_features
        offsets = jnp.concatenate(
            [jnp.zeros((1, d)), 3.0 * jnp.eye(d)], axis=0
        )
        return self.translate(
            params, from_point[None] + offsets, to_point[None] + offsets
        )
