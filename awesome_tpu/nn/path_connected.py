"""Path-connectedness prior: translation -> normalization -> flow -> ICNN.

The composite prior net of the reference
(`awesome/model/path_connected_net.py:53-130` ``PathConnectedNet`` and the
factory `awesome/model/net_factory.py:124-176` ``real_nvp_path_connected_net``).

Pipeline on a point matrix (N, C):

    x -> PerChannelAffine (global translation, init identity)
      -> MinMax norm fitted on the normalized grid (NormNet equivalent)
      -> flow (RealNVP / NormalizingFlow1D / DiffeomorphismNet)
      -> ICNN (ConvexNextNet)

The reference's ``PixelizeNet``/``NormNet`` adapter wrappers
(`awesome/model/pixelize_net.py:7`, `awesome/model/norm_net.py:6`) dissolve
here: everything already runs pointwise on (N, C), and the norm is a frozen
statistics dataclass folded into apply.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from awesome_tpu.core.transforms import MeanStd, MinMax
from awesome_tpu.core import grids as G
from awesome_tpu.nn.flows import NormalizingFlow1D, RealNVPFlow
from awesome_tpu.nn.icnn import ConvexNextNet
from awesome_tpu.nn.linear import Linear, PerChannelAffine
from awesome_tpu.nn.module import Module, matmul_precision


@dataclasses.dataclass(frozen=True)
class PathConnectedNet(Module):
    """Composite path-connected prior.

    ``convex_net`` and ``flow_net`` are sub-modules; ``norm`` is an optional
    frozen input-normalization transform applied before the flow (the
    reference fits a MinMax on a normalized coordinate grid,
    `awesome/model/net_factory.py:160-166`).
    """

    convex_net: Module
    flow_net: Module
    in_channels: int = 2
    norm: Optional[object] = None  # MinMax | MeanStd | None (static stats)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "linear": PerChannelAffine(self.in_channels).init(k1),
            "flow": self.flow_net.init(k2),
            "convex": self.convex_net.init(k3),
        }

    def deformation(self, params, x, precision: Optional[str] = "high"):
        """Translation + flow part (the learned diffeomorphism).

        The norm wraps the flow NormNet-style: normalize input, run flow,
        *de-normalize* output (`awesome/model/norm_net.py:17-27`).
        Spec: `awesome/model/path_connected_net.py:127-131` ``get_deformation``.

        ``precision``: matmul precision for the flow math — defaults to
        'high' so direct eval (invertibility checks, path extraction,
        re-targeting) is roundtrip-consistent on TPU; the fit-hot
        :meth:`apply` path passes ``None`` (ambient/default precision —
        measured quality parity, 27% faster; see
        ``nn.module.matmul_precision``).
        """
        with matmul_precision(precision):
            affine = PerChannelAffine(self.in_channels)
            x = affine.apply(params["linear"], x)
            if self.norm is not None:
                x = self.norm.transform(x)
            x = self.flow_net.apply(params["flow"], x)
            if self.norm is not None:
                x = self.norm.inverse_transform(x)
            return x

    def apply(self, params, x):
        xd = self.deformation(params, x, precision=None)
        return self.convex_net.apply(params["convex"], xd)

    def inverse(self, params, y, precision: Optional[str] = "high"):
        """Analytic inverse of the deformation.

        Spec: `awesome/model/path_connected_net.py:107-125` with the
        NormNet inverse convention (`awesome/model/norm_net.py:31-41`:
        normalize, invert flow, de-normalize). Runs at 'high' matmul
        precision by default — see :meth:`deformation`.
        """
        with matmul_precision(precision):
            if self.norm is not None:
                y = self.norm.transform(y)
            x = self.flow_net.inverse(params["flow"], y)
            if self.norm is not None:
                x = self.norm.inverse_transform(x)
            affine = PerChannelAffine(self.in_channels)
            return affine.inverse(params["linear"], x)

    def enforce_convexity(self, params):
        """Project only the ICNN part — the flow stays unconstrained.

        Spec: `awesome/model/path_connected_net.py:141-142`.
        """
        return dict(
            params, convex=self.convex_net.enforce_convexity(params["convex"])
        )

    # --- optimizer param-group split -------------------------------------
    # The reference puts flow params in their own weight-decay group
    # (`awesome/model/path_connected_net.py:913-918`). We expose a labeling
    # pytree for the group-aware optimizer.
    def param_groups(self, params):
        return {
            "linear": jax.tree_util.tree_map(lambda _: "linear", params["linear"]),
            "flow": jax.tree_util.tree_map(lambda _: "flow", params["flow"]),
            "convex": jax.tree_util.tree_map(lambda _: "convex", params["convex"]),
        }


def real_nvp_path_connected_net(
    channels: int = 2,
    hidden_units: int = 130,
    flow_n_flows: int = 6,
    flow_output_fn: Optional[str] = None,
    flow_output_scale: Optional[float] = None,
    norm: str = "minmax",
    spatial_shape: Tuple[int, int] = (1000, 1000),
    convex_net_hidden_units: int = 130,
    convex_net_hidden_layers: int = 2,
    **kwargs,
) -> PathConnectedNet:
    """The flagship prior factory.

    Spec: `awesome/model/net_factory.py:124-176`. The MinMax/MeanStd norm is
    fitted on the normalized coordinate grid of ``spatial_shape`` — a grid
    already in [0,1], so for 'minmax' the stats are (0, 1) per channel; we
    still fit numerically for exact parity.
    """
    flow = RealNVPFlow(
        channels=channels,
        hidden_units=hidden_units,
        n_flows=flow_n_flows,
        output_fn=flow_output_fn,
        output_scale=flow_output_scale,
    )
    shape = spatial_shape if channels == 2 else (100, *spatial_shape)
    norm_grid = G.normalized_grid(shape)
    pts = G.flatten_grid(norm_grid)  # (N, C)
    if norm == "minmax":
        norm_t = MinMax.fit(pts, dim=0)
        norm_t = MinMax(norm_t.min[0], norm_t.max[0])  # per-channel stats
    elif norm == "meanstd":
        norm_t = MeanStd.fit(pts, dim=0)
        norm_t = MeanStd(norm_t.mean[0], norm_t.std[0])
    else:
        raise ValueError("Invalid norm")
    icnn = ConvexNextNet(
        n_hidden=convex_net_hidden_units,
        n_hidden_layers=convex_net_hidden_layers,
        in_features=channels,
    )
    return PathConnectedNet(
        convex_net=icnn, flow_net=flow, in_channels=channels, norm=norm_t
    )
