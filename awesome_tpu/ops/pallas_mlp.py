"""Pallas TPU kernel: fused ICNN (ConvexNextNet) forward over coordinate
points.

Why: the prior's hot op is a chain of small matmuls over a huge point
axis — (N, 2) @ (2, H) -> relu -> (N, H) @ (H, H) + skip -> ... For
full-resolution grids (N ~ 150k, H = 130) every intermediate is tens of
MB, far beyond VMEM, so XLA materializes each layer's output in HBM:
~6 x N*H*4 B of traffic per forward. This kernel tiles the point axis,
keeps ALL weights (~70 KB) and the running activation tile in VMEM, and
writes only the (N, 1) output — HBM traffic drops to reading x once and
writing the result.

The backward pass stays in XLA (custom_vjp recomputes the forward with
plain jnp under jax.vjp): the fit loop then uses the fused kernel for the
forward and XLA's fusion for the backward, which is where XLA already
does well (dW accumulations are big MXU matmuls).

Kernel layout notes (see /opt/skills/guides/pallas_guide.md):
- TRANSPOSED activations (C, TILE_N): channels on sublanes, points on
  lanes (row layout pads 2-wide inputs to 128 lanes -> 64x VMEM blowup),
- weights passed whole (no blocking) in VMEM,
- matmuls via jnp.dot with preferred_element_type=float32 (MXU),
- grid = ceil(N / TILE_N); padding handles the ragged tail.

Measured (TPU v5 lite, H=130, 2 hidden layers, N=154k): fused 1.22 ms vs
XLA 0.96 ms per forward — XLA's pipelining of full-N matmuls already sits
at the bandwidth/shape limit for this f32 small-K chain, so the fused
path is OPT-IN (``FusedConvexNextNet``), not the default; it wins only
for deeper/wider stacks where per-layer HBM traffic dominates.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pallas TPU backend may be unavailable on CPU test runs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

TILE_N = 2048


def _icnn_kernel(n_layers: int, x_ref, w_in_ref, b_in_ref,
                 *refs):
    """Fused ConvexNextNet forward for one point tile, TRANSPOSED layout.

    Activations are (C, TILE_N): channels on sublanes, points on lanes.
    A (N, 2) row layout would be padded by Mosaic to 128 lanes — a 64x
    VMEM blowup on the 2-wide input and 1-wide output buffers (observed
    as scoped-vmem OOM); channels-first pads 2 -> 8 sublanes only.

    refs layout: per hidden layer (w_ln, b_ln, w_skp), then out
    (w_ln, b_ln, w_skp), then out_ref last. Weights are (out, in); the
    layer computes w @ h (+ b broadcast along lanes).
    """
    out_ref = refs[-1]
    layer_refs = refs[:-1]
    x = x_ref[...]  # (2, T)
    h = jnp.maximum(
        jnp.dot(w_in_ref[...], x, preferred_element_type=jnp.float32)
        + b_in_ref[...],
        0.0,
    )
    for i in range(n_layers):
        w_ln = layer_refs[3 * i][...]
        b_ln = layer_refs[3 * i + 1][...]
        w_sk = layer_refs[3 * i + 2][...]
        h = jnp.maximum(
            jnp.dot(w_ln, h, preferred_element_type=jnp.float32)
            + b_ln
            + jnp.dot(w_sk, x, preferred_element_type=jnp.float32),
            0.0,
        )
    w_out = layer_refs[3 * n_layers][...]
    b_out = layer_refs[3 * n_layers + 1][...]
    w_osk = layer_refs[3 * n_layers + 2][...]
    out_ref[...] = (
        jnp.dot(w_out, h, preferred_element_type=jnp.float32)
        + b_out
        + jnp.dot(w_osk, x, preferred_element_type=jnp.float32)
    )


def _flat_weights(params) -> Tuple:
    ws = [params["input"]["w"], params["input"]["b"]]
    for blk in params["skip"]:
        ws += [blk["ln"]["w"], blk["ln"]["b"], blk["skp"]["w"]]
    ws += [
        params["out"]["ln"]["w"],
        params["out"]["ln"]["b"],
        params["out"]["skp"]["w"],
    ]
    return tuple(ws)


def _reference_forward(model, params, x):
    return model.apply(params, x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def icnn_forward_fused(model, params, x):
    """Fused forward; falls back to plain apply off-TPU."""
    return _fused_impl(model, params, x)


def _fused_impl(model, params, x):
    if not _HAS_PLTPU or jax.default_backend() not in ("tpu", "axon"):
        return _reference_forward(model, params, x)
    n = x.shape[0]
    n_layers = model.n_hidden_layers
    # transposed layout: weights (out, in), biases (H, 1) columns
    weights = tuple(
        w[:, None] if w.ndim == 1 else w.T for w in _flat_weights(params)
    )
    pad = (-n) % TILE_N
    x_t = jnp.pad(x, ((0, pad), (0, 0))).T  # (C, N_padded)
    grid = (x_t.shape[1] // TILE_N,)

    in_specs = [
        pl.BlockSpec((x.shape[1], TILE_N), lambda i: (0, i)),
    ] + [
        pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd)
        for w in weights
    ]

    out = pl.pallas_call(
        functools.partial(_icnn_kernel, n_layers),
        out_shape=jax.ShapeDtypeStruct((1, x_t.shape[1]), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TILE_N), lambda i: (0, i)),
    )(x_t, *weights)
    return out[0, :n][:, None]


def _fwd(model, params, x):
    return _fused_impl(model, params, x), (params, x)


def _bwd(model, residuals, g):
    params, x = residuals
    _, vjp = jax.vjp(lambda p, xx: _reference_forward(model, p, xx),
                     params, x)
    return vjp(g)


icnn_forward_fused.defvjp(_fwd, _bwd)


@dataclasses.dataclass(frozen=True)
class FusedConvexNextNet:
    """Drop-in ConvexNextNet wrapper routing apply through the fused
    kernel (same params/init/enforce_convexity as the base model)."""

    base: object  # ConvexNextNet

    def init(self, key):
        return self.base.init(key)

    def apply(self, params, x):
        return icnn_forward_fused(self.base, params, x)

    def enforce_convexity(self, params):
        return self.base.enforce_convexity(params)

    @property
    def n_hidden_layers(self):
        return self.base.n_hidden_layers
