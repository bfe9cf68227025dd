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
- matmuls via jnp.dot with preferred_element_type=float32 (MXU) and
  precision pinned to DEFAULT (an ambient 'highest' context would make
  Mosaic emulate f32 passes and overflow scoped VMEM — see
  pallas_flagship.mm),
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


def _mm(a, b):
    """All kernel matmuls route here (same policy as pallas_flagship.mm):
    f32 accumulate on the MXU, precision PINNED to DEFAULT — under an
    ambient ``jax.default_matmul_precision('highest')`` Mosaic would
    expand every dot into f32-emulation passes and overflow scoped VMEM."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)


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
        _mm(w_in_ref[...], x)
        + b_in_ref[...],
        0.0,
    )
    for i in range(n_layers):
        w_ln = layer_refs[3 * i][...]
        b_ln = layer_refs[3 * i + 1][...]
        w_sk = layer_refs[3 * i + 2][...]
        h = jnp.maximum(
            _mm(w_ln, h)
            + b_ln
            + _mm(w_sk, x),
            0.0,
        )
    w_out = layer_refs[3 * n_layers][...]
    b_out = layer_refs[3 * n_layers + 1][...]
    w_osk = layer_refs[3 * n_layers + 2][...]
    out_ref[...] = (
        _mm(w_out, h)
        + b_out
        + _mm(w_osk, x)
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


# --- fully fused fwd+bwd -------------------------------------------------
#
# At fit-relevant sizes the step is HBM-bandwidth-bound: every layer's
# (N, H) activation and its gradient spill to HBM under XLA (measured:
# 128x128-grid fits run at 45M point-steps/s vs 62M at 64x64 — bigger
# grids get SLOWER per point because intermediate traffic grows).
# This pair of kernels keeps the whole ICNN fwd AND bwd in VMEM per point
# tile: the bwd kernel recomputes forward activations in-register
# (rematerialization — FLOPs are free here, bandwidth is not) and emits
# dx tiles plus weight-gradient partials accumulated across grid steps
# (constant-index output blocks stay resident in VMEM between sequential
# grid iterations; @pl.when(i == 0) zero-initializes them).


def _icnn_bwd_kernel(n_layers: int, x_ref, g_ref, *refs):
    """Backward for one point tile, transposed layout (C, T).

    refs: weights (same layout as fwd, biases as (H, 1)), then outputs:
    dx_ref, then per-weight grads in the same order as the weight refs.
    """
    n_w = 2 + 3 * n_layers + 3
    w_refs = refs[:n_w]
    dx_ref = refs[n_w]
    dw_refs = refs[n_w + 1:]
    first = pl.program_id(0) == 0

    x = x_ref[...]  # (Cin, T)
    g = g_ref[...]  # (1, T)

    # ---- recompute forward, keeping activations (all VMEM) ----
    w_in, b_in = w_refs[0][...], w_refs[1][...]
    pre = []
    h = _mm(w_in, x) + b_in
    pre.append(h)
    h = jnp.maximum(h, 0.0)
    acts = [h]
    for i in range(n_layers):
        w_ln = w_refs[2 + 3 * i][...]
        b_ln = w_refs[3 + 3 * i][...]
        w_sk = w_refs[4 + 3 * i][...]
        z = (
            _mm(w_ln, h)
            + b_ln
            + _mm(w_sk, x)
        )
        pre.append(z)
        h = jnp.maximum(z, 0.0)
        acts.append(h)
    w_out = w_refs[2 + 3 * n_layers][...]
    w_osk = w_refs[4 + 3 * n_layers][...]

    # ---- backward ----
    def acc(ref, val):
        @pl.when(first)
        def _():
            ref[...] = jnp.zeros_like(ref)

        ref[...] += val

    # out layer: y = w_out @ h_last + b_out + w_osk @ x
    h_last = acts[-1]
    acc(dw_refs[2 + 3 * n_layers],
        _mm(g, h_last.T))  # dW_out
    acc(dw_refs[3 + 3 * n_layers],
        jnp.sum(g, axis=1, keepdims=True))  # db_out
    acc(dw_refs[4 + 3 * n_layers],
        _mm(g, x.T))  # dW_osk
    dh = _mm(w_out.T, g)
    dx = _mm(w_osk.T, g)

    for i in reversed(range(n_layers)):
        dz = dh * (pre[i + 1] > 0.0)
        w_ln = w_refs[2 + 3 * i][...]
        w_sk = w_refs[4 + 3 * i][...]
        h_prev = acts[i]
        acc(dw_refs[2 + 3 * i],
            _mm(dz, h_prev.T))
        acc(dw_refs[3 + 3 * i], jnp.sum(dz, axis=1, keepdims=True))
        acc(dw_refs[4 + 3 * i],
            _mm(dz, x.T))
        dh = _mm(w_ln.T, dz)
        dx = dx + _mm(w_sk.T, dz)

    dz0 = dh * (pre[0] > 0.0)
    acc(dw_refs[0], _mm(dz0, x.T))
    acc(dw_refs[1], jnp.sum(dz0, axis=1, keepdims=True))
    dx = dx + _mm(w_in.T, dz0)
    dx_ref[...] = dx


def _bwd_fused_impl(model, params, x, g):
    n = x.shape[0]
    n_layers = model.n_hidden_layers
    weights = tuple(
        w[:, None] if w.ndim == 1 else w.T for w in _flat_weights(params)
    )
    pad = (-n) % TILE_N
    x_t = jnp.pad(x, ((0, pad), (0, 0))).T
    g_t = jnp.pad(g, ((0, pad), (0, 0))).T  # padded rows have g = 0
    grid = (x_t.shape[1] // TILE_N,)

    in_specs = [
        pl.BlockSpec((x.shape[1], TILE_N), lambda i: (0, i)),
        pl.BlockSpec((1, TILE_N), lambda i: (0, i)),
    ] + [
        pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd)
        for w in weights
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((x.shape[1], x_t.shape[1]), jnp.float32)
    ] + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights]
    out_specs = [
        pl.BlockSpec((x.shape[1], TILE_N), lambda i: (0, i)),
    ] + [
        pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd)
        for w in weights
    ]
    outs = pl.pallas_call(
        functools.partial(_icnn_bwd_kernel, n_layers),
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
    )(x_t, g_t, *weights)
    dx = outs[0].T[:n]
    dws = outs[1:]

    # re-pack flat grads into the param tree (transpose back, biases 1-D)
    def unflat(dws):
        it = iter(dws)

        def take(like):
            d = next(it)
            return d[:, 0] if like.ndim == 1 else d.T

        flat = _flat_weights(params)
        vals = [take(w) for w in flat]
        i = iter(vals)
        out = {
            "input": {"w": next(i), "b": next(i)},
            "skip": [
                {"ln": {"w": next(i), "b": next(i)}, "skp": {"w": next(i)}}
                for _ in range(n_layers)
            ],
            "out": {},
        }
        out["out"] = {
            "ln": {"w": next(i), "b": next(i)},
            "skp": {"w": next(i)},
        }
        return out

    return unflat(dws), dx


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def icnn_fused_fb(model, params, x):
    """Fused forward with FUSED Pallas backward (dx + dW in one kernel,
    activations rematerialized in VMEM)."""
    return _fused_impl(model, params, x)


def _fb_fwd(model, params, x):
    return _fused_impl(model, params, x), (params, x)


def _fb_bwd(model, residuals, g):
    params, x = residuals
    if not _HAS_PLTPU or jax.default_backend() not in ("tpu", "axon"):
        _, vjp = jax.vjp(lambda p, xx: _reference_forward(model, p, xx),
                         params, x)
        return vjp(g)
    return _bwd_fused_impl(model, params, x, g)


icnn_fused_fb.defvjp(_fb_fwd, _fb_bwd)


@dataclasses.dataclass(frozen=True)
class FullyFusedConvexNextNet:
    """ConvexNextNet with fused Pallas forward AND backward."""

    base: object

    def init(self, key):
        return self.base.init(key)

    def apply(self, params, x):
        return icnn_fused_fb(self.base, params, x)

    def enforce_convexity(self, params):
        return self.base.enforce_convexity(params)

    @property
    def n_hidden_layers(self):
        return self.base.n_hidden_layers


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
