"""Dense CRF post-processing — fully-connected mean-field inference.

Behavior port of the reference's pydensecrf wrapper
(`awesome/run/crf.py:45-146`), which is the ONE dependency-level native
algorithm of the reference (C++ permutohedral lattice). TPU-native
re-design:

- Gaussian pairwise kernel: exact separable Gaussian convolution (XLA
  convs ride the MXU) with per-axis stds ``gaussian_sdims``.
- Bilateral pairwise kernel: splat/blur/slice on a 5D bilateral grid
  (position/sdims x rgb/schan), the classic bilateral-grid approximation
  of the permutohedral filter — all scatter/gather + small separable
  blurs, jit-compatible, no host round trips. Color normalization (data
  min/max -> static bin widths) happens host-side so every blur radius is
  static for XLA.

Mean-field update (Kraehenbuehl & Koltun; densecrf inference semantics
with Potts/diagonal compatibility):

    Q <- softmax(-U + sum_m w_m (k_m (x) Q))

An exact C++ permutohedral implementation lives in ``native/`` with a
ctypes binding (``awesome_tpu.ops.permutohedral``) for host-side parity
checking.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CRFOptions:
    """Field-per-field mirror of `awesome/run/crf.py:11-42` (kernel /
    normalization enums dropped: DIAG_KERNEL + symmetric normalization are
    the implemented semantics)."""

    max_iterations: int = 15
    gaussian_sdims: Tuple[float, float] = (3.0, 3.0)
    gaussian_compat: float = 3.0
    bilateral_sdims: Tuple[float, float] = (50.0, 50.0)
    bilateral_schan: Tuple[float, float, float] = (10.0, 10.0, 10.0)
    bilateral_compat: float = 5.0
    color_bins: int = 16  # bilateral-grid color resolution per channel


def _gauss_kernel(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    return jnp.exp(-(x**2) / (2.0 * sigma**2))


def _sep_gauss_blur(q: jnp.ndarray, sigmas, truncate: float = 3.0):
    """Separable Gaussian blur along the first ``len(sigmas)`` axes of an
    N-D array (..., C). UNNORMALIZED kernel (k(0)=1), matching the pairwise
    kernel definition exp(-|df|^2 / 2); ``sigmas`` must be static."""
    out = q
    for axis, sigma in enumerate(sigmas):
        radius = max(int(truncate * float(sigma) + 0.5), 1)
        k = _gauss_kernel(float(sigma), radius)
        moved = jnp.moveaxis(out, axis, -1)
        shape = moved.shape
        flat = moved.reshape(-1, 1, shape[-1])
        kern = k.reshape(1, 1, -1)
        conv = jax.lax.conv_general_dilated(
            flat, kern, (1,), [(radius, radius)],
            dimension_numbers=("NCH", "IOH", "NCH"),
        )
        out = jnp.moveaxis(conv.reshape(shape), -1, axis)
    return out


def _gaussian_message(q: jnp.ndarray, sdims) -> jnp.ndarray:
    """Symmetric-normalized Gaussian filtering of (H, W, C)."""
    ones = jnp.ones(q.shape[:2] + (1,), q.dtype)
    norm = _sep_gauss_blur(ones, sdims)
    inv_sqrt = jax.lax.rsqrt(jnp.maximum(norm, 1e-20))
    filtered = _sep_gauss_blur(q * inv_sqrt, sdims)
    return filtered * inv_sqrt


def _bilateral_message(
    q: jnp.ndarray,
    flat_idx: jnp.ndarray,
    dims: Tuple[int, ...],
    blur_sigmas: Tuple[float, ...],
) -> jnp.ndarray:
    """Symmetric-normalized bilateral filtering via a precomputed 5D
    bilateral-grid assignment (nearest-bin splat/blur/slice)."""
    h, w, _ = q.shape
    total = int(np.prod(dims))

    def filt(values: jnp.ndarray) -> jnp.ndarray:
        vc = values.shape[-1]
        grid = jnp.zeros((total, vc), values.dtype)
        grid = grid.at[flat_idx].add(values.reshape(-1, vc))
        grid = _sep_gauss_blur(grid.reshape(dims + (vc,)), blur_sigmas)
        return grid.reshape(total, vc)[flat_idx].reshape(h, w, vc)

    ones = jnp.ones((h, w, 1), q.dtype)
    norm = filt(ones)
    inv_sqrt = jax.lax.rsqrt(jnp.maximum(norm, 1e-20))
    return filt(q * inv_sqrt) * inv_sqrt


# Kept as the INDEPENDENT per-image oracle (static compile-time color
# sigmas): dense_crf routes through the traced-sigma batched program for
# bucket reuse, and tests/test_crf.py checks that path against this one.
@partial(jax.jit, static_argnums=(2, 3, 4))
def _mean_field(
    probs: jnp.ndarray,
    flat_idx: jnp.ndarray,
    dims: Tuple[int, ...],
    blur_sigmas: Tuple[float, ...],
    options: CRFOptions,
):
    u = -jnp.log(jnp.clip(probs, 1e-8, 1.0))

    def body(_, q):
        msg = options.gaussian_compat * _gaussian_message(
            q, options.gaussian_sdims
        )
        msg = msg + options.bilateral_compat * _bilateral_message(
            q, flat_idx, dims, blur_sigmas
        )
        return jax.nn.softmax(-u + msg, axis=-1)

    q0 = jax.nn.softmax(-u, axis=-1)
    return jax.lax.fori_loop(0, options.max_iterations, body, q0)


def _bilateral_grid_assignment(img255: np.ndarray, options: CRFOptions):
    """Host-side: per-pixel nearest grid bin + static blur sigmas."""
    h, w, _ = img255.shape
    sy, sx = options.bilateral_sdims
    nb = options.color_bins
    ny = int(np.floor((h - 1) / sy)) + 2
    nx = int(np.floor((w - 1) / sx)) + 2
    col = img255 / np.asarray(options.bilateral_schan, np.float32)
    col_min = col.min(axis=(0, 1), keepdims=True)
    col_span = col.max(axis=(0, 1), keepdims=True) - col_min + 1e-6
    col_unit = (col - col_min) / col_span
    iy = np.clip(np.round(np.arange(h) / sy).astype(np.int32), 0, ny - 1)
    ix = np.clip(np.round(np.arange(w) / sx).astype(np.int32), 0, nx - 1)
    idx = [
        np.broadcast_to(iy[:, None], (h, w)),
        np.broadcast_to(ix[None, :], (h, w)),
    ]
    for k in range(3):
        idx.append(
            np.clip(
                np.round(col_unit[..., k] * (nb - 1)).astype(np.int32),
                0,
                nb - 1,
            )
        )
    dims = (ny, nx, nb, nb, nb)
    flat = (((idx[0] * nx + idx[1]) * nb + idx[2]) * nb + idx[3]) * nb + idx[4]
    # blur sigma = 1 feature unit; color axis bin width (feature units) is
    # span/(nb-1) -> sigma in bins = (nb-1)/span
    span = np.asarray(col_span).reshape(3)
    blur_sigmas = (1.0, 1.0) + tuple(float((nb - 1) / s) for s in span)
    return flat.reshape(-1), dims, blur_sigmas


# --- batched variant --------------------------------------------------------


def _sep_gauss_blur_traced(q: jnp.ndarray, sigmas, radii):
    """Like ``_sep_gauss_blur`` but ``sigmas`` may be TRACED scalars;
    ``radii`` are static ints. With radius >= axis length the truncation
    is gone entirely, so a traced per-image sigma computes the same blur
    the static path would (the color axes only have ``color_bins`` bins,
    so a full-axis radius costs one small fixed conv)."""
    out = q
    for axis, (sigma, radius) in enumerate(zip(sigmas, radii)):
        x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
        k = jnp.exp(-(x**2) / (2.0 * jnp.asarray(sigma, jnp.float32) ** 2))
        moved = jnp.moveaxis(out, axis, -1)
        shape = moved.shape
        flat = moved.reshape(-1, 1, shape[-1])
        kern = k.reshape(1, 1, -1)
        conv = jax.lax.conv_general_dilated(
            flat, kern, (1,), [(radius, radius)],
            dimension_numbers=("NCH", "IOH", "NCH"),
        )
        out = jnp.moveaxis(conv.reshape(shape), -1, axis)
    return out


def _bilateral_message_traced(q, flat_idx, dims, blur_sigmas, radii):
    h, w, _ = q.shape
    total = int(np.prod(dims))

    def filt(values):
        vc = values.shape[-1]
        grid = jnp.zeros((total, vc), values.dtype)
        grid = grid.at[flat_idx].add(values.reshape(-1, vc))
        grid = _sep_gauss_blur_traced(
            grid.reshape(dims + (vc,)), blur_sigmas, radii
        )
        return grid.reshape(total, vc)[flat_idx].reshape(h, w, vc)

    ones = jnp.ones((h, w, 1), q.dtype)
    norm = filt(ones)
    inv_sqrt = jax.lax.rsqrt(jnp.maximum(norm, 1e-20))
    return filt(q * inv_sqrt) * inv_sqrt


@partial(jax.jit, static_argnums=(3, 4))
def _mean_field_batched(probs, flat_idx, color_sigmas, dims, options):
    """vmapped mean field: probs (B, H, W, C), flat_idx (B, H*W),
    color_sigmas (B, 3) traced per-image blur widths."""
    nb = dims[2]
    radii = (3, 3) + (nb,) * 3  # spatial sigma is 1.0 -> radius 3; color
    # radius = full axis (exact for any sigma)

    def one(p, idx, cs):
        u = -jnp.log(jnp.clip(p, 1e-8, 1.0))
        sigmas = (jnp.asarray(1.0), jnp.asarray(1.0), cs[0], cs[1], cs[2])

        def body(_, q):
            msg = options.gaussian_compat * _gaussian_message(
                q, options.gaussian_sdims
            )
            msg = msg + options.bilateral_compat * _bilateral_message_traced(
                q, idx, dims, sigmas, radii
            )
            return jax.nn.softmax(-u + msg, axis=-1)

        q0 = jax.nn.softmax(-u, axis=-1)
        return jax.lax.fori_loop(0, options.max_iterations, body, q0)

    return jax.vmap(one)(probs, flat_idx, color_sigmas)


def dense_crf_batched(
    imgs,
    unaries,
    is_softmax_unaries: bool = True,
    options: CRFOptions = None,
) -> np.ndarray:
    """Batched ``dense_crf``: ONE device call refines every image —
    the per-eval-tick batching of `awesome/run/handles.py:376-459` (the
    reference loops pydensecrf per image on the host).

    imgs: (B, H, W, 3); unaries: (B, H, W[, C]). Same semantics as the
    per-image path: each image keeps its own color normalization (the
    per-image blur width rides a traced sigma with a full-axis static
    radius, so batching does not change results).
    """
    if not is_softmax_unaries:
        # the reference's own False path is broken (U is unbound when
        # is_softmax_unaries is False, `awesome/run/crf.py:112-115`), so
        # there are no semantics to match — reject instead of silently
        # treating logits as probabilities
        raise NotImplementedError(
            "is_softmax_unaries=False has no reference semantics "
            "(awesome/run/crf.py leaves U unbound); pass probabilities"
        )
    imgs = np.asarray(imgs)
    unaries = np.asarray(unaries)
    if unaries.ndim == 3:
        unaries = unaries[..., None]
    single_channel = unaries.shape[-1] == 1
    if single_channel:
        unaries = np.concatenate([unaries, 1.0 - unaries], axis=-1)
    if imgs.shape[0] == 0:
        # empty batch: the per-image prep loop below would leave its
        # accumulators empty and np.stack would raise an unrelated error
        return np.zeros(unaries.shape, np.float32)
    if options is None:
        options = CRFOptions()
    flat_list, sig_list = [], []
    dims = None
    for i in range(imgs.shape[0]):
        img = imgs[i]
        if img.dtype != np.uint8:
            img255 = (np.clip(img, 0, 1) * 255.0).astype(np.float32)
        else:
            img255 = img.astype(np.float32)
        flat, d, blur = _bilateral_grid_assignment(img255, options)
        dims = d
        flat_list.append(flat)
        sig_list.append(blur[2:])
    q = _mean_field_batched(
        jnp.asarray(unaries, jnp.float32),
        jnp.asarray(np.stack(flat_list)),
        jnp.asarray(np.stack(sig_list), jnp.float32),
        dims,
        options,
    )
    q = np.asarray(q)
    if single_channel:
        q = q[..., 0:1]
    return q


def dense_crf(
    img,
    unaries,
    is_softmax_unaries: bool = True,
    options: CRFOptions = None,
) -> np.ndarray:
    """Drop-in equivalent of `awesome/run/crf.py:45` ``dense_crf``.

    img: (H, W, 3) float [0,1] or uint8, or (H, W); channel-first layouts
    are transposed like the reference. unaries: (H, W, C) probabilities or
    (H, W)/(H, W, 1) (expanded to [p, 1-p] like the reference `:99-106`).
    Returns (H, W, C) refined probabilities.
    """
    if not is_softmax_unaries:
        raise NotImplementedError(
            "is_softmax_unaries=False has no reference semantics "
            "(awesome/run/crf.py leaves U unbound); pass probabilities"
        )
    img = np.asarray(img)
    unaries = np.asarray(unaries)
    if img.ndim == 3 and img.shape[0] in (1, 3) and img.shape[-1] > 4:
        img = img.transpose(1, 2, 0)
    if unaries.ndim == 3 and unaries.shape[0] <= 4 < unaries.shape[-1]:
        unaries = unaries.transpose(1, 2, 0)
    if unaries.ndim == 2:
        unaries = unaries[:, :, None]
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=-1)

    single_channel = unaries.shape[-1] == 1
    if single_channel:
        unaries = np.concatenate([unaries, 1.0 - unaries], axis=-1)

    if options is None:
        options = CRFOptions()

    if img.dtype != np.uint8:
        img255 = (np.clip(img, 0, 1) * 255.0).astype(np.float32)
    else:
        img255 = img.astype(np.float32)

    flat_idx, dims, blur_sigmas = _bilateral_grid_assignment(img255, options)
    # Route through the traced-sigma program (full-axis color radius =
    # exact for any sigma): the per-image color normalization then rides
    # a traced input instead of a static compile-time constant, so a loop
    # over same-sized images reuses ONE compiled program per size bucket
    # (was: one recompile PER IMAGE — 32.6 s for 8 images in round 3).
    q = _mean_field_batched(
        jnp.asarray(unaries, jnp.float32)[None],
        jnp.asarray(flat_idx)[None],
        jnp.asarray(blur_sigmas[2:], jnp.float32)[None],
        dims,
        options,
    )[0]
    q = np.asarray(q)
    if single_channel:
        q = q[..., 0:1]
    return q
