"""TPU-native spectral matting: stencil Laplacian + LOBPCG eigenvectors.

The SSS feature proxy (`awesome_tpu/runner/sss_extractor.py`) needs the
smallest nontrivial eigenvectors of Levin's closed-form matting Laplacian
(`awesome/run/semantic_soft_segmentation_extractor.py:1-261` is the
reference front-end whose embedmaps feed the same spectral pipeline).
The host path builds a scipy CSR matrix and shift-inverts; that is the
one step of the 'feat' pipeline that cannot run on the chip.

This module is the device-native equivalent, designed for TPU rather
than translated: pixels only couple within a 5x5 neighborhood (two
pixels share a 3x3 window iff their offset is within +/-2), so instead
of a sparse matrix the operator is stored DENSELY as a per-pixel 5x5
stencil `(H, W, 5, 5)` and applied as 25 shifted fused multiply-adds —
fully regular memory access, no gather/scatter, vectorizes on the VPU
and batches over the eigenvector block. Eigenvectors come from JAX's
accelerator-friendly LOBPCG on the reversed spectrum `c*I - L`
(top-k of that = smallest-k of the PSD Laplacian).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def matting_stencil(image: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Levin matting Laplacian of an (H, W, 3) image as a 5x5 stencil.

    Returns `stencil` of shape (H, W, 5, 5) with
    ``L[i, i+d] == stencil[i, d + 2]`` for offsets d in [-2, 2]^2
    (zero outside the image). Same math as
    `awesome_tpu.runner.sss_extractor.matting_laplacian` (Levin et al.
    2008 eq. 12): for each 3x3 window w_k with mean mu_k, covariance
    Sigma_k,

        L[i, j] += delta_ij - (1 + (I_i-mu_k)^T (Sigma_k + eps/9 I)^-1
                                   (I_j-mu_k)) / 9
    """
    h, w, c = image.shape
    if h < 3 or w < 3:
        raise ValueError("matting_stencil needs at least a 3x3 image")
    m = 9
    # (H-2, W-2, 9, C): the 9 members of every 3x3 window, as slices
    win = jnp.stack(
        [image[dy:h - 2 + dy, dx:w - 2 + dx] for dy in range(3)
         for dx in range(3)], axis=2)
    mu = win.mean(axis=2, keepdims=True)
    x = win - mu                                           # (nh, nw, 9, C)
    cov = jnp.einsum("hwmc,hwmd->hwcd", x, x) / m
    # (cov + eps/9 I)^-1 via clamped eigendecomposition: in f32 the
    # covariance entries carry ~1e-9 rounding noise, which makes an LU
    # inverse of the 1e-8-regularized matrix NaN out on flat windows;
    # eigh + eigenvalue clamping is stable at the same regularization.
    ew, ev = jnp.linalg.eigh(cov)
    ew = jnp.maximum(ew, 0.0) + eps / m
    inv = jnp.einsum("hwce,hwe,hwde->hwcd", ev, 1.0 / ew, ev)
    quad = jnp.einsum("hwic,hwcd,hwjd->hwij", x, inv, x)
    vals = jnp.eye(m, dtype=image.dtype) - (1.0 + quad) / m  # (nh, nw, 9, 9)

    stencil = jnp.zeros((h, w, 5, 5), image.dtype)
    # window member a at (y+ay, x+ax) receives vals[..., a, b] at offset
    # (by-ay, bx-ax) from member b — 81 static slice-adds, no scatter.
    for a in range(m):
        ay, ax = divmod(a, 3)
        for b in range(m):
            by, bx = divmod(b, 3)
            dy, dx = by - ay + 2, bx - ax + 2
            stencil = stencil.at[
                ay:h - 2 + ay, ax:w - 2 + ax, dy, dx
            ].add(vals[..., a, b])
    return stencil


def stencil_matvec(stencil: jax.Array, x: jax.Array) -> jax.Array:
    """Apply the stencil operator: (H, W, 5, 5), (H, W, k) -> (H, W, k)."""
    h, w = stencil.shape[:2]
    xp = jnp.pad(x, ((2, 2), (2, 2), (0, 0)))
    out = jnp.zeros_like(x)
    for dy in range(5):
        for dx in range(5):
            out = out + stencil[:, :, dy, dx, None] * xp[
                dy:dy + h, dx:dx + w]
    return out


def _det_init(h: int, w: int, k: int, dtype,
              image: jax.Array | None = None) -> jax.Array:
    """Deterministic (n, k) start block.

    Constant + the image's own (mean-removed) color channels — piecewise
    constant per region, so they overlap every segment mode regardless
    of the image's symmetry (pure cosine starts can be near-orthogonal
    to a symmetric object's indicator and stall the f32 iteration) —
    padded out with low-frequency separable cosines.
    """
    yy, xx = jnp.meshgrid(
        jnp.linspace(0.0, 1.0, h, dtype=dtype),
        jnp.linspace(0.0, 1.0, w, dtype=dtype), indexing="ij")
    chans = []
    if image is not None:
        for ch in range(image.shape[-1]):
            g = image[..., ch].astype(dtype)
            chans.append(g - g.mean())
    cosines = []
    f = 1
    while len(cosines) < k:
        cosines += [jnp.cos(jnp.pi * f * yy), jnp.cos(jnp.pi * f * xx),
                    jnp.cos(jnp.pi * f * yy) * jnp.cos(jnp.pi * f * xx)]
        f += 1
    # interleave: color channels of a grayscale-ish image are nearly
    # collinear, so alternating with cosines keeps the block
    # numerically independent (lobpcg only orthonormalizes, it cannot
    # recover rank lost to near-duplicates)
    cols = [jnp.ones((h, w), dtype)]
    while len(cols) < k:
        if chans:
            cols.append(chans.pop(0))
        if len(cols) < k:
            cols.append(cosines.pop(0))
    return jnp.stack(cols, axis=-1).reshape(h * w, k)


@partial(jax.jit, static_argnames=("k", "iters", "oversample"))
def smallest_eigenvectors(
    stencil: jax.Array,
    k: int,
    iters: int = 300,
    oversample: int = 2,
    tol: float | None = None,
    image: jax.Array | None = None,
) -> jax.Array:
    """Smallest-(k) eigenvectors of the stencil Laplacian, (H, W, k).

    Includes the (near-)constant nullspace vector as component 0 — the
    caller drops it exactly like the host path drops eigsh's first
    column. Runs LOBPCG on ``c*I - L`` with c a Gershgorin upper bound
    on lambda_max, so the top of the reversed spectrum is the bottom of
    L's. Deterministic: fixed low-frequency start block.
    """
    h, w = stencil.shape[:2]
    n = h * w
    # LOBPCG requires search_dim * 5 < n (jax lobpcg_standard precondition)
    # — fail with the actual constraint instead of its opaque ValueError,
    # so callers (sss_extractor degrades to the host path) can react
    if (k + oversample) * 5 >= n:
        raise ValueError(
            f"image too small for the device eigensolve: need "
            f"h*w > {(k + oversample) * 5} for k={k} (+{oversample} "
            f"oversample), got {h}x{w}={n}; use the host spectral path"
        )
    dtype = stencil.dtype
    c = jnp.abs(stencil).sum(axis=(2, 3)).max()

    def a_op(xb):  # (n, b) -> (n, b)
        xi = xb.reshape(h, w, xb.shape[1])
        return (c * xb.reshape(h, w, -1)
                - stencil_matvec(stencil, xi)).reshape(n, xb.shape[1])

    kb = k + oversample
    x0 = _det_init(h, w, kb, dtype, image=image)
    from jax.experimental.sparse.linalg import lobpcg_standard

    _, u, _ = lobpcg_standard(a_op, x0, m=iters, tol=tol)
    return u[:, :k].T.reshape(k, h, w).transpose(1, 2, 0)


def spectral_soft_segments_device(
    image: np.ndarray,
    n_components: int = 2,
    max_side: int = 160,
    eps: float = 1e-4,
    iters: int = 300,
) -> np.ndarray:
    """Device-native variant of
    `awesome_tpu.runner.sss_extractor.spectral_soft_segments`: same
    downscale -> eigenvectors -> min-max -> upsample contract, with the
    Laplacian build and the eigensolve running on the accelerator.

    Not bit-faithful to the host path: the default regularizer is
    ``eps=1e-4`` (vs the host's 1e-7) because in f32 the reversed-
    spectrum LOBPCG can only resolve eigenvalues down to about
    ``eps_f32 * ||L||`` — at eps=1e-7 the nontrivial eigenvalues
    (~1e-6) sit below that floor and the solve stagnates, while at
    eps=1e-4 they lift to ~1e-3 and the computed subspace matches the
    f64 reference to cos(principal angle) > 0.999 (measured on the
    reference's cat.jpg). A larger eps smooths the mattes slightly but
    the segments stay edge-aligned and piecewise constant per region
    (quality gates: tests/test_sss.py)."""
    from scipy import ndimage

    h, w = image.shape[:2]
    scale = min(1.0, max_side / max(h, w))
    if scale < 1.0:
        small = np.clip(ndimage.zoom(image, (scale, scale, 1), order=1),
                        0.0, 1.0)
    else:
        small = image
    sh, sw = small.shape[:2]
    small_j = jnp.asarray(small, jnp.float32)
    stencil = matting_stencil(small_j, eps=eps)
    vecs = np.asarray(
        smallest_eigenvectors(stencil, n_components + 1, iters=iters,
                              image=small_j))
    feats = []
    for i in range(1, n_components + 1):
        f = vecs[..., i]
        lo, hi = float(f.min()), float(f.max())
        f = (f - lo) / max(hi - lo, 1e-12)
        if scale < 1.0:
            f = ndimage.zoom(f, (h / sh, w / sw), order=1)[:h, :w]
            if f.shape != (h, w):
                pad = ((0, h - f.shape[0]), (0, w - f.shape[1]))
                f = np.pad(f, pad, mode="edge")
        feats.append(np.clip(f, 0.0, 1.0))
    return np.stack(feats, axis=-1).astype(np.float32)
