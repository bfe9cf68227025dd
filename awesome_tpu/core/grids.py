"""Coordinate-grid construction for implicit representations.

TPU-native equivalent of the reference grid builders
(`awesome/dataset/transformator.py:25` ``get_positional_matrices``,
`awesome/model/path_connected_net.py:253` ``create_coordinate_grid`` /
``create_normalized_grid`` and the how-to notebooks' ``create_grid``).

All functions are pure, jit-safe (static shapes only) and return
channel-first arrays to match the rest of the stack.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def positional_grid(
    w: int,
    h: int,
    t: Optional[float] = None,
    t_max: Optional[float] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Spatial (and optionally temporal) positional matrices.

    Returns ``(2, h, w)`` with channels (x, y) each in ``linspace(0, 1)``,
    or ``(3, h, w)`` with a constant t/t_max channel appended.

    Spec: `awesome/dataset/transformator.py:25-61`.
    """
    y = jnp.linspace(0.0, 1.0, h, dtype=dtype)
    x = jnp.linspace(0.0, 1.0, w, dtype=dtype)
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    if t is None:
        return jnp.stack((xx, yy), axis=0)
    if t_max is None:
        raise ValueError("t_max must be set if t is set")
    tt = jnp.full_like(xx, t / t_max)
    return jnp.stack((xx, yy, tt), axis=0)


def coordinate_grid(grid_shape: Sequence[int], dtype=jnp.float32) -> jnp.ndarray:
    """Unnormalized n-dimensional integer coordinate grid.

    For ``(h, w)`` returns ``(2, h, w)`` with channels (x, y) as pixel
    indices; for ``(t, h, w)`` returns ``(t, 3, h, w)`` (time moved to the
    leading/batch dim). Spec: `awesome/model/path_connected_net.py:253-274`.
    """
    aranges = [jnp.arange(s, dtype=dtype) for s in grid_shape]
    mesh = jnp.meshgrid(*aranges, indexing="ij")
    grid = jnp.stack(mesh[::-1])  # (x, y[, z]) channel order
    if grid.ndim == 4:
        grid = jnp.swapaxes(grid, 0, 1)  # time -> batch dim
    return grid


def normalized_grid(grid_shape: Sequence[int], dtype=jnp.float32) -> jnp.ndarray:
    """Coordinate grid min-max normalized to [0, 1] per channel.

    Returns ``(1, 2, h, w)`` for 2D shapes or ``(t, 3, h, w)`` for 3D.
    Spec: `awesome/model/path_connected_net.py:276-296` (MinMax over
    dims (0, 2, 3), i.e. per channel across batch and space).
    """
    grid = coordinate_grid(grid_shape, dtype=dtype)
    if grid.ndim == 3:
        grid = grid[None]
    mn = grid.min(axis=(0, 2, 3), keepdims=True)
    mx = grid.max(axis=(0, 2, 3), keepdims=True)
    return (grid - mn) / jnp.where(mx - mn == 0, 1.0, mx - mn)


def pixel_grid(image_shape: Tuple[int, int], dtype=jnp.float32) -> jnp.ndarray:
    """The how-to notebooks' query grid: ``(1, 2, h, w)``, channels (x, y),
    where x = arange(w)/w, y = arange(h)/h.

    Spec: `notebooks/how_to/convexity.ipynb` cell 7 ``create_grid``.
    """
    ny, nx = image_shape
    x = jnp.arange(nx, dtype=dtype)
    y = jnp.arange(ny, dtype=dtype)
    xx, yy = jnp.meshgrid(x, y, indexing="xy")
    grid = jnp.stack((xx / nx, yy / ny), axis=0)
    return grid[None]


def flatten_grid(grid: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) -> (B*H*W, C) pointwise-MLP layout.

    Functional replacement of the reference's ``pixelize`` decorator
    (`awesome/util/pixelize.py:7`): instead of reshaping inside every
    module, grids are flattened once at the fit-loop boundary so the whole
    model pipeline runs on a (N, C) point matrix — the layout the MXU wants.
    """
    b, c = grid.shape[0], grid.shape[1]
    return jnp.moveaxis(grid, 1, -1).reshape(b * int(np.prod(grid.shape[2:])), c)


def unflatten_grid(points: jnp.ndarray, grid_shape: Sequence[int]) -> jnp.ndarray:
    """(B*H*W, C) -> (B, C, H, W) inverse of :func:`flatten_grid`."""
    b = grid_shape[0]
    spatial = tuple(grid_shape[2:])
    c = points.shape[-1]
    out = points.reshape((b,) + spatial + (c,))
    return jnp.moveaxis(out, -1, 1)


def circle_mask(
    grid_shape: Tuple[int, int], radius: float, center: Tuple[float, float]
) -> jnp.ndarray:
    """Binary circle on a pixel grid; used for ICNN circle prefits.

    Spec: `awesome/model/path_connected_net.py:298-305` ``create_circle``
    (note: reference indexes its (x, y) grid as ``yy, xx = grid`` so the
    first channel (x) is compared against ``center[0]``; we reproduce that
    with explicit row/col semantics: center = (center_y, center_x) in pixel
    units, matching the center-of-mass convention of
    ``get_unary_circle_approximation``).
    """
    h, w = grid_shape
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    cy, cx = center
    return ((yy - cy) ** 2 + (xx - cx) ** 2) <= radius**2


def unary_circle_approximation(unaries: jnp.ndarray) -> jnp.ndarray:
    """Approximate foreground by a circle with matched area & center of mass.

    ``unaries`` is (H, W) (or squeezable to it) with foreground > 0.
    Spec: `awesome/model/path_connected_net.py:144-153`. Implemented
    jit-safe: center of mass via weighted mean instead of argwhere.
    """
    u = unaries.reshape(unaries.shape[-2:])
    fg = (u > 0.0).astype(jnp.float32)
    area = fg.sum()
    h, w = u.shape
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    denom = jnp.maximum(area, 1.0)
    cy = (fg * yy).sum() / denom
    cx = (fg * xx).sum() / denom
    radius = jnp.sqrt(area / jnp.pi)
    return ((yy - cy) ** 2 + (xx - cx) ** 2) <= radius**2
