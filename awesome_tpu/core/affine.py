"""2D/3D affine transformation matrix algebra.

Behavior port of `awesome/run/transforms2d.py:216-382` and
`awesome/run/transforms3d.py:216-433` (homogeneous transformation
matrices for plotting/analysis of learned deformations). Pure jnp, usable
inside jit.
"""
from __future__ import annotations

import jax.numpy as jnp


def rotation_matrix_2d(theta) -> jnp.ndarray:
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.asarray([[c, -s], [s, c]])


def scale_matrix_2d(sx, sy=None) -> jnp.ndarray:
    sy = sx if sy is None else sy
    return jnp.asarray([[sx, 0.0], [0.0, sy]])


def shear_matrix_2d(kx=0.0, ky=0.0) -> jnp.ndarray:
    return jnp.asarray([[1.0, kx], [ky, 1.0]])


def transformation_matrix_2d(
    rotation=0.0, scale=(1.0, 1.0), shear=(0.0, 0.0),
    translation=(0.0, 0.0),
) -> jnp.ndarray:
    """3x3 homogeneous 2D transform: T @ R @ Sh @ Sc."""
    lin = (
        rotation_matrix_2d(rotation)
        @ shear_matrix_2d(*shear)
        @ scale_matrix_2d(*scale)
    )
    m = jnp.eye(3)
    m = m.at[:2, :2].set(lin)
    m = m.at[:2, 2].set(jnp.asarray(translation))
    return m


def rotation_matrix_3d(axis: str, theta) -> jnp.ndarray:
    c, s = jnp.cos(theta), jnp.sin(theta)
    if axis == "x":
        return jnp.asarray([[1, 0, 0], [0, c, -s], [0, s, c]], jnp.float32)
    if axis == "y":
        return jnp.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], jnp.float32)
    if axis == "z":
        return jnp.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], jnp.float32)
    raise ValueError(f"axis must be x|y|z, got {axis}")


def transformation_matrix_3d(
    rotations=((0.0, "z"),), scale=(1.0, 1.0, 1.0),
    translation=(0.0, 0.0, 0.0),
) -> jnp.ndarray:
    """4x4 homogeneous 3D transform."""
    lin = jnp.eye(3)
    for theta, axis in rotations:
        lin = rotation_matrix_3d(axis, theta) @ lin
    lin = lin @ jnp.diag(jnp.asarray(scale, jnp.float32))
    m = jnp.eye(4)
    m = m.at[:3, :3].set(lin)
    m = m.at[:3, 3].set(jnp.asarray(translation))
    return m


def apply_homogeneous(matrix: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply an (d+1)x(d+1) matrix to (N, d) points."""
    d = points.shape[-1]
    ones = jnp.ones(points.shape[:-1] + (1,), points.dtype)
    homo = jnp.concatenate([points, ones], axis=-1)
    out = homo @ matrix.T
    return out[..., :d] / out[..., d:]
