"""Device-mesh sharding for the prior engine.

The reference has no distributed layer at all (SURVEY.md §2.3) — its only
scale-out is SLURM job files (`awesome/run/multi_runner.py:106-236`). The
TPU-native equivalents, per SURVEY.md §5.8:

- **data axis**: independent per-image prior fits shard perfectly across
  chips (the stacked-params leading axis),
- **grid axis**: H*W*T coordinate points are independent through the
  MLP/flow (the sequence-parallel analogue — no attention, the only
  cross-point coupling is the loss reduction, one ``psum``),

expressed as a 2D ``jax.sharding.Mesh`` ("data", "grid") with
``NamedSharding`` annotations; XLA inserts the collectives.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Any


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("data", "grid"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2D mesh. Default: all devices on the data axis."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def shard_batched(mesh: Mesh, tree: Params, axis: str = "data") -> Params:
    """Place a stacked PyTree with its leading axis sharded over ``axis``."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree: Params) -> Params:
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def fit_priors_sharded(
    model,
    stacked_params: Params,
    points: jnp.ndarray,
    stacked_targets: jnp.ndarray,
    cfg,
    mesh: Optional[Mesh] = None,
    **kwargs,
):
    """`fit_priors_batched` sharded 2D: image axis over 'data', coordinate
    points over 'grid' (the sequence-parallel analogue — points are
    independent through the MLP/flow; the per-step loss reduction is the
    one collective, a psum XLA inserts from the shardings). On one chip it
    degrades to the plain batched fit.
    """
    from awesome_tpu.fit.prior_fit import fit_priors_batched

    if mesh is None:
        mesh = make_mesh()
    grid_axis = "grid" if "grid" in mesh.axis_names else None
    stacked_params = shard_batched(mesh, stacked_params)
    stacked_targets = jax.device_put(
        stacked_targets, NamedSharding(mesh, P("data", grid_axis, None))
    )
    if points.ndim == 3:
        points = jax.device_put(
            points, NamedSharding(mesh, P("data", grid_axis, None))
        )
    else:
        points = jax.device_put(
            points, NamedSharding(mesh, P(grid_axis, None))
        )
    return fit_priors_batched(
        model, stacked_params, points, stacked_targets, cfg, **kwargs
    )


def fit_spatiotemporal_sharded(
    model,
    params: Params,
    frame_points: jnp.ndarray,  # (T, N, 3) or (N, 3)
    frame_targets: jnp.ndarray,  # (T, N, 1)
    labeled_masks,
    cfg,
    mesh: Optional[Mesh] = None,
    **kwargs,
):
    """Sharded spatio-temporal fit: the H*W point axis of every frame is
    sharded over 'grid' (the H·W·T workload of SURVEY §5.7 — the largest
    point count in the framework), the shared prior params are replicated,
    and the per-frame loss sum becomes a psum. Semantically identical to
    :func:`awesome_tpu.fit.spatiotemporal.fit_spatiotemporal_prior`
    (equivalence-tested on the virtual 8-device mesh).
    """
    from awesome_tpu.fit.spatiotemporal import fit_spatiotemporal_prior

    if mesh is None:
        mesh = make_mesh()
    grid_axis = "grid" if "grid" in mesh.axis_names else mesh.axis_names[-1]
    params = replicate(mesh, params)
    # divisibility-aware placement: a point count that does not divide the
    # grid axis falls back to replication on that axis (correctness first,
    # like maybe_shard) instead of a device_put error
    if frame_points.ndim == 3:
        frame_points = maybe_shard(
            mesh, frame_points, (None, grid_axis, None))
    else:
        frame_points = maybe_shard(mesh, frame_points, (grid_axis, None))
    frame_targets = maybe_shard(
        mesh, frame_targets, (None, grid_axis, None))
    if labeled_masks is not None:
        labeled_masks = maybe_shard(
            mesh, labeled_masks, (None, grid_axis))
    return fit_spatiotemporal_prior(
        model, params, frame_points, frame_targets, labeled_masks, cfg,
        **kwargs,
    )


# --- runner integration -----------------------------------------------------


def mesh_from_config(config) -> Optional[Mesh]:
    """Build the runner's mesh from ``AwesomeConfig.mesh_shape``.

    ``mesh_shape``: ``[data, grid]`` (e.g. ``[4, 2]``), ``[n]`` (all on
    data), or ``-1`` in one slot to absorb the remaining devices. ``None``
    -> no mesh: the runner stays single-device (round-3 behavior).
    """
    shape = getattr(config, "mesh_shape", None)
    if not shape:
        return None
    if isinstance(shape, int):
        shape = [shape]
    shape = list(shape) + [1] * (2 - len(shape))
    # LOCAL devices only: under jax.distributed each run_sharded worker
    # executes its OWN experiment shard — a mesh spanning other processes'
    # non-addressable chips would deadlock mismatched SPMD programs
    devices = jax.local_devices()
    n = len(devices)
    if -1 in shape:
        other = shape[1] if shape[0] == -1 else shape[0]
        shape[shape.index(-1)] = max(n // max(other, 1), 1)
    return make_mesh((int(shape[0]), int(shape[1])), devices=devices)


def maybe_shard(mesh: Optional[Mesh], x, axes: Sequence[Optional[str]]):
    """device_put with a PartitionSpec, silently dropping any axis whose
    size does not divide the mesh axis (uneven image counts / odd pixel
    counts fall back to replication on that axis — correctness first)."""
    if mesh is None:
        return x
    x = jnp.asarray(x)
    spec = []
    for d in range(x.ndim):
        name = axes[d] if d < len(axes) else None
        if name is not None and name in mesh.axis_names:
            size = mesh.shape[name]
            if size > 1 and x.shape[d] % size == 0:
                spec.append(name)
                continue
        spec.append(None)
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def shard_leading_stacked(mesh: Optional[Mesh], tree: Params, batch: int,
                          axis: str = "data") -> Params:
    """Shard every leaf whose LEADING dim equals ``batch`` over ``axis``;
    replicate everything else. The per-image stacked-PyTree convention
    makes this the one rule needed to place train states / optimizer
    moments / schedules."""
    if mesh is None:
        return tree

    def put(x):
        x = jnp.asarray(x)
        if (
            x.ndim >= 1
            and x.shape[0] == batch
            and mesh.shape[axis] > 1
            and batch % mesh.shape[axis] == 0
        ):
            return jax.device_put(
                x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
            )
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, tree)
