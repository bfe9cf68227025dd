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
    """`fit_priors_batched` with the image axis sharded over the mesh's
    data axis. Works on any mesh size that divides the batch; on one chip
    it degrades to the plain batched fit.
    """
    from awesome_tpu.fit.prior_fit import fit_priors_batched

    if mesh is None:
        mesh = make_mesh()
    stacked_params = shard_batched(mesh, stacked_params)
    stacked_targets = shard_batched(mesh, {"t": stacked_targets})["t"]
    if points.ndim == 3:
        points = shard_batched(mesh, {"p": points})["p"]
    else:
        points = jax.device_put(points, NamedSharding(mesh, P(None, None)))
    return fit_priors_batched(
        model, stacked_params, points, stacked_targets, cfg, **kwargs
    )
