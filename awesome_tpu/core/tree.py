"""PyTree utilities — the functional replacement of the reference's
``TensorUtil`` recursive tensor helpers (`awesome/util/torch.py:106-336`).

In JAX, "state_dicts" are parameter PyTrees, so deep apply/to/hash collapse
to thin wrappers over ``jax.tree_util``. The additions that matter for the
TPU design live here too: stacking per-image parameter trees along a leading
axis (the core trick that turns the reference's serial ``load_state_dict``
weight swaps — `awesome/dataset/prior_dataset.py:96-110` — into a batched
axis for ``vmap``), and indexed select/update on such stacked trees.
"""
from __future__ import annotations

import hashlib
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Any  # a PyTree of jnp arrays


def apply_deep(tree: Params, fnc: Callable[[jnp.ndarray], jnp.ndarray]) -> Params:
    """Apply ``fnc`` to every array leaf. Spec: `awesome/util/torch.py:141`."""
    return jax.tree_util.tree_map(fnc, tree)


def to_dtype(tree: Params, dtype) -> Params:
    """Cast every floating leaf. Spec: `awesome/util/torch.py:106` (``to``)."""

    def _cast(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return jnp.asarray(x, dtype=dtype)
        return jnp.asarray(x)

    return jax.tree_util.tree_map(_cast, tree)


def to_device(tree: Params, device) -> Params:
    """Place every leaf on ``device`` (a jax.Device or Sharding)."""
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, device), tree)


def tree_hash(tree: Params) -> str:
    """Deterministic content hash of a PyTree (structure + values).

    Spec: `awesome/util/torch.py:160` (``to_hash``); used by the Zoo
    content-addressed prefit cache (`awesome/model/zoo.py:188`).
    """
    h = hashlib.sha256()
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    h.update(repr(treedef).encode())
    for leaf in leaves:
        arr = np.asarray(leaf)
        h.update(str(arr.dtype).encode())
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())
    return h.hexdigest()


def stack_trees(trees: Sequence[Params]) -> Params:
    """Stack N structurally-identical param trees into one tree whose leaves
    have a leading axis of size N.

    This is the stacked-prior-PyTree at the heart of the TPU design: the
    reference keeps a dict index->state_dict (`awesome/util/prior_cache.py:10`)
    and serially swaps entries into the live model; here the whole cache is a
    single device array per leaf, "swapping" is indexing, and fitting all
    priors is one ``vmap``ped program.
    """
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *trees)


def unstack_tree(tree: Params) -> list:
    """Inverse of :func:`stack_trees`: split the leading axis into a list."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    n = leaves[0].shape[0]
    return [
        jax.tree_util.tree_unflatten(treedef, [leaf[i] for leaf in leaves])
        for i in range(n)
    ]


def tree_select(stacked: Params, index) -> Params:
    """Select entry ``index`` from a stacked tree (jit-safe gather)."""
    return jax.tree_util.tree_map(lambda x: x[index], stacked)


def tree_update(stacked: Params, index, value: Params) -> Params:
    """Write ``value`` at ``index`` of a stacked tree (functional update)."""
    return jax.tree_util.tree_map(
        lambda s, v: s.at[index].set(v), stacked, value
    )


def tree_where(pred, a: Params, b: Params) -> Params:
    """Leafwise ``where`` with a scalar predicate — used for the IoU-gated
    accept/retry logic of the prior fit (`awesome/model/path_connected_net.py:964-982`)
    inside compiled code."""
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def count_parameters(tree: Params) -> int:
    """Total number of scalar parameters. Spec: `awesome/run/functions.py:2580`."""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))
