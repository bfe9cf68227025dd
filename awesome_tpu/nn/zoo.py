"""Zoo — content-addressed cache of pretrained parameter trees.

Behavior port of `awesome/model/zoo.py:13-318`: prefit results (e.g. the
flow-identity fit, `awesome/model/path_connected_net.py:176-193`) are
stored under a SHA key derived from (name, model description, config) so
identical prefits are loaded instead of recomputed.

Entries are .npz files of flattened param leaves + a JSON sidecar with the
treedef and context.
"""
from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _hash_key(name: str, model_repr: str, config: Optional[Dict]) -> str:
    h = hashlib.sha256()
    h.update(name.encode())
    h.update(model_repr.encode())
    if config:
        h.update(json.dumps(config, sort_keys=True, default=str).encode())
    return h.hexdigest()[:32]


class Zoo:
    def __init__(self, path: str = "./zoo"):
        self.path = path

    def _entry_paths(self, key: str) -> Tuple[str, str]:
        return (
            os.path.join(self.path, f"{key}.npz"),
            os.path.join(self.path, f"{key}.json"),
        )

    def save_model_state(
        self,
        name: str,
        model,
        params: Any,
        config: Optional[Dict] = None,
        context: Optional[Dict] = None,
    ) -> str:
        """Store a param tree under the content key; returns the key."""
        import jax

        key = _hash_key(name, repr(model), config)
        npz_path, meta_path = self._entry_paths(key)
        os.makedirs(self.path, exist_ok=True)
        leaves, treedef = jax.tree_util.tree_flatten(params)
        np.savez(npz_path, *[np.asarray(x) for x in leaves])
        with open(meta_path, "w") as f:
            json.dump(
                {
                    "name": name,
                    "model": repr(model),
                    "treedef": str(treedef),
                    "config": config,
                    "context": context or {},
                },
                f,
                default=str,
            )
        return key

    def load_model_state(
        self,
        name: str,
        model,
        params_template: Any,
        config: Optional[Dict] = None,
    ) -> Tuple[Optional[Any], Dict]:
        """Returns (params or None, context). ``params_template`` supplies
        the tree structure the stored leaves are unflattened into."""
        import jax
        import jax.numpy as jnp

        key = _hash_key(name, repr(model), config)
        npz_path, meta_path = self._entry_paths(key)
        if not (os.path.exists(npz_path) and os.path.exists(meta_path)):
            return None, {}
        with open(meta_path) as f:
            meta = json.load(f)
        data = np.load(npz_path)
        leaves = [jnp.asarray(data[k]) for k in data.files]
        _, treedef = jax.tree_util.tree_flatten(params_template)
        if str(treedef) != meta["treedef"]:
            return None, {}
        return jax.tree_util.tree_unflatten(treedef, leaves), meta.get(
            "context", {}
        )
