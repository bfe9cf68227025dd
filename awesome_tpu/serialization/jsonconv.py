"""Polymorphic JSON/YAML (de)serialization with ``__class__`` tags.

Behavior port of the reference's JsonConvertible machinery
(`awesome/serialization/json_convertible.py:33-632` + the pluggable rule
registry `serialization/rules/json_serialization_rule_registry.py:8`):
objects serialize to dicts carrying a ``__class__`` dotted path and are
reconstructed via dynamic import; a rule registry handles non-dataclass
types (tuple/set/slice/enum/datetime/numpy/jax arrays).

Used for configs, split indices, prior caches and analytics — anything
that must round-trip to YAML/JSON with type fidelity.
"""
from __future__ import annotations

import dataclasses
import datetime as _dt
import enum
import importlib
import json
import os
from typing import Any, Callable, Dict, List, Optional, Tuple

CLASS_KEY = "__class__"
_RULES: List["Rule"] = []


@dataclasses.dataclass
class Rule:
    name: str
    matches: Callable[[Any], bool]
    encode: Callable[[Any], Dict[str, Any]]
    decode: Callable[[Dict[str, Any]], Any]


def register_rule(name, matches, encode, decode):
    _RULES.append(Rule(name, matches, encode, decode))


def dynamic_import(path: str):
    """Import a dotted name. Spec: `awesome/util/reflection.py`."""
    module, _, attr = path.rpartition(".")
    if not module:
        return importlib.import_module(attr)
    return getattr(importlib.import_module(module), attr)


def class_name(obj_or_type) -> str:
    t = obj_or_type if isinstance(obj_or_type, type) else type(obj_or_type)
    return f"{t.__module__}.{t.__qualname__}"


# --- built-in rules ------------------------------------------------------

def _np():
    import numpy as np

    return np


register_rule(
    "tuple",
    lambda v: isinstance(v, tuple),
    lambda v: {CLASS_KEY: "builtins.tuple", "items": [to_jsonable(x) for x in v]},
    lambda d: tuple(from_jsonable(x) for x in d["items"]),
)
register_rule(
    "set",
    lambda v: isinstance(v, (set, frozenset)),
    lambda v: {CLASS_KEY: "builtins.set", "items": [to_jsonable(x) for x in v]},
    lambda d: set(from_jsonable(x) for x in d["items"]),
)
register_rule(
    "slice",
    lambda v: isinstance(v, slice),
    lambda v: {CLASS_KEY: "builtins.slice", "start": v.start, "stop": v.stop,
               "step": v.step},
    lambda d: slice(d["start"], d["stop"], d["step"]),
)
register_rule(
    "datetime",
    lambda v: isinstance(v, _dt.datetime),
    lambda v: {CLASS_KEY: "datetime.datetime", "iso": v.isoformat()},
    lambda d: _dt.datetime.fromisoformat(d["iso"]),
)
register_rule(
    "enum",
    lambda v: isinstance(v, enum.Enum),
    lambda v: {CLASS_KEY: class_name(v), "value": to_jsonable(v.value),
               "__enum__": True},
    lambda d: dynamic_import(d[CLASS_KEY])(from_jsonable(d["value"])),
)
register_rule(
    "type",
    lambda v: isinstance(v, type),
    lambda v: {CLASS_KEY: "builtins.type", "name": class_name(v)},
    lambda d: dynamic_import(d["name"]),
)


def _is_array(v) -> bool:
    np = _np()
    if isinstance(v, np.ndarray):
        return True
    try:
        import jax

        return isinstance(v, jax.Array)
    except Exception:
        return False


register_rule(
    "ndarray",
    _is_array,
    lambda v: {
        CLASS_KEY: "numpy.ndarray",
        "dtype": str(_np().asarray(v).dtype),
        "data": _np().asarray(v).tolist(),
    },
    lambda d: _np().asarray(d["data"], dtype=d["dtype"]),
)


def _is_module_function(v) -> bool:
    import types

    if not isinstance(v, types.FunctionType):
        return False
    # only module-level functions round-trip by reference (the reference's
    # function rule has the same restriction,
    # `awesome/serialization/rules/json_function_serialization_rule.py`)
    return "<locals>" not in v.__qualname__


register_rule(
    "function",
    _is_module_function,
    lambda v: {CLASS_KEY: "builtins.function",
               "name": f"{v.__module__}.{v.__qualname__}"},
    lambda d: dynamic_import(d["name"]),
)


def _pickle_encode(v):
    import base64
    import pickle

    return {
        CLASS_KEY: "pickle",
        "data": base64.b64encode(pickle.dumps(v)).decode("ascii"),
        "repr": repr(v)[:200],
    }


def _pickle_decode(d):
    import base64
    import pickle

    return pickle.loads(base64.b64decode(d["data"]))


# --- core ----------------------------------------------------------------

def to_jsonable(value: Any) -> Any:
    """Recursively convert to JSON-safe structures with class tags."""
    if value is None or isinstance(value, (bool, int, float, str)):
        return value
    for rule in _RULES:
        if rule.matches(value):
            return rule.encode(value)
    if isinstance(value, dict):
        return {str(k): to_jsonable(v) for k, v in value.items()}
    if isinstance(value, list):
        return [to_jsonable(v) for v in value]
    if dataclasses.is_dataclass(value) and not isinstance(value, type):
        out = {CLASS_KEY: class_name(value)}
        for f in dataclasses.fields(value):
            out[f.name] = to_jsonable(getattr(value, f.name))
        return out
    if hasattr(value, "__dict__"):
        out = {CLASS_KEY: class_name(value)}
        for k, v in vars(value).items():
            if not k.startswith("_"):
                out[k] = to_jsonable(v)
        return out
    # last resort: base64 pickle (the reference's pickle rule,
    # `awesome/serialization/rules/json_pickle_serialization_rule.py`)
    return _pickle_encode(value)


def from_jsonable(data: Any) -> Any:
    """Inverse of :func:`to_jsonable` (class tags drive reconstruction)."""
    if isinstance(data, list):
        return [from_jsonable(v) for v in data]
    if not isinstance(data, dict):
        return data
    tag = data.get(CLASS_KEY)
    if tag is None:
        return {k: from_jsonable(v) for k, v in data.items()}
    decoders = {
        "builtins.tuple": "tuple",
        "builtins.set": "set",
        "builtins.slice": "slice",
        "datetime.datetime": "datetime",
        "builtins.type": "type",
        "numpy.ndarray": "ndarray",
        "builtins.function": "function",
    }
    if tag in decoders:
        rule_name = decoders[tag]
        for rule in _RULES:
            if rule.name == rule_name:
                return rule.decode(data)
    if tag == "pickle":
        try:
            return _pickle_decode(data)
        except Exception:
            # foreign pickle payload (e.g. references awesome.*): keep
            # the raw envelope instead of failing the whole load
            return dict(data)
    if data.get("__enum__"):
        try:
            return dynamic_import(tag)(from_jsonable(data["value"]))
        except (ImportError, AttributeError, ValueError, KeyError):
            return from_jsonable(data["value"])
    try:
        cls = dynamic_import(tag)
    except (ImportError, AttributeError):
        # lenient resurrection: a foreign class tag (e.g. the reference's
        # own `awesome.*` tags carried inside imported configs) degrades
        # to a plain dict with the tag preserved instead of failing the
        # whole load — analytics can still read every plain field
        return {k: from_jsonable(v) for k, v in data.items()}
    kwargs = {
        k: from_jsonable(v) for k, v in data.items()
        if k not in (CLASS_KEY,)
    }
    if dataclasses.is_dataclass(cls):
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in kwargs.items() if k in names})
    obj = cls.__new__(cls)
    obj.__dict__.update(kwargs)
    return obj


# --- file I/O ------------------------------------------------------------

def save_json(value: Any, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(to_jsonable(value), f, indent=2)


def load_json(path: str) -> Any:
    with open(path) as f:
        return from_jsonable(json.load(f))


def save_yaml(value: Any, path: str) -> None:
    import yaml

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(to_jsonable(value), f, sort_keys=True)


def load_yaml(path: str) -> Any:
    import yaml

    with open(path) as f:
        return from_jsonable(yaml.safe_load(f))
