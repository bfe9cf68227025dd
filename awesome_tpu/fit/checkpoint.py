"""Checkpointing: agent-checkpoint bundles + stacked prior caches.

Behavior port of the reference's multi-granular scheme (SURVEY.md §5.4):

- agent checkpoints bundling model/optimizer params+state, tracker and
  config (`awesome/agent/torch_agent_checkpoint.py`,
  `awesome/agent/torch_agent.py:1005-1136` to_acc/from_acc/load_acc),
- prior-cache checkpoints = the whole stacked per-image param tree
  (`awesome/util/prior_cache.py:61-91` save/load),
- pretrain-state files enabling skip of the sequential fit
  (`awesome/agent/torch_agent.py:569-607`).

Uses Orbax when available (async, sharding-aware — the TPU-native choice),
with a plain .npz fallback so checkpoints never block on optional deps.
"""
from __future__ import annotations

import contextlib
import json
import logging
import os
import pickle
import shutil
from typing import Any, Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


def _try_orbax():
    try:
        import jax

        if jax.process_count() > 1:
            # Orbax synchronizes every save/restore across ALL
            # jax.distributed processes (incrementing barrier ids). The
            # DCN fan-out runs INDEPENDENT jobs per process
            # (scripts/run_sharded.py --coordinator), so workers save
            # different checkpoint sequences -> mismatched barriers ->
            # deadlock (observed: both workers asleep forever). Per-run
            # checkpoints are process-local by design; use the .npz path.
            return None
        import orbax.checkpoint as ocp

        return ocp
    except Exception:
        return None


def save_pytree(tree: Any, path: str) -> None:
    """Persist an arbitrary param PyTree (directory via Orbax, else .npz +
    pickled treedef)."""
    import jax

    ocp = _try_orbax()
    if ocp is not None:
        try:
            ckptr = ocp.PyTreeCheckpointer()
            ckptr.save(os.path.abspath(path), tree, force=True)
            return
        except Exception:
            pass
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    np.savez(path + ".npz", *[np.asarray(x) for x in leaves])
    with open(path + ".treedef.pkl", "wb") as f:
        pickle.dump(treedef, f)


_warned_unreadable: set = set()


def pytree_exists(path: str) -> bool:
    """True iff ``save_pytree(path)`` artifacts exist AND are readable by
    ``load_pytree`` in THIS process configuration.

    An Orbax directory only counts when Orbax is usable here: under
    multi-process runs ``_try_orbax`` is disabled (barrier deadlock on
    independent job streams — see its comment), so a single-process
    Orbax checkpoint resumed under the DCN fan-out must register as
    absent (fresh start + warning) rather than crash ``load_pytree``."""
    if os.path.exists(path + ".npz"):
        return True
    if os.path.isdir(path):
        if _try_orbax() is not None:
            return True
        if path not in _warned_unreadable:
            _warned_unreadable.add(path)
            logger.warning(
                "checkpoint %s is an Orbax directory but Orbax is "
                "unavailable in this process (multi-process run or "
                "missing dependency); treating it as absent", path)
    return False


def _path_names(path) -> tuple:
    """Normalize a jax key path to name strings so a namedtuple field
    (GetAttrKey) and its dict-restored form (DictKey) compare equal."""
    names = []
    for k in path:
        for attr in ("name", "key", "idx"):
            if hasattr(k, attr):
                names.append(str(getattr(k, attr)))
                break
        else:
            names.append(str(k))
    return tuple(names)


def restructure_like(template: Any, restored: Any) -> Any:
    """Rebuild ``restored`` with ``template``'s exact PyTree structure.

    Orbax restores NamedTuple nodes (optimizer states, train states) as
    plain dicts keyed by field name; leaves are matched by their
    normalized key paths, so field ORDER differences between the
    namedtuple definition and dict key sorting cannot mis-assign them."""
    import jax
    import jax.numpy as jnp

    flat_r, _ = jax.tree_util.tree_flatten_with_path(restored)
    by_path = {_path_names(p): leaf for p, leaf in flat_r}
    flat_t, treedef = jax.tree_util.tree_flatten_with_path(template)
    try:
        leaves = [jnp.asarray(by_path[_path_names(p)]) for p, _ in flat_t]
    except KeyError as e:
        raise ValueError(
            f"checkpoint is missing leaf {e} expected by the template "
            f"(has: {sorted(by_path)[:8]}...)"
        ) from None
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_pytree(path: str, template: Optional[Any] = None) -> Any:
    import jax
    import jax.numpy as jnp

    ocp = _try_orbax()
    if ocp is not None and os.path.isdir(path):
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(os.path.abspath(path))
        if template is not None:
            return restructure_like(template, restored)
        return restored
    if os.path.isdir(path) and not os.path.exists(path + ".npz"):
        raise RuntimeError(
            f"checkpoint {path} is an Orbax directory but Orbax is "
            f"unavailable in this process (multi-process run or missing "
            f"dependency); re-save it with save_pytree here or resume "
            f"single-process")
    data = np.load(path + ".npz")
    leaves = [jnp.asarray(data[k]) for k in data.files]
    if template is not None:
        _, treedef = jax.tree_util.tree_flatten(template)
    else:
        with open(path + ".treedef.pkl", "rb") as f:
            treedef = pickle.load(f)
    return jax.tree_util.tree_unflatten(treedef, leaves)


class AgentCheckpoint:
    """Bundle of everything needed to resume or analyze a run."""

    def __init__(
        self,
        name: str,
        params: Any,
        opt_state: Any = None,
        tracker: Optional[Dict] = None,
        config: Optional[Dict] = None,
        extra: Optional[Dict] = None,
    ):
        self.name = name
        self.params = params
        self.opt_state = opt_state
        self.tracker = tracker
        self.config = config
        self.extra = extra or {}

    def save(self, directory: str) -> str:
        os.makedirs(directory, exist_ok=True)
        save_pytree(self.params, os.path.join(directory, "params"))
        if self.opt_state is not None:
            save_pytree(self.opt_state, os.path.join(directory, "opt_state"))
        meta = {
            "name": self.name,
            "tracker": self.tracker,
            "config": self.config,
            "extra": self.extra,
            "has_opt_state": self.opt_state is not None,
        }
        with open(os.path.join(directory, "meta.json"), "w") as f:
            json.dump(meta, f, default=str)
        return directory

    @classmethod
    def load(
        cls,
        directory: str,
        params_template: Optional[Any] = None,
        opt_template: Optional[Any] = None,
    ) -> "AgentCheckpoint":
        with open(os.path.join(directory, "meta.json")) as f:
            meta = json.load(f)
        params = load_pytree(os.path.join(directory, "params"), params_template)
        opt_state = None
        if meta.get("has_opt_state"):
            opt_state = load_pytree(
                os.path.join(directory, "opt_state"), opt_template
            )
        return cls(
            name=meta["name"],
            params=params,
            opt_state=opt_state,
            tracker=meta.get("tracker"),
            config=meta.get("config"),
            extra=meta.get("extra", {}),
        )


@contextlib.contextmanager
def atomic_dir(directory: str):
    """Write a checkpoint tag directory ATOMICALLY.

    Yields a scratch path; on clean exit the scratch dir replaces
    ``directory`` via two renames (old -> ``<dir>.old``, tmp -> dir).
    A preemption mid-save can therefore never tear a checkpoint: either
    the previous complete save survives (at the tag or its ``.old``
    twin — ``find_resumable`` scans both) or the new complete save
    lands. The reference has no resumable checkpoints at all
    (`awesome/agent/torch_agent.py:1090-1136` only reloads params
    post-hoc), so this preemption window is a TPU-rebuild concern."""
    tmp = directory + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    parent = os.path.dirname(directory) or "."
    os.makedirs(parent, exist_ok=True)
    yield tmp
    old = directory + ".old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(directory):
        os.rename(directory, old)
    os.rename(tmp, directory)
    if os.path.isdir(old):
        shutil.rmtree(old)


def find_resumable(base: str, kind: str,
                   tags=("latest", "end")) -> Optional[tuple]:
    """Locate the newest RESUMABLE checkpoint under ``base``.

    Scans each tag directory and its ``.old`` crash-window twin (see
    ``atomic_dir``), requiring a readable meta.json whose
    ``extra.state_kind`` matches ``kind`` exactly plus a persisted full
    ``train_state``. Torn/unreadable metadata is skipped with a warning,
    never fatal — a preempted save must not brick the restart it exists
    to serve. Returns ``(epoch, directory, meta)`` or ``None``."""
    best = None
    for tag in tags:
        d0 = os.path.join(base, tag)
        for d in (d0, d0 + ".old"):
            mp = os.path.join(d, "meta.json")
            if not (os.path.exists(mp)
                    and pytree_exists(os.path.join(d, "train_state"))):
                continue
            try:
                with open(mp) as f:
                    meta = json.load(f)
            except (OSError, ValueError) as e:
                logger.warning("skipping unreadable checkpoint meta %s: %s",
                               mp, e)
                continue
            ex = meta.get("extra") or {}
            try:
                ep = int(ex.get("epoch", -1))
            except (TypeError, ValueError):
                continue
            if ep <= 0 or ex.get("state_kind") != kind:
                continue
            # equal-epoch tie: prefer the save that recorded the
            # early-stop (a 'latest' written in the stopping epoch
            # must not shadow the stopped 'end' and retrain)
            key = (ep, 1 if ex.get("stopped_early") else 0)
            if best is None or key > best[0]:
                best = (key, d, meta)
    if best is None:
        return None
    return best[0][0], best[1], best[2]


def load_tag_with_twin(base: str, tag: str, subpath: str,
                       template: Any) -> Optional[Any]:
    """Load ``<base>/<tag>/<subpath>`` with fallback to the tag's
    ``.old`` atomic-swap crash twin (a preemption during a tag save can
    leave only the twin — see ``atomic_dir``). Returns the loaded pytree
    or ``None`` when neither directory holds a readable save."""
    d0 = os.path.join(base, tag)
    for d in (d0, d0 + ".old"):
        p = os.path.join(d, subpath)
        if not (os.path.exists(os.path.join(d, "meta.json"))
                and pytree_exists(p)):
            continue
        try:
            return load_pytree(p, template=template)
        except Exception as e:  # torn save: fall through to the twin
            if d.endswith(".old"):
                logger.warning("checkpoint twin %s unreadable (%s); "
                               "giving up", d, e)
            else:
                logger.warning("checkpoint %s unreadable (%s); trying twin",
                               d, e)
    return None


def restore_resumable(
    checkpoint_dir: str,
    kind: str,
    template_state: Any,
    num_epochs: int,
    best_subpath: str = "train_state",
    best_template: Optional[Any] = None,
    validate=None,
) -> Optional[Dict]:
    """The shared resume restore sequence used by every training loop
    (pixel, FBMS joint, multi-object joint — `runner/runner.py:_try_resume`
    and `runner/fbms_runner.py:_try_resume_joint` are thin adapters).

    Locates the newest resumable checkpoint of ``kind`` (incl. ``.old``
    atomic-swap crash twins), rebuilds the full NamedTuple train state
    from ``template_state``, restores the tracker, and loads the 'best'
    tag (or its twin). ``validate(epoch, extra)`` runs after discovery
    and before any loading so cadence-misalignment errors fire first.

    Returns ``None`` when nothing resumable exists, else a dict with
    ``state`` (rebuilt NamedTuple), ``epoch``, ``meta``, ``extra``,
    ``tracker`` (restored Tracker or None), ``best`` (raw loaded pytree
    for ``best_subpath`` or None) and ``dir``.

    Spec: `awesome/agent/torch_agent.py:1090-1136` (the reference only
    reloads params post-hoc; full bit-identical resume is a TPU-rebuild
    extension — semantics locked by tests/test_resume.py)."""
    from awesome_tpu.fit.tracker import Tracker

    found = find_resumable(checkpoint_dir, kind)
    if found is None:
        logger.info("resume requested but nothing resumable under %s — "
                    "starting fresh", checkpoint_dir)
        return None
    ep, d, meta = found
    extra = meta.get("extra") or {}
    if ep >= num_epochs:
        # keep the TRUE epoch — the loop just has nothing left to run;
        # checked BEFORE any caller validation so a complete run resumed
        # under a different cadence no-ops instead of crashing
        logger.info("resume checkpoint epoch %d >= num_epochs %d — "
                    "nothing left to train", ep, num_epochs)
    elif validate is not None:
        validate(ep, extra)
    restored = load_pytree(os.path.join(d, "train_state"),
                           template=tuple(template_state))
    state = type(template_state)(*restored)
    tracker = (Tracker.from_dict(meta["tracker"])
               if meta.get("tracker") else None)
    # 'best' or its .old atomic-swap crash twin (a preemption mid-best-
    # save can leave only the twin — without it the restored best-model
    # gate would block re-saving until a strictly better metric)
    bst = load_tag_with_twin(
        checkpoint_dir, "best", best_subpath,
        best_template if best_template is not None else tuple(template_state),
    )
    if bst is None:
        logger.info("no readable best checkpoint; best-model restarts")
    logger.info("Resuming training from %s at epoch %d", d, ep)
    return {"state": state, "epoch": ep, "meta": meta, "extra": extra,
            "tracker": tracker, "best": bst, "dir": d}


def run_with_emergency(fn, emergency_dir: Optional[str], state_getter,
                       extra_getter=None):
    """Run ``fn()``; on an unexpected error dump the newest host-visible
    train state + traceback under ``emergency_dir`` before re-raising.

    The single emergency wrapper consumed by all training entry points
    (pixel `runner/runner.py:train` and both FBMS joint loops) —
    reference `awesome/agent/torch_agent.py:1063` ``emergency_save``.
    ``state_getter``/``extra_getter`` are called lazily inside the
    handler so they always observe the newest state at failure time."""
    try:
        return fn()
    except BaseException as err:
        if emergency_dir:
            try:
                extra = extra_getter() if extra_getter is not None else None
                d = emergency_save(emergency_dir, params=state_getter(),
                                   error=err, extra=extra)
                logger.error("training failed (%r) — emergency state "
                             "dumped to %s", err, d)
            except Exception:
                logger.exception("emergency save itself failed")
        raise


def save_prior_cache(stacked_params: Any, path: str) -> None:
    """Prior-cache checkpoint: the stacked per-image tree in one file."""
    save_pytree(stacked_params, path)


def load_prior_cache(path: str, template: Optional[Any] = None) -> Any:
    return load_pytree(path, template)


def emergency_save(
    directory: str,
    params: Any = None,
    batch: Any = None,
    error: Optional[BaseException] = None,
    extra: Optional[Dict] = None,
) -> str:
    """Dump everything available about a failing step for post-mortem.

    Spec: `awesome/agent/torch_agent.py:1063` ``emergency_save`` (the
    reference torch.saves model+batch on an unexpected training error;
    the occurred error is recorded with the end-of-training checkpoint,
    `torch_agent.py:762-790`).
    """
    import traceback

    os.makedirs(directory, exist_ok=True)
    if params is not None:
        try:
            save_pytree(params, os.path.join(directory, "params"))
        except Exception:
            pass
    if batch is not None:
        try:
            save_pytree(batch, os.path.join(directory, "batch"))
        except Exception:
            pass
    meta = {"extra": extra or {}}
    if error is not None:
        meta["error"] = repr(error)
        meta["traceback"] = "".join(
            traceback.format_exception(type(error), error,
                                       error.__traceback__)
        )
    with open(os.path.join(directory, "emergency.json"), "w") as f:
        json.dump(meta, f, default=str)
    return directory
