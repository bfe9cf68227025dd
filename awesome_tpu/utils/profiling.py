"""Profiling & numerics guards — first-class observability (SURVEY.md
§5.1/§5.2: the reference has only wall-clock timers and a NaN abort).

- :func:`trace` — JAX profiler trace context writing TensorBoard-viewable
  traces (the perfetto/xplane dump for the north-star metric work),
- :class:`PhaseTimer` — named phase wall-clock accounting with device
  sync, reportable as a dict,
- :func:`debug_guard` — context enabling jax debug_nans/debug_infs
  (compile-time-checked numerics tripwires),
- :func:`assert_finite` — host-side finite check over a PyTree (the
  explicit fit-loop guard; inside compiled loops the fit engine's masked
  NaN guard is used instead).
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """with timer.phase('pretrain'): ... -> timer.report()"""

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, wait_on: Optional[Any] = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if wait_on is not None:
                import jax

                jax.block_until_ready(wait_on)
            self.times[name] = self.times.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def report(self) -> Dict[str, float]:
        return dict(self.times)


@contextlib.contextmanager
def debug_guard(nans: bool = True, infs: bool = False):
    import jax

    old_nans = jax.config.jax_debug_nans
    old_infs = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
        jax.config.update("jax_debug_infs", old_infs)


def assert_finite(tree: Any, name: str = "tree") -> None:
    import jax
    import numpy as np

    for i, leaf in enumerate(jax.tree_util.tree_leaves(tree)):
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            raise FloatingPointError(
                f"non-finite values in {name} leaf {i} "
                f"(shape {arr.shape}): "
                f"{np.count_nonzero(~np.isfinite(arr))} bad entries"
            )
