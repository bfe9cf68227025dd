"""Wall-clock timing context (spec: `awesome/util/timer.py:5`) plus a
JAX-aware variant that waits for async dispatch before stopping — without
``block_until_ready`` a naive timer measures dispatch, not compute."""
from __future__ import annotations

import time
from typing import Any, Optional


class Timer:
    def __init__(self, name: str = ""):
        self.name = name
        self.start: Optional[float] = None
        self.elapsed: float = 0.0

    def __enter__(self) -> "Timer":
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.elapsed = time.perf_counter() - self.start

    @property
    def delta(self) -> float:
        if self.start is not None and self.elapsed == 0.0:
            return time.perf_counter() - self.start
        return self.elapsed


class DeviceTimer(Timer):
    """Timer that blocks on given arrays before stopping the clock."""

    def __init__(self, name: str = ""):
        super().__init__(name)
        self._wait_on: Any = None

    def wait_for(self, tree: Any) -> None:
        self._wait_on = tree

    def __exit__(self, *exc) -> None:
        if self._wait_on is not None:
            import jax

            jax.block_until_ready(self._wait_on)
        super().__exit__(*exc)
