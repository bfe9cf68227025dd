"""bench.py must survive transient TPU-tunnel outages: its
`_wait_for_backend` retries UNAVAILABLE errors with backoff instead of
recording a spurious end-of-round failure (observed outage 2026-08-18:
the first device op raises `RuntimeError: ... UNAVAILABLE: TPU backend
setup/compile error`)."""
import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_wait_for_backend_retries_unavailable(monkeypatch):
    calls = {"n": 0}

    class FakeJax:
        @staticmethod
        def devices():
            calls["n"] += 1
            if calls["n"] < 3:
                raise RuntimeError(
                    "Unable to initialize backend 'axon': UNAVAILABLE: "
                    "TPU backend setup/compile error (Unavailable).")
            return ["chip"]

    monkeypatch.setitem(sys.modules, "jax", FakeJax)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    bench._wait_for_backend(max_wait_s=60.0)
    assert calls["n"] == 3


def test_wait_for_backend_reraises_other_errors(monkeypatch):
    class FakeJax:
        @staticmethod
        def devices():
            raise RuntimeError("Backend 'axon' is not in the list of "
                               "known backends")

    monkeypatch.setitem(sys.modules, "jax", FakeJax)
    with pytest.raises(RuntimeError, match="known backends"):
        bench._wait_for_backend(max_wait_s=60.0)


def test_wait_for_backend_bounds_a_hanging_grant(monkeypatch):
    """The other observed outage flavor: `jax.devices()` HANGS waiting
    for the chip grant. The wait must give up cleanly at the deadline
    (daemon-thread init), not hang the bench forever."""
    import threading

    class FakeJax:
        @staticmethod
        def devices():
            threading.Event().wait(30.0)
            return ["chip"]

    monkeypatch.setitem(sys.modules, "jax", FakeJax)
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="grant not issued"):
        bench._wait_for_backend(max_wait_s=1.5)
    assert time.monotonic() - t0 < 10.0


def test_wait_for_backend_gives_up_after_deadline(monkeypatch):
    clock = {"t": 0.0}
    monkeypatch.setattr(time, "time", lambda: clock["t"])

    def fake_sleep(s):
        clock["t"] += s

    monkeypatch.setattr(time, "sleep", fake_sleep)

    class FakeJax:
        @staticmethod
        def devices():
            raise RuntimeError("UNAVAILABLE: TPU backend setup/compile "
                               "error (Unavailable).")

    monkeypatch.setitem(sys.modules, "jax", FakeJax)
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        bench._wait_for_backend(max_wait_s=90.0)
    assert clock["t"] <= 150.0
