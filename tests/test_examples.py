"""The user-facing example scripts run end-to-end (tiny budgets).

The examples are executable documentation (the reference's how-to
notebooks, `notebooks/how_to/*.ipynb`); these tests lock their CLI and
default (reference-shipped-image) paths so a new user's first command
works. Subprocess-isolated: each example must run from a clean
interpreter with no test fixtures.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")


def _run(script, *args, timeout=560):
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    r = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script), *args],
        env=env, capture_output=True, text=True, timeout=timeout,
    )
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


def test_howto_convexity_runs(tmp_path):
    out = _run("howto_convexity.py", "--epochs", "5",
               "--out", str(tmp_path))
    assert "loss" in out
    assert (tmp_path / "convex_mask.png").exists()


def test_howto_path_connectedness_runs_on_shipped_cat(tmp_path):
    if not os.path.exists(
        "/root/reference/notebooks/how_to/data/cat_scribbled.jpg"
    ):
        pytest.skip("reference how-to data not present")
    out = _run("howto_path_connectedness.py", "--epochs", "5",
               "--out", str(tmp_path))
    # post-fit invertibility is part of the example's contract
    assert "deformation inverse max err" in out
    assert (tmp_path / "mask.png").exists()


def test_howto_path_connectedness_synthetic(tmp_path):
    out = _run("howto_path_connectedness.py", "--epochs", "5",
               "--synthetic", "--out", str(tmp_path))
    assert "fit IoU" in out


def test_howto_multi_object_runs():
    _run("howto_multi_object.py", "--steps", "5")


def test_howto_read_results_runs(tmp_path):
    out = _run("howto_read_results.py", "--epochs", "20",
               "--out", str(tmp_path))
    assert "tracked metrics" in out
    assert "comparison table" in out
    assert (tmp_path / "metric_curve.png").exists()
    assert (tmp_path / "metric_bar.png").exists()
