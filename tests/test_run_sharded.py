"""DCN fan-out driver: two worker processes consume disjoint shards of a
config directory and their runs aggregate into one comparison table.

Replaces the reference's SLURM job files (`awesome/run/multi_runner.py:106`)
— see scripts/run_sharded.py.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_disjoint_shards(tmp_path):
    from awesome_tpu.runner.config import AwesomeConfig
    from awesome_tpu.serialization.jsonconv import save_yaml

    cfg_dir = tmp_path / "cfgs"
    runs = tmp_path / "runs"
    os.makedirs(cfg_dir)
    for i in range(3):
        cfg = AwesomeConfig(
            name_experiment=f"shardtest_{i}",
            dataset_args={"n": 2, "h": 16, "w": 16},
            segmentation_model_args={"n_hidden": 12},
            prior_model_args={"n_hidden": 8, "n_hidden_layers": 1},
            optimizer_args={"lr": 0.02},
            num_epochs=10,
            do_pretraining=False,
            compute_metrics_during_training_nth_epoch=None,
            validation_each_nth_epoch=0,
            seed=i,
        )
        save_yaml(cfg, str(cfg_dir / f"c{i}.yaml"))

    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
    })
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_sharded.py"),
         "--config-dir", str(cfg_dir), "--num-shards", "2", "--spawn",
         "--runs-path", str(runs)],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    m0 = json.load(open(runs / "shard_0.json"))
    m1 = json.load(open(runs / "shard_1.json"))
    assert not m0["failures"] and not m1["failures"]
    # disjoint round-robin split covering all 3 configs
    assert len(m0["jobs"]) == 2 and len(m1["jobs"]) == 1
    assert not set(m0["jobs"]) & set(m1["jobs"])

    table = open(runs / "comparison.md").read()
    assert "shardtest_0" in table
    assert "shardtest_1" in table
    assert "shardtest_2" in table
    assert "best-epoch selection" in table


def test_multihost_jax_distributed_two_processes(tmp_path):
    """The MULTI-HOST branch actually executes: two processes join one
    jax.distributed cluster through ``--coordinator`` (process 0 is the
    coordinator), derive their shard ids from ``jax.process_index()``,
    produce disjoint shards, and aggregate into one comparison table.
    Replaces the reference's SLURM job files
    (`awesome/run/multi_runner.py:106-236`) at the multi-host level."""
    import socket

    from awesome_tpu.runner.config import AwesomeConfig
    from awesome_tpu.serialization.jsonconv import save_yaml

    cfg_dir = tmp_path / "cfgs"
    runs = tmp_path / "runs"
    os.makedirs(cfg_dir)
    for i in range(3):
        cfg = AwesomeConfig(
            name_experiment=f"mh_{i}",
            dataset_args={"n": 2, "h": 16, "w": 16},
            segmentation_model_args={"n_hidden": 12},
            prior_model_args={"n_hidden": 8, "n_hidden_layers": 1},
            optimizer_args={"lr": 0.02},
            num_epochs=10,
            do_pretraining=False,
            compute_metrics_during_training_nth_epoch=None,
            validation_each_nth_epoch=0,
            seed=i,
        )
        save_yaml(cfg, str(cfg_dir / f"c{i}.yaml"))

    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
    })

    def _launch():
        # bind-then-close port probing is inherently TOCTOU (another
        # process can grab the port before jax.distributed binds it),
        # so the caller retries with a fresh port on failure
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        base = [sys.executable,
                os.path.join(REPO, "scripts", "run_sharded.py"),
                "--config-dir", str(cfg_dir), "--runs-path", str(runs),
                "--coordinator", f"localhost:{port}",
                "--num-processes", "2", "--no-aggregate"]
        procs = [
            subprocess.Popen(base + ["--process-id", str(i)],
                             env=env, stdout=subprocess.PIPE,
                             stderr=subprocess.PIPE, text=True)
            for i in range(2)
        ]
        try:
            return procs, [p.communicate(timeout=900) for p in procs]
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
                p.communicate()
            return procs, None

    for attempt in range(2):
        procs, outs = _launch()
        if outs is not None and all(p.returncode == 0 for p in procs):
            break
        assert attempt == 0, (
            "multihost launch failed twice: "
            + (outs[0][1][-3000:] if outs else "timeout (likely port race)"))
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]

    # both processes joined the cluster: shard ids came from
    # jax.process_index(), num_shards from jax.process_count()
    m0 = json.load(open(runs / "shard_0.json"))
    m1 = json.load(open(runs / "shard_1.json"))
    assert m0["num_shards"] == m1["num_shards"] == 2
    assert not m0["failures"] and not m1["failures"]
    assert len(m0["jobs"]) == 2 and len(m1["jobs"]) == 1
    assert not set(m0["jobs"]) & set(m1["jobs"])

    agg = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_sharded.py"),
         "--runs-path", str(runs), "--aggregate-only"],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert agg.returncode == 0, agg.stderr[-2000:]
    table = open(runs / "comparison.md").read()
    for i in range(3):
        assert f"mh_{i}" in table
