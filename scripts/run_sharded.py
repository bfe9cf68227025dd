#!/usr/bin/env python
"""DCN-level experiment fan-out: shard a job list across processes/slices.

The reference scales out by writing SLURM job files
(`awesome/run/multi_runner.py:106-236`) for a GPU cluster. The TPU-native
replacement: within a slice the device mesh parallelizes one experiment
(`AwesomeConfig.mesh_shape`); ACROSS slices/hosts this driver deterministically
shards the job list (`runner/multi.py:shard_jobs`) — no scheduler files, no
shared queue, and any shard can be re-run idempotently.

Modes
-----
worker (default):
    python scripts/run_sharded.py --config-dir CFGS --num-shards 4 \
        --shard-id 1 --runs-path runs/sweep
    Runs this shard's configs in-process, writes each run's results under
    --runs-path, and records the shard manifest shard_1.json.

local fan-out (also the self-test):
    python scripts/run_sharded.py --config-dir CFGS --num-shards 2 --spawn \
        --runs-path runs/sweep
    Spawns --num-shards worker subprocesses on disjoint shards, waits, then
    aggregates.

multi-host (one worker per host/slice):
    python scripts/run_sharded.py ... --coordinator host:1234 \
        --num-processes 4 --process-id $ID
    Initializes jax.distributed so every process sees the global device set;
    shard id defaults to the process index.

aggregate:
    python scripts/run_sharded.py --runs-path runs/sweep --aggregate-only
    Merges every finished run under --runs-path into ONE ResultComparison
    table (runs/sweep/comparison.md) — the cross-shard replacement for the
    reference's per-job result folders.
"""
import argparse
import glob
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_config_file(path: str):
    """Load a config YAML — ours, or an unmodified reference YAML (routed
    through the importer, same rule as scripts/run.py)."""
    from awesome_tpu.runner.config import AwesomeConfig

    with open(path) as f:
        text = f.read()
    if "awesome." in text and "__class__" in text:
        from awesome_tpu.runner.reference_import import load_reference_config

        cfg, _ = load_reference_config(path)
    else:
        cfg = AwesomeConfig.load(path)
    cfg.prepare()
    return cfg


def run_worker(args) -> dict:
    from awesome_tpu.runner.multi import MultiConfigRunner, shard_jobs

    jobs = MultiConfigRunner(args.config_dir).create_jobs()
    mine = shard_jobs(jobs, args.num_shards, args.shard_id)
    manifest = {"shard_id": args.shard_id, "num_shards": args.num_shards,
                "jobs": [], "failures": []}
    os.makedirs(args.runs_path, exist_ok=True)
    for _, argv in mine:
        cfg_path = argv[argv.index("--config-path") + 1]
        cfg = load_config_file(cfg_path)
        cfg.runs_path = args.runs_path
        try:
            import run as run_mod  # scripts/run.py

            run_mod.main(cfg)
            manifest["jobs"].append(cfg_path)
        except Exception as e:  # noqa: BLE001 — a bad config must not
            # kill the shard (the reference's job files are independent)
            manifest["failures"].append({"config": cfg_path,
                                         "error": repr(e)})
    out = os.path.join(args.runs_path, f"shard_{args.shard_id}.json")
    with open(out, "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def aggregate(runs_path: str) -> str:
    """Merge every finished run directory into one ResultComparison
    markdown table (last- and best-epoch selections)."""
    from awesome_tpu.analytics.result_model import (
        ResultComparison,
        ResultModel,
    )

    run_dirs = sorted(
        os.path.dirname(p)
        for p in glob.glob(os.path.join(runs_path, "*", "tracker.json"))
    )
    results = [ResultModel.from_path(d) for d in run_dirs]
    out = os.path.join(runs_path, "comparison.md")
    with open(out, "w") as f:
        f.write(f"# Sharded sweep results ({len(results)} runs)\n\n")
        for selection in ("last", "best"):
            f.write(f"## {selection}-epoch selection\n\n")
            if results:
                table = ResultComparison(results).table(selection=selection)
                f.write(table.to_markdown(index=False))
            f.write("\n\n")
    return out


def spawn_local(args) -> None:
    """Launch one worker subprocess per shard (disjoint job sets).

    Children are forced onto CPU unless --spawn-accelerator: concurrent
    accelerator processes on one host contend for the same chips (on a
    single-chip host the second process blocks forever waiting for the
    grant). Accelerator fan-out belongs to the multi-host mode
    (--coordinator, one worker per host/slice)."""
    env = dict(os.environ)
    if not args.spawn_accelerator:
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
    procs = []
    base = [sys.executable, os.path.abspath(__file__),
            "--config-dir", args.config_dir,
            "--num-shards", str(args.num_shards),
            "--runs-path", args.runs_path]
    for sid in range(args.num_shards):
        procs.append(subprocess.Popen(base + ["--shard-id", str(sid)],
                                      env=env))
    rcs = [p.wait() for p in procs]
    if any(rcs):
        raise SystemExit(f"worker shard(s) failed: rcs={rcs}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-dir", type=str, default=None)
    p.add_argument("--num-shards", type=int, default=1)
    p.add_argument("--shard-id", type=int, default=None)
    p.add_argument("--runs-path", type=str, default="runs/sharded")
    p.add_argument("--spawn", action="store_true",
                   help="fan out --num-shards local worker subprocesses")
    p.add_argument("--spawn-accelerator", action="store_true",
                   help="let spawned workers use the accelerator (unsafe "
                        "with more workers than chips; default: CPU)")
    p.add_argument("--aggregate-only", action="store_true")
    p.add_argument("--no-aggregate", action="store_true")
    # multi-host coordinates (jax.distributed)
    p.add_argument("--coordinator", type=str, default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args()

    if args.aggregate_only:
        print("wrote", aggregate(args.runs_path))
        return

    if args.coordinator:
        import jax

        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        if args.shard_id is None:
            args.shard_id = jax.process_index()
        if args.num_shards == 1:
            args.num_shards = jax.process_count()

    if args.spawn:
        spawn_local(args)
        if not args.no_aggregate:
            print("wrote", aggregate(args.runs_path))
        return

    if args.shard_id is None:
        args.shard_id = 0
    manifest = run_worker(args)
    print(json.dumps({k: manifest[k] for k in ("shard_id", "jobs",
                                               "failures")}))
    if args.coordinator:
        # shards finish at different times; without an explicit barrier
        # the early finisher's interpreter-exit shutdown barrier times
        # out waiting for the slow one (observed: DEADLINE_EXCEEDED at
        # Shutdown:: with 1/2 tasks). Sync BEFORE exiting, with a
        # sweep-scale timeout, then let process 0 aggregate the now
        # guaranteed-complete shard manifests.
        _workers_done_barrier()
        import jax

        if not args.no_aggregate and jax.process_index() == 0:
            print("wrote", aggregate(args.runs_path))
    elif (not args.no_aggregate and args.shard_id == 0
          and args.num_shards == 1):
        print("wrote", aggregate(args.runs_path))


def _workers_done_barrier(timeout_hours: float = 12.0) -> None:
    """Block until every jax.distributed process has finished its shard.

    Uses the coordination-service barrier (the same machinery the
    interpreter-exit shutdown barrier rides), falling back to
    ``sync_global_devices`` if the client handle moves."""
    try:
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier(
            "awesome_shard_workers_done",
            timeout_in_ms=int(timeout_hours * 3600 * 1000),
        )
    except AttributeError:  # client API moved: device-level sync
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("awesome_shard_workers_done")


if __name__ == "__main__":
    main()
