#!/usr/bin/env python
"""Grid-search fan-out (spec: reference `scripts/run_grid_search.py:32-60`).

    python scripts/run_grid_search.py --config-path base.yaml \
        --grid '{optimizer_args.lr: [0.01, 0.02], num_epochs: [100, 300]}' \
        [--serial | --job-file out/JobFile.py] [--shards N --shard-id I]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import yaml

    from awesome_tpu.runner.config import AwesomeConfig
    from awesome_tpu.runner.multi import GridSearchRunner, shard_jobs

    p = argparse.ArgumentParser()
    p.add_argument("--config-path", type=str, default=None)
    p.add_argument("--grid", type=str, required=True)
    p.add_argument("--output-dir", type=str, default="./grid")
    p.add_argument("--serial", action="store_true")
    p.add_argument("--job-file", type=str, default=None)
    p.add_argument("--shards", type=int, default=1)
    p.add_argument("--shard-id", type=int, default=0)
    args = p.parse_args()

    base = (
        AwesomeConfig.load(args.config_path)
        if args.config_path
        else AwesomeConfig()
    )
    base.prepare()
    grid = yaml.safe_load(args.grid)
    runner = GridSearchRunner(base, grid, output_dir=args.output_dir)
    runner.build()
    if args.serial:
        results = runner.run_serial()
        for i, m in enumerate(results):
            print(i, m)
    else:
        path = runner.create_job_file(args.job_file)
        jobs = runner.create_jobs()
        mine = shard_jobs(jobs, args.shards, args.shard_id)
        print(f"wrote {path} ({len(jobs)} jobs, {len(mine)} in this shard)")


if __name__ == "__main__":
    main()
