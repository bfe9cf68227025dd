#!/usr/bin/env python
"""Run/serialize many configs from a directory (spec: reference
`scripts/run_multi_config.py:32-60`)."""
import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from awesome_tpu.runner.multi import MultiConfigRunner, shard_jobs

    p = argparse.ArgumentParser()
    p.add_argument("--config-dir", type=str, required=True)
    p.add_argument("--serial", action="store_true")
    p.add_argument("--shards", type=int, default=1)
    p.add_argument("--shard-id", type=int, default=0)
    args = p.parse_args()

    runner = MultiConfigRunner(args.config_dir)
    jobs = shard_jobs(runner.create_jobs(), args.shards, args.shard_id)
    if args.serial:
        for script, argv in jobs:
            subprocess.run([sys.executable, script, *argv], check=True)
    else:
        for script, argv in jobs:
            print(script, " ".join(argv))


if __name__ == "__main__":
    main()
