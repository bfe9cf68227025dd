#!/usr/bin/env python
"""How-To: Read Results — the analytics-layer demo.

Script equivalent of the reference's third how-to notebook
(`notebooks/how_to/read_results.ipynb`): run (or point at) experiments,
load each run dir through ``ResultModel``, list the tracked metrics,
read their per-epoch curves, and compare runs with ``ResultComparison``
(table + line/bar charts) — exactly the notebook's cells 2-11.

With no arguments, two tiny synthetic convexity runs are trained first
so the script is self-contained; pass --runs <dir> to read any existing
runs folder (e.g. the output of scripts/run.py or run_fbms_table.py).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_demo_runs(out: str, epochs: int):
    """Two short runs differing only in prior width — something for the
    comparison to compare (the notebook assumes archived runs exist)."""
    from awesome_tpu.runner.config import AwesomeConfig
    from awesome_tpu.runner.runner import AwesomeRunner

    dirs = []
    for name, width in (("narrow", 12), ("wide", 32)):
        cfg = AwesomeConfig(
            name_experiment=name,
            dataset_args={"n": 2, "h": 32, "w": 32},
            segmentation_model_args={"n_hidden": 16},
            prior_model_args={"n_hidden": width, "n_hidden_layers": 1},
            optimizer_args={"lr": 0.02},
            num_epochs=epochs,
            runs_path=out,
            seed=1,
        )
        r = AwesomeRunner(cfg)
        r.build()
        r.train()
        r.evaluate()
        dirs.append(r.save_results())
    return dirs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--runs", type=str, default=None,
                   help="existing runs folder; default trains two demo runs")
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--out", type=str, default=".")
    args = p.parse_args()

    from awesome_tpu.analytics import ResultComparison, ResultModel

    runs_dir = args.runs
    if runs_dir is None:
        runs_dir = os.path.join(args.out, "demo_runs")
        print(f"training two demo runs into {runs_dir} ...")
        make_demo_runs(runs_dir, args.epochs)

    # --- notebook cell 2: load one run ---
    results = ResultModel.scan_result_directory(runs_dir)
    if not results:
        raise SystemExit(f"no run dirs found under {runs_dir}")
    result_model = results[0]
    print(f"\nloaded {len(results)} run(s); first: {result_model.name}")

    # --- cell 4: the tracked metrics ---
    names = result_model.get_tracked_metrics()
    print("tracked metrics:", ", ".join(names))

    # --- cell 5: per-epoch values of the MIOU series ---
    for name in [n for n in names if "miou" in n.lower()]:
        series = result_model.metric_series(name)
        if series:
            epochs, values = series
            print(f"{name}: epochs {epochs} -> "
                  + ", ".join(f"{v:.4f}" for v in values))

    # --- cells 7-11: compare runs ---
    comp = ResultComparison(results)
    metric = "MeanForegroundBinaryMIOU"
    print("\ncomparison table:\n")
    print(comp.to_markdown())

    fig = comp.plot_metric(metric)
    line_png = os.path.join(args.out, "metric_curve.png")
    fig.savefig(line_png, dpi=110)
    fig2 = comp.plot_metric_bar(metric)
    bar_png = os.path.join(args.out, "metric_bar.png")
    fig2.savefig(bar_png, dpi=110)
    print(f"\nplots -> {line_png}, {bar_png}")

    best = comp.best(metric)
    print(f"best run by {metric}: {best.name}: "
          f"{best.metric(metric):.4f}")


if __name__ == "__main__":
    main()
