#!/usr/bin/env python
"""FBMS Sequential-vs-Joint evaluation table (fbms_eval_icml.ipynb).

Replays the ICML FBMS evaluation pipeline end-to-end on the synthetic
FBMS replica (FBMS-59 needs downloads; zero-egress environment):

1. run the reference's own joint YAMLs (the cars3 flagship across its
   three shipped seed variants) — per-frame prior pretrain, then joint
   UNet+prior training with an epoch-0 baseline eval recorded (the
   notebook's `index_mapping {0: Baseline, 15: Joint}`) and CRF-refined
   metrics at every eval tick (`compute_crf_with_metrics`),
2. persist each run in the ResultModel on-disk layout
   (`FBMSRunner.save_joint_results`),
3. reload ALL runs through the analytics layer (`ResultModel` /
   `ResultComparison`) and emit the summarized Sequential/Joint table —
   IoU / Prior IoU / Acc. / Prior Acc. / CRF IoU / CRF Acc., seed-mean —
   as markdown + styled LaTeX (`latex_postprocessor`).

Spec: `notebooks/fbms_eval_icml.ipynb` cells 1-8 (ResultModel scan,
metric tags `eval/epoch/Mean*`, seed grouping, the summarized
Sequential-vs-Joint frame). Asserts the paper's headline direction
(joint training does not hurt; all metrics in range) so this is a
standing regression.

Defaults are sized for a quick chip run; --epochs 15 --pretrain-steps
2000 reproduces the YAML's full budgets.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

JOINT_DIR = "/root/reference/config/path-connectedness/joint"
SEED_YAMLS = [
    "UNET+cars3+edge+diffeo+original+joint.yaml",
    "UNET+cars3+edge+diffeo+original+joint+seed47.yaml",
    "UNET+cars3+edge+diffeo+original+joint+seed131.yaml",
]

# tracker metric -> notebook display column
# (`notebooks/fbms_eval_icml.ipynb` cell 2 col_mapping)
COLS = {
    "MeanForegroundBinaryMIOU": "IoU",
    "PriorMeanForegroundBinaryMIOU": "Prior IoU",
    "MeanPixelAccuracy": "Acc.",
    "PriorMeanPixelAccuracy": "Prior Acc.",
    "CRFMeanForegroundBinaryMIOU": "CRF IoU",
    "CRFMeanPixelAccuracy": "CRF Acc.",
}


def run_one(yaml_name: str, seq: str, runs_root: str, args) -> str:
    from awesome_tpu.runner.fbms_runner import FBMSRunner
    from awesome_tpu.runner.reference_import import load_reference_config

    cfg, extra = load_reference_config(os.path.join(JOINT_DIR, yaml_name))
    if extra:
        raise RuntimeError(f"unmapped reference fields: {sorted(extra)}")
    tag = yaml_name.replace(".yaml", "")
    cfg.runs_path = runs_root
    cfg.compute_crf_with_metrics = True
    cfg.compute_metrics_during_training_nth_epoch = max(
        1, args.epochs // 3)
    cfg.pretrain_state_path = os.path.join(runs_root, f"pretrain_{tag}")
    # the YAML's zoo_folder is the relative ./data/zoo — keep the cache
    # (warm prefits across the three seed runs) but inside the run dir
    pa = dict(cfg.pretrain_args or {})
    if isinstance(pa.get("zoo"), dict):
        pa["zoo"] = {"zoo_folder": os.path.join(runs_root, "zoo")}
        cfg.pretrain_args = pa
    runner = FBMSRunner.from_awesome_config(cfg, dataset_path=seq)
    runner.build()
    runner.run_pretrain_only_from_config(
        num_steps=args.pretrain_steps,
        reuse_state_steps=args.reuse_steps,
        prefit_flow_identity_steps=args.prefit_steps,
        prefit_convex_steps=args.prefit_steps,
    )
    runner.train_joint_from_config(num_epochs=args.epochs,
                                   eval_epoch0=True)
    return runner.save_joint_results(os.path.join(runs_root, tag))


def assemble_table(run_dirs, out_dir: str):
    import pandas as pd

    from awesome_tpu.analytics.result_model import ResultModel
    from awesome_tpu.utils.format import latex_postprocessor

    rows = []
    for d in run_dirs:
        m = ResultModel.from_path(d)
        row = {"run": m.name,
               "seed": m.config.seed if m.config else None}
        for name, label in COLS.items():
            row[f"{label} Baseline"] = m.metric_at_epoch(name, 0)
            row[f"{label} Joint"] = m.metric(name, selection="last")
        rows.append(row)
    df = pd.DataFrame(rows)

    # the notebook's summarized frame: seed-mean, rows Sequential/Joint
    # (cell 8 renames Baseline -> Sequential)
    order = [c for c in COLS.values()
             if df[f"{c} Baseline"].notna().any()]
    summary = pd.DataFrame(index=["Sequential", "Joint"], columns=order,
                           dtype=float)
    for c in order:
        summary.loc["Sequential", c] = df[f"{c} Baseline"].mean()
        summary.loc["Joint", c] = df[f"{c} Joint"].mean()

    os.makedirs(out_dir, exist_ok=True)
    md = ("# FBMS Sequential vs Joint (fbms_eval_icml replay)\n\n"
          "Per-run (one row per reference seed YAML):\n\n"
          + df.to_markdown(index=False, floatfmt=".4f")
          + "\n\nSummarized (seed mean — the notebook's cell-8 frame):\n\n"
          + summary.to_markdown(floatfmt=".4f") + "\n")
    with open(os.path.join(out_dir, "fbms_table.md"), "w") as f:
        f.write(md)
    with open(os.path.join(out_dir, "fbms_table.tex"), "w") as f:
        f.write(latex_postprocessor(summary.to_latex(float_format="%.4f")))
    return df, summary


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--pretrain-steps", type=int, default=300)
    p.add_argument("--reuse-steps", type=int, default=100)
    p.add_argument("--prefit-steps", type=int, default=50)
    p.add_argument("--n-frames", type=int, default=8)
    p.add_argument("--hw", type=int, nargs=2, default=(48, 64))
    p.add_argument("--out", default="runs/fbms_table")
    args = p.parse_args()

    import tempfile

    from build_all_configs import write_sequence

    os.makedirs(args.out, exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        seq = write_sequence(tmp, n_frames=args.n_frames,
                             h=args.hw[0], w=args.hw[1])
        run_dirs = [
            run_one(y, seq, os.path.join(args.out, "runs"), args)
            for y in SEED_YAMLS
        ]
    df, summary = assemble_table(run_dirs, args.out)
    print(summary.to_markdown(floatfmt=".4f"))

    # standing assertions: everything in range; joint training did not
    # degrade the segmentation (the paper's headline direction)
    vals = summary.values.astype(float)
    assert ((vals >= 0.0) & (vals <= 1.0)).all(), vals
    assert (summary.loc["Joint", "IoU"]
            >= summary.loc["Sequential", "IoU"] - 0.02), summary
    report = {"per_run": df.to_dict("records"),
              "summary": summary.to_dict()}
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2, default=str)
    print(f"table -> {args.out}/fbms_table.md")


if __name__ == "__main__":
    main()
