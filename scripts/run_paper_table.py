#!/usr/bin/env python
"""Standing paper-table regression: the evaluation-notebook variant grid
on the synthetic convexity benchmark.

Reproduces the STRUCTURE of the reference's result tables
(`notebooks/evaluation.ipynb` cells 13/16: rows = segmentation model x
xytype x +/-prior, columns = last- and best-epoch metric selections) on
the synthetic convexity dataset (the real convexity-51 images need
downloads; zero-egress environment — BASELINE.md real-data anchors:
seg 0.906 / prior 0.908).

Grid: {Net, FCNet, CNNNet} x {xy, feat, featxy} x {prior, no-prior},
expanded through GridSearchRunner (the same machinery as the reference's
`awesome/run/grid_search_runner.py`), each cell trained + evaluated
through the full runner, then merged into ONE ResultComparison markdown
table (last + best epoch) written to --out. Per-cell floors are asserted
so this is a standing regression, not just a report.

Defaults are sized for a quick chip run (~12 images, 64x64, 800 epochs);
--n 51 --hw 96 --epochs 3000 reproduces the full-scale protocol of
PARITY.md round-3.

Standing chip invocation (hard benchmark + pinned per-cell floors):
    python scripts/run_paper_table.py \
        --cell-floors runs/paper_table/cell_floors.json
Regression demo (must FAIL: broken CNNNet under its floors, Net above):
    python scripts/run_paper_table.py --sabotage cnnnet \
        --cell-floors runs/paper_table/cell_floors.json
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=12)
    p.add_argument("--hw", type=int, default=64)
    p.add_argument("--epochs", type=int, default=800)
    p.add_argument("--out", default="runs/paper_table")
    p.add_argument("--hard", type=float, default=1.0,
                   help="benchmark hardness in [0,1] (data/synthetic.py: "
                        "textured bg, color-ambiguous distractors, noisy "
                        "scribbles) — 0 reproduces the saturated r3 "
                        "benchmark where every model family ties")
    p.add_argument("--hard-spread", action="store_true", default=True,
                   help="ramp per-image difficulty 0..hard across the "
                        "dataset (per-image difficulty spread)")
    p.add_argument("--no-hard-spread", dest="hard_spread",
                   action="store_false")
    p.add_argument("--eval-cadence", type=int, default=None,
                   help="compute the full eval-metric grid every N "
                        "epochs DURING training (default epochs//4) so "
                        "the best-epoch selection searches a real "
                        "multi-epoch series — with a single end-of-run "
                        "eval point 'best' degenerates to 'last' by "
                        "construction; 0 disables mid-training evals")
    p.add_argument("--sabotage", default=None,
                   help="deliberately break this model family's cells "
                        "(lr x 1e-4) to demonstrate the floors catch a "
                        "regression — the run must FAIL")
    p.add_argument("--floor", type=float, default=0.5,
                   help="per-cell segmentation MIOU floor")
    p.add_argument("--cell-floors", default=None,
                   help="JSON file of per-cell {name: {seg, prior}} "
                        "floors (overrides --floor; see "
                        "runs/paper_table/cell_floors.json)")
    p.add_argument("--prior-floor", type=float, default=0.5,
                   help="prior-output MIOU floor (prior cells)")
    p.add_argument("--prior-floor-feat", type=float, default=0.2,
                   help="prior floor for 'feat' cells: the prior fits in "
                        "SSS feature space there, and without the TF1 "
                        "embeddings (zero egress) the PCA proxy is weaker "
                        "- the reference's own feat rows are its largest "
                        "prior delta (notebooks/evaluation.ipynb)")
    p.add_argument("--models", nargs="*",
                   default=["net", "fcnet", "cnnnet"])
    p.add_argument("--xytypes", nargs="*", default=["xy", "feat", "featxy"])
    p.add_argument("--sss-proxy", default="spectral",
                   choices=["spectral", "spectral_device", "pyramid",
                            "sss_fused"],
                   help="SSS feature proxy for the 'feat'/'featxy' cells "
                        "(runner/sss_extractor.py; 'spectral_device' = "
                        "accelerator eigensolve, ops/spectral.py; "
                        "'sss_fused' = semantic-affinity fusion before "
                        "the eigendecomposition)")
    args = p.parse_args()

    from awesome_tpu.analytics.result_model import (
        ResultComparison,
        ResultModel,
    )
    from awesome_tpu.runner.config import AwesomeConfig
    from awesome_tpu.runner.runner import AwesomeRunner

    model_types = {
        "net": None,  # runner default Net (y,x,r,g,b pointwise MLP)
        "fcnet": "awesome_tpu.nn.seg.FCNet",
        "cnnnet": "awesome_tpu.nn.seg.CNNNet",
    }

    os.makedirs(args.out, exist_ok=True)
    run_dirs, failures = [], []
    cells = []
    for m in args.models:
        for xyt in args.xytypes:
            for use_prior in (True, False):
                cells.append((m, xyt, use_prior))
    for m, xyt, use_prior in cells:
        name = f"{m}+{xyt}+{'prior' if use_prior else 'noprior'}"
        dataset_args = {"n": args.n, "h": args.hw, "w": args.hw,
                        "xytype": xyt, "hard": args.hard,
                        "hard_spread": args.hard_spread}
        if xyt in ("feat", "featxy") and args.sss_proxy != "spectral":
            dataset_args["sss_proxy"] = args.sss_proxy
        # reference FCNET/CNNET benchmark widths
        # (`config/convexity/sequential/FCNET_benchmark+*.yaml`)
        seg_args = (
            {"width": 130, "depth": 2} if m == "fcnet" else {}
        )
        if m == "cnnnet":
            # conv net -> image mode ('3d'), like the reference's CNNET
            # benchmark configs (`config/convexity/sequential/CNNET_*`)
            dataset_args["dimension"] = "3d"
        cfg = AwesomeConfig(
            name_experiment=name,
            dataset_args=dataset_args,
            segmentation_model_type=model_types[m],
            segmentation_model_args=seg_args,
            prior_model_args={"n_hidden": 64, "n_hidden_layers": 1},
            use_prior_model=use_prior,
            optimizer_type="adam",
            optimizer_args={"lr": (0.02 if m != "cnnnet" else 1e-3)
                            * (1e-4 if m == args.sabotage else 1.0)},
            num_epochs=args.epochs,
            use_extra_penalty_hook=(m != "cnnnet"),
            extra_penalty_after_n_epochs=max(args.epochs - 200, 50),
            compute_metrics_during_training_nth_epoch=(
                args.eval_cadence if args.eval_cadence is not None
                else max(args.epochs // 4, 1)) or None,
            validation_each_nth_epoch=max(args.epochs // 4, 1),
            runs_path=args.out,
            seed=7,
        )
        try:
            r = AwesomeRunner(cfg)
            r.build()
            r.train()
            metrics = r.evaluate()
            out_dir = r.save_results()
            run_dirs.append(out_dir)
            miou = metrics.get("MeanForegroundBinaryMIOU", 0.0)
            print(f"{name}: MIOU {miou:.3f}", flush=True)
        except Exception as e:  # noqa: BLE001
            failures.append((name, repr(e)))
            print(f"{name}: FAILED {e!r}", flush=True)

    results = [ResultModel.from_path(d) for d in run_dirs]
    table_path = os.path.join(args.out, "paper_table.md")
    floors_report = {}
    with open(table_path, "w") as f:
        f.write("# Evaluation-grid table (synthetic convexity benchmark)\n"
                f"\nn={args.n} images {args.hw}x{args.hw}, "
                f"{args.epochs} epochs. Structure: "
                "notebooks/evaluation.ipynb cells 13/16.\n\n")
        for selection in ("last", "best"):
            f.write(f"## {selection}-epoch selection\n\n")
            t = ResultComparison(results).table(
                metric_names=["MeanForegroundBinaryMIOU",
                              "PriorMeanForegroundBinaryMIOU",
                              "MeanPixelAccuracy"],
                selection=selection,
            )
            f.write(t.to_markdown(index=False))
            f.write("\n\n")
    for r in results:
        m = r.metrics("eval", selection="best", maximize=True)
        # strip the timestamp prefix -> stable cell name
        cell = r.name.split("_", 2)[-1]
        floors_report[cell] = {
            "seg": m.get("MeanForegroundBinaryMIOU"),
            "prior": m.get("PriorMeanForegroundBinaryMIOU"),
        }
    with open(os.path.join(args.out, "floors.json"), "w") as f:
        json.dump({"cells": floors_report, "failures": failures}, f,
                  indent=2)
    # suggested per-cell floors for the NEXT pin: measured minus margin
    with open(os.path.join(args.out, "cell_floors_suggested.json"),
              "w") as f:
        json.dump({
            c: {k: (None if v is None else round(max(v - 0.06, 0.0), 3))
                for k, v in vv.items()}
            for c, vv in floors_report.items()
        }, f, indent=2)
    print("wrote", table_path)

    cell_floors = None
    if args.cell_floors:
        with open(args.cell_floors) as f:
            cell_floors = json.load(f)

    bad = []
    for n, v in floors_report.items():
        if cell_floors is not None and n in cell_floors:
            cf = cell_floors[n] or {}
            sf, pf = cf.get("seg"), cf.get("prior")
            if sf is not None and (v["seg"] is None or v["seg"] < sf):
                bad.append((n, "seg", v["seg"], f"floor {sf}"))
            if (pf is not None and "+prior" in n
                    and (v["prior"] is None or v["prior"] < pf)):
                bad.append((n, "prior", v["prior"], f"floor {pf}"))
            continue
        # a cell absent from the pinned floors file (grid drift, renamed
        # or newly added cell) still gets the global-floor gate — never
        # silently unchecked
        if v["seg"] is None or v["seg"] < args.floor:
            bad.append((n, "seg", v["seg"], f"floor {args.floor}"))
        if "+prior" in n:
            pf = (args.prior_floor_feat if "+feat+" in n
                  else args.prior_floor)
            if v["prior"] is None or v["prior"] < pf:
                bad.append((n, "prior", v["prior"], f"floor {pf}"))
    if failures or bad:
        raise SystemExit(f"paper-table regression: failures={failures} "
                         f"below-floor={bad}")


if __name__ == "__main__":
    main()
