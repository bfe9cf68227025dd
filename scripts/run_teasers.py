#!/usr/bin/env python
"""Run the real-image parity harness (awesome_tpu/runner/teaser.py) at the
reference protocols' full step counts and record IoU vs the reference's
own shipped result masks.

Writes runs/teasers/results.json plus produced/reference mask PNGs for
visual auditing. Intended for the real TPU (one process at a time!); the
reduced-step CPU variant lives in tests/test_reference_images.py.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--names", nargs="*", default=None)
    p.add_argument("--steps-scale", type=float, default=1.0)
    p.add_argument("--out", default="runs/teasers")
    args = p.parse_args()

    import numpy as np
    from PIL import Image

    from awesome_tpu.runner import teaser as T

    if not T.reference_data_available():
        print("reference data not found; nothing to do")
        return

    os.makedirs(args.out, exist_ok=True)
    # merge into prior results so partial (--names) runs don't drop the
    # other protocols' recorded numbers
    results_path = os.path.join(args.out, "results.json")
    results = {}
    if os.path.exists(results_path):
        with open(results_path) as f:
            results = json.load(f)
    for name in (args.names or T.TEASERS):
        t0 = time.time()
        try:
            r = T.TEASERS[name](steps_scale=args.steps_scale)
        except Exception as e:  # keep going; record the failure
            results[name] = {"error": repr(e)}
            print(f"{name}: FAILED {e!r}")
            continue
        dt = time.time() - t0
        results[name] = {"iou": round(r.iou, 4),
                         "seconds": round(dt, 1), **{
                             k: v for k, v in r.extra.items()
                             if isinstance(v, (int, float, list, str))
                         }}
        print(f"{name}: IoU {r.iou:.4f}  ({dt:.1f}s)  {r.extra}")
        mask = np.asarray(r.mask)
        ref = np.asarray(r.ref_mask)
        if mask.ndim == 2:
            mask, ref = mask[None], ref[None]
        for i in range(mask.shape[0]):
            sfx = f"_{i}" if mask.shape[0] > 1 else ""
            Image.fromarray((mask[i] * 255).astype(np.uint8)).save(
                os.path.join(args.out, f"{name}{sfx}_ours.png"))
            Image.fromarray((ref[i] * 255).astype(np.uint8)).save(
                os.path.join(args.out, f"{name}{sfx}_ref.png"))

    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
