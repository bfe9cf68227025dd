#!/usr/bin/env python
"""Dataset / checkpoint setup with idempotent done-markers.

Behavior port of the reference's setup flow (`scripts/setup.py:1-60`,
`awesome/util/setup_config.py:15-51`, done-markers
`awesome/util/done_file_marker.py`): download archives, unzip into the
expected layout, and mark completed steps so reruns are no-ops. Network
access is environment-dependent (this build environment has zero egress);
every step is skipped gracefully with a clear message when offline, and
``--synthetic`` materializes a synthetic convexity benchmark instead so
the full pipeline runs without downloads.
"""
import argparse
import os
import sys
import urllib.request
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATASETS = {
    "convexity": {
        "url": "https://download.example/convexity_dataset.zip",
        "target": "data/datasets/convexity_dataset",
    },
    "fbms": {
        "url": "https://download.example/fbms59.zip",
        "target": "data/datasets/fbms",
    },
}


def done_marker(path: str) -> str:
    return os.path.join(path, ".done")


def is_done(path: str) -> bool:
    return os.path.exists(done_marker(path))


def mark_done(path: str) -> None:
    os.makedirs(path, exist_ok=True)
    open(done_marker(path), "w").close()


def download_and_extract(name: str, spec: dict) -> bool:
    target = spec["target"]
    if is_done(target):
        print(f"[setup] {name}: already done ({target})")
        return True
    os.makedirs(target, exist_ok=True)
    archive = os.path.join(target, f"{name}.zip")
    try:
        print(f"[setup] {name}: downloading {spec['url']} ...")
        urllib.request.urlretrieve(spec["url"], archive)
    except Exception as e:
        print(f"[setup] {name}: download unavailable ({e}); skipping. "
              f"Use --synthetic for an offline benchmark.")
        return False
    with zipfile.ZipFile(archive) as z:
        z.extractall(target)
    os.remove(archive)
    mark_done(target)
    print(f"[setup] {name}: done -> {target}")
    return True


def make_synthetic(target: str, n: int, h: int, w: int) -> None:
    if is_done(target):
        print(f"[setup] synthetic: already done ({target})")
        return
    import numpy as np
    from PIL import Image

    from awesome_tpu.data.synthetic import synthetic_convexity_dataset

    for sub in ("img", "ground_truth", "user_scribbles"):
        os.makedirs(os.path.join(target, sub), exist_ok=True)
    for i, s in enumerate(synthetic_convexity_dataset(n=n, h=h, w=w), 1):
        Image.fromarray((s.image * 255).astype(np.uint8)).save(
            os.path.join(target, "img", f"img_{i}.png")
        )
        Image.fromarray(((1 - s.gt) * 255).astype(np.uint8)).save(
            os.path.join(target, "ground_truth", f"GT_{i}.png")
        )
        scr = np.zeros(s.gt.shape, np.uint8)
        scr[s.bg_mask] = 128
        scr[s.fg_mask] = 255
        Image.fromarray(scr).save(
            os.path.join(target, "user_scribbles", f"scribbleMask_{i}.png")
        )
    mark_done(target)
    print(f"[setup] synthetic: {n} images -> {target}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--datasets", nargs="*", default=list(DATASETS))
    p.add_argument("--synthetic", action="store_true",
                   help="generate a synthetic convexity benchmark")
    p.add_argument("--synthetic-n", type=int, default=16)
    p.add_argument("--synthetic-size", type=int, default=128)
    p.add_argument("--target", type=str,
                   default="data/datasets/synthetic_convexity")
    args = p.parse_args()
    if args.synthetic:
        make_synthetic(args.target, args.synthetic_n, args.synthetic_size,
                       args.synthetic_size)
        return
    for name in args.datasets:
        download_and_extract(name, DATASETS[name])


if __name__ == "__main__":
    main()
