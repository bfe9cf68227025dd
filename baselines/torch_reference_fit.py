"""Measured reference baseline: the PyTorch per-image prior-fit loop.

Re-implements the *semantics* of the reference's sequential prior fit
(`awesome/model/path_connected_net.py:923-962` inner loop, architecture per
`awesome/model/net_factory.py:124-176` ``real_nvp_path_connected_net``)
faithfully in torch — serial, batch 1, one optimizer step per Python
iteration, host sync every step via ``loss.item()`` — and measures its
throughput on THIS host (torch CPU wheels; the reference's own hardware was
an unspecified single CUDA GPU, see BASELINE.md). The result is written to
``BASELINE_MEASURED.json`` at the repo root, which ``bench.py`` consumes to
report a *measured* ``vs_baseline`` instead of an estimate.

Fit-loop semantics reproduced (each item cited to the reference):
- 2000 Adamax steps per image, lr 1e-3 (`path_connected_net.py:756`).
- Optimizer param groups: flow parameters get weight_decay 1e-5, the
  translation + ICNN get 0 (`path_connected_net.py:913-918`).
- ReduceLROnPlateau(factor=0.5, patience=200) stepped on the loss
  (`path_connected_net.py:921,960`).
- loss = mean((sigmoid(prior(grid)) - unaries)^2): UnariesWeightedLoss
  mode 'none' over SE (`awesome/measures/unaries_weighted_loss.py:35`).
- Convexity projection (clip hidden weights to >= 0) AFTER every step
  (`path_connected_net.py:950-952`).
- Host sync every step: ``loss.item()`` for the plateau scheduler and the
  NaN check (`path_connected_net.py:944-949`).

Architecture (flagship joint-FBMS prior, identical shapes to bench.py):
translation (per-channel affine 1x1 conv equivalent) -> MinMax norm (fitted
on the normalized grid: identity) -> RealNVP with 12 masked affine
couplings (s/t MLPs C->32->C, tanh outputs, zero-init last layer) + ActNorm
-> ConvexNextNet ICNN (130 hidden, 2 hidden layers).

This file is a measurement harness, not part of the framework; nothing in
``awesome_tpu`` imports it.
"""
from __future__ import annotations

import argparse
import json
import os
import platform
import time

import numpy as np
import torch
import torch.nn as nn


# --------------------------------------------------------------------------
# Flagship architecture in torch (same op graph the reference trains)
# --------------------------------------------------------------------------


class CouplingMLP(nn.Module):
    """s/t backbone of one masked affine coupling: C->H->C, tanh output,
    zero-initialized final layer (normflows MLP(init_zeros=True))."""

    def __init__(self, channels: int, hidden: int):
        super().__init__()
        self.l1 = nn.Linear(channels, hidden)
        self.l2 = nn.Linear(hidden, channels)
        nn.init.zeros_(self.l2.weight)
        nn.init.zeros_(self.l2.bias)

    def forward(self, x):
        return torch.tanh(self.l2(torch.relu(self.l1(x))))


class RealNVPTorch(nn.Module):
    """Masked affine couplings + ActNorm, binary-counting masks."""

    def __init__(self, channels: int = 2, hidden: int = 32, n_flows: int = 12):
        super().__init__()
        vals = np.arange(1, 2**channels - 1, dtype=np.int64)
        bits = np.arange(channels)
        all_masks = ((vals[:, None] >> bits[None, :]) & 1).astype(np.float32)
        reps = int(np.ceil(n_flows / len(all_masks)))
        masks = np.tile(all_masks, (reps, 1))[:n_flows]
        self.register_buffer("masks", torch.from_numpy(masks))
        self.s = nn.ModuleList(CouplingMLP(channels, hidden) for _ in range(n_flows))
        self.t = nn.ModuleList(CouplingMLP(channels, hidden) for _ in range(n_flows))
        self.an_s = nn.Parameter(torch.zeros(n_flows, channels))
        self.an_t = nn.Parameter(torch.zeros(n_flows, channels))

    def forward(self, z):
        for i in range(len(self.s)):
            b = self.masks[i]
            zm = b * z
            s = self.s[i](zm)
            t = self.t[i](zm)
            z = zm + (1.0 - b) * (z * torch.exp(s) + t)
            z = z * torch.exp(self.an_s[i]) + self.an_t[i]
        return z


class ConvexNextTorch(nn.Module):
    """ICNN: input layer + N skip blocks + out block; clip keeps convexity."""

    def __init__(self, hidden: int = 130, layers: int = 2, in_feat: int = 2):
        super().__init__()
        self.inp = nn.Linear(in_feat, hidden)
        self.ln = nn.ModuleList(nn.Linear(hidden, hidden) for _ in range(layers))
        self.skp = nn.ModuleList(
            nn.Linear(in_feat, hidden, bias=False) for _ in range(layers)
        )
        self.out_ln = nn.Linear(hidden, 1)
        self.out_skp = nn.Linear(in_feat, 1, bias=False)

    def forward(self, x):
        h = torch.relu(self.inp(x))
        for ln, skp in zip(self.ln, self.skp):
            h = torch.relu(ln(h) + skp(x))
        return self.out_ln(h) + self.out_skp(x)

    @torch.no_grad()
    def enforce_convexity(self):
        for ln in self.ln:
            ln.weight.clamp_(min=0.0)
        self.out_ln.weight.clamp_(min=0.0)


class FlagshipPriorTorch(nn.Module):
    def __init__(self):
        super().__init__()
        self.trans_w = nn.Parameter(torch.ones(2))
        self.trans_b = nn.Parameter(torch.zeros(2))
        self.flow = RealNVPTorch(2, 32, 12)
        self.convex = ConvexNextTorch(130, 2, 2)

    def forward(self, x):
        # translation -> (MinMax norm on [0,1] grid == identity) -> flow -> ICNN
        x = x * self.trans_w + self.trans_b
        return self.convex(self.flow(x))


# --------------------------------------------------------------------------
# The reference fit loop (serial, batch 1, host sync per step)
# --------------------------------------------------------------------------


def fit_one_image(grid: torch.Tensor, unaries: torch.Tensor, steps: int,
                  seed: int) -> dict:
    torch.manual_seed(seed)
    model = FlagshipPriorTorch()
    flow_params = list(model.flow.parameters())
    flow_ids = {id(p) for p in flow_params}
    other = [p for p in model.parameters() if id(p) not in flow_ids]
    opt = torch.optim.Adamax(
        [
            {"params": flow_params, "weight_decay": 1e-5},
            {"params": other, "weight_decay": 0.0},
        ],
        lr=1e-3,
    )
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, factor=0.5, patience=200
    )
    t0 = time.perf_counter()
    last = 0.0
    for _ in range(steps):
        opt.zero_grad()
        out = torch.sigmoid(model(grid))
        loss = torch.mean((out - unaries) ** 2)
        loss.backward()
        opt.step()
        model.convex.enforce_convexity()
        last = loss.item()  # host sync every step, as the reference does
        if not np.isfinite(last):
            raise RuntimeError("NaN loss in reference fit")
        sched.step(last)
    dt = time.perf_counter() - t0
    return {"seconds": dt, "final_loss": last}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64, help="grid side (bench: 64)")
    ap.add_argument("--height", type=int, default=0,
                    help="grid height (overrides --size; pair with --width)")
    ap.add_argument("--width", type=int, default=0,
                    help="grid width (overrides --size)")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--images", type=int, default=2)
    ap.add_argument("--threads", type=int, default=0,
                    help="0 = torch default (all cores)")
    ap.add_argument("--out", type=str, default="BASELINE_MEASURED.json",
                    help="output JSON filename (relative to the repo root); "
                         "use a different name for non-bench shapes so the "
                         "64x64 bench baseline is not clobbered")
    args = ap.parse_args()
    if args.threads:
        torch.set_num_threads(args.threads)

    h = args.height or args.size
    w = args.width or args.size
    yy, xx = np.mgrid[0:h, 0:w]
    fg = (((yy - h / 2) ** 2 / (0.09 * h * h)
           + (xx - w / 2) ** 2 / (0.05 * w * w)) <= 1.0)
    unaries = torch.from_numpy(
        (1.0 - fg.astype(np.float32)).reshape(-1, 1)
    )
    gy, gx = np.meshgrid(
        np.linspace(0, 1, h, dtype=np.float32),
        np.linspace(0, 1, w, dtype=np.float32),
        indexing="ij",
    )
    grid = torch.from_numpy(np.stack([gy.ravel(), gx.ravel()], -1))

    runs = [
        fit_one_image(grid, unaries, args.steps, seed=i)
        for i in range(args.images)
    ]
    per_image = min(r["seconds"] for r in runs)  # best-of (least noisy)
    n_points = grid.shape[0]
    point_steps_per_sec = args.steps * n_points / per_image
    result = {
        "baseline": "torch reference fit loop (serial, batch 1, host-sync/step)",
        "hardware": f"torch-cpu {torch.__version__} on {platform.processor() or platform.machine()}, "
                    f"{os.cpu_count()} cores (reference's own GPU unavailable; zero egress)",
        "grid": [h, w],
        "steps_per_image": args.steps,
        "images_measured": args.images,
        "per_image_seconds": round(per_image, 3),
        "per_image_seconds_all_runs": [round(r["seconds"], 3) for r in runs],
        "point_steps_per_sec": round(point_steps_per_sec, 1),
        "final_losses": [round(r["final_loss"], 6) for r in runs],
        "spec": "awesome/model/path_connected_net.py:923-962",
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", args.out)
    with open(os.path.abspath(out_path), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
