#!/usr/bin/env python
"""Repeating-teaser deficit decomposition (VERDICT r4 weak #3 follow-up).

Replays the exact protocol of ``runner/teaser.py:run_repeating`` (spec
`/root/reference/notebooks/icml_teaser_code/repeating/repeating.ipynb`)
but keeps the PER-RESTART logits, then quantifies where the IoU deficit
against the shipped mask lives:

- per-restart raw + phase-aligned IoU at the notebook's -5 logit contour
- status-quo ensemble (mean logits over loss-valid restarts)
- majority vote of per-restart -5 masks
- phase-aligned ensemble: align restarts to the best-tail restart by
  mask cross-correlation over one lattice period (model-side only, no
  reference-mask peeking), then mean logits
- oracle threshold sweep on the ensemble (diagnostic ONLY — peeks at the
  reference mask; never used for the standing score)
- shipped-mask anti-alias ambiguity (binarize at 64/127/192)

Writes runs/teasers/repeating_decomposition.json. Runs on either
backend; the sampled-SGD draws are chaotic, so CPU/TPU replicas differ
by less than the seed spread (~0.3 IoU across single draws).
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--n-restarts", type=int, default=8)
    p.add_argument("--steps-scale", type=float, default=1.0)
    p.add_argument("--out", default="runs/teasers/repeating_decomposition.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from awesome_tpu.nn.priors_extra import PeriodicNet
    from awesome_tpu.runner.teaser import (
        TEASER_DIR,
        _axis_period,
        _scaled,
        _shifted_iou,
        centered_points,
        load_mask,
        mask_iou,
        minibatch_fit,
        phase_aligned_iou,
    )

    naive = load_mask(os.path.join(TEASER_DIR, "repeating", "original",
                                   "mask_naive.png"))
    h, w = naive.shape
    im = Image.fromarray(naive.astype(np.uint8) * 255)
    im = im.resize((w // 2, h // 2), Image.NEAREST)
    naive_fit = np.asarray(im) > 127
    fh, fw = naive_fit.shape
    target_np = naive_fit.astype(np.float32)

    flat = np.asarray(centered_points(fh, fw))
    model = PeriodicNet(n_hidden=200, use_premap=False)
    pts0 = jnp.asarray(flat[target_np.reshape(-1) < 0.5])
    pts1 = jnp.asarray(flat[target_np.reshape(-1) >= 0.5])
    pts_full = centered_points(h, w)

    logit_stack, tails = [], []
    for s in range(args.seed, args.seed + args.n_restarts):
        params = model.init(jax.random.PRNGKey(s))
        fitted, hist = minibatch_fit(
            model, params, pts0=pts0, pts1=pts1,
            steps=_scaled(10000, args.steps_scale), n_sample=500,
            lr=1e-2, loss="se", coef0=2.0, coef1=1.0, seed=s)
        tails.append(float(jnp.mean(hist[-max(hist.shape[0] // 20, 1):])))
        logit_stack.append(np.asarray(model.apply(fitted, pts_full))
                           .reshape(h, w))
        print(f"restart {s}: tail {tails[-1]:.4f}", flush=True)

    ref = load_mask(os.path.join(TEASER_DIR, "repeating", "original",
                                 "mask.png"))
    tails_a = np.asarray(tails)
    valid = np.isfinite(tails_a) & (tails_a <= 1.5 * np.nanmin(tails_a))
    stack = np.asarray(logit_stack)
    out = {"tails": tails, "valid": valid.tolist()}

    per = []
    for i in range(args.n_restarts):
        m = stack[i] > -5.0
        pa, sh = phase_aligned_iou(m, ref)
        per.append({"iou": round(mask_iou(m, ref), 4),
                    "pa_iou": round(pa, 4), "shift": list(sh),
                    "valid": bool(valid[i])})
    out["per_restart"] = per

    ens = stack[valid].mean(0)
    m_sq = ens > -5.0
    pa_sq, sh_sq = phase_aligned_iou(m_sq, ref)
    out["ensemble_status_quo"] = {"iou": round(mask_iou(m_sq, ref), 4),
                                  "pa_iou": round(pa_sq, 4),
                                  "shift": list(sh_sq)}

    votes = (stack[valid] > -5.0).mean(0) > 0.5
    pa_v, _ = phase_aligned_iou(votes, ref)
    out["majority_vote"] = {"iou": round(mask_iou(votes, ref), 4),
                            "pa_iou": round(pa_v, 4)}

    # model-side phase alignment (no reference involved): roll each valid
    # restart onto the best-tail restart's lattice before averaging
    vidx = np.where(valid)[0]
    anchor = vidx[int(np.argmin(tails_a[vidx]))]
    am = stack[anchor] > -5.0
    py, px = _axis_period(am, 0), _axis_period(am, 1)
    aligned, shifts = [], []
    for i in vidx:
        mi = stack[i] > -5.0
        best, arg = -1.0, (0, 0)
        for dy in range(-(py // 2), py // 2 + 1):
            for dx in range(-(px // 2), px // 2 + 1):
                v = _shifted_iou(mi, am, dy, dx)
                if v > best:
                    best, arg = v, (dy, dx)
        shifts.append([int(arg[0]), int(arg[1])])
        aligned.append(np.roll(stack[i], arg, axis=(0, 1)))
    ens_al = np.mean(aligned, 0)
    m_al = ens_al > -5.0
    pa_al, sh_al = phase_aligned_iou(m_al, ref)
    out["phase_aligned_ensemble"] = {
        "iou": round(mask_iou(m_al, ref), 4), "pa_iou": round(pa_al, 4),
        "shift": list(sh_al), "restart_shifts": shifts,
        "anchor": int(anchor), "period_yx": [int(py), int(px)],
    }

    best_t, best_v = None, -1.0
    for t in np.linspace(-10, 3, 53):
        v = mask_iou(ens > t, ref)
        if v > best_v:
            best_v, best_t = v, float(t)
    bt_al, bv_al = max(((float(t), mask_iou(ens_al > t, ref))
                        for t in np.linspace(-10, 3, 53)),
                       key=lambda tv: tv[1])
    out["oracle_threshold"] = {
        "status_quo": {"t": round(best_t, 2), "iou": round(best_v, 4)},
        "phase_aligned_ens": {"t": round(bt_al, 2), "iou": round(bv_al, 4)},
    }

    raw = np.asarray(Image.open(os.path.join(
        TEASER_DIR, "repeating", "original", "mask.png")).convert("L"))
    for thr in (64, 127, 192):
        out[f"ref_thr_{thr}"] = round(mask_iou(m_sq, raw > thr), 4)

    print(json.dumps(out, indent=1))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
