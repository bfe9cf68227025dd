"""Benchmark: coord-point-steps/s/chip on the flagship prior fit.

Measures the fully-compiled batched prior fit (the framework's hot loop and
the paper's dominant cost): B images x S Adamax steps over an HxW
coordinate grid through the flagship path-connected prior (RealNVP 12
flows + ConvexNextNet ICNN), including ReduceLROnPlateau, NaN guard and
convexity projection — i.e. exactly what the reference does serially in
Python (`awesome/model/path_connected_net.py:730-1008`, 2000 steps/image,
batch 1, host sync every step).

vs_baseline: MEASURED — ``baselines/torch_reference_fit.py`` runs the
reference's own fit loop (torch, serial, batch 1, host-sync per step,
faithful to `awesome/model/path_connected_net.py:923-962`) on this host at
identical shapes and records the result in ``BASELINE_MEASURED.json``;
vs_baseline = our point-steps/s divided by that measured number. The
reference's original hardware (an unspecified CUDA GPU; zero egress here)
is additionally covered by the conservative estimate
``BASELINE_EST_GPU_POINT_STEPS_PER_SEC`` (~150 small kernel launches per
step + per-step host sync => ~3ms/step at 154k grid points => ~5.1e7
point-steps/s), reported as ``vs_baseline_estimated_gpu``.

Prints ONE JSON line.
"""
import json
import os
import sys
import time

import numpy as np


BASELINE_EST_GPU_POINT_STEPS_PER_SEC = 5.1e7  # estimated reference GPU
# estimated reference per-image wall-clock on a modern GPU at ANY
# resolution: the loop is launch-bound (~150 kernel launches + a host
# sync per step => ~3 ms/step), so 2000 steps ≈ 6 s/image regardless of
# grid size (BASELINE.md)
BASELINE_EST_GPU_PER_IMAGE_SECONDS = 6.0
# TPU v5e peak: 197 TFLOP/s bf16 MXU; f32 runs at ~1/4 of that
F32_PEAK_FLOPS = 197e12 / 4.0


def _matmul_flops_per_point_step(params) -> float:
    """Analytic matmul FLOPs per coordinate point per optimizer step for a
    pointwise model: every >=2D weight leaf is applied exactly once per
    point per forward (2 FLOPs/MAC), and fwd+bwd costs ~3 forwards (dx and
    dW matmuls each match the forward's shape)."""
    import jax

    elems = sum(
        leaf.size for leaf in jax.tree_util.tree_leaves(params)
        if hasattr(leaf, "ndim") and leaf.ndim >= 2
    )
    return 6.0 * elems


def _measured_baseline():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    try:
        with open(path) as f:
            data = json.load(f)
        return float(data["point_steps_per_sec"]), data
    except (OSError, KeyError, ValueError):
        return None, None


def _measured_baseline_fullres():
    """Measured torch rate at the FULL-RES shape (480x640), if recorded.

    Produced by ``baselines/torch_reference_fit.py --height 480 --width 640
    --steps N --out BASELINE_MEASURED_FULLRES.json`` (N < 2000 is fine: the
    recorded ``point_steps_per_sec`` rate is the honest scalar; the
    2000-step wall-clock is extrapolated from it and labeled as such)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED_FULLRES.json")
    try:
        with open(path) as f:
            data = json.load(f)
        return float(data["point_steps_per_sec"]), data
    except (OSError, KeyError, ValueError):
        return None, None


def _wait_for_backend(max_wait_s: float = 3600.0) -> None:
    """Retry backend init through transient tunnel outages.

    The remote-TPU tunnel has two observed outage flavors: the first
    device op raises UNAVAILABLE, or it HANGS indefinitely waiting for
    the chip grant. A bench run launched in that window should wait the
    outage out (bounded) rather than record a spurious failure or hang
    forever — so the first ``jax.devices()`` runs on a daemon thread
    with a deadline (backend init is process-global, so the main thread
    can use it afterwards)."""
    import threading

    import jax

    deadline = time.time() + max_wait_s
    state: dict = {}

    def _init():
        while True:
            try:
                jax.devices()
                state["ok"] = True
                return
            except Exception as e:  # noqa: BLE001 — any non-retryable
                # error must reach the main thread, not die in the
                # thread excepthook and masquerade as a grant timeout
                retryable = (isinstance(e, RuntimeError)
                             and "UNAVAILABLE" in str(e))
                if not retryable or time.time() > deadline:
                    state["err"] = e
                    return
                print(f"backend unavailable ({e}); retrying in 30 s",
                      file=sys.stderr)
                time.sleep(30.0)

    t = threading.Thread(target=_init, daemon=True)
    t.start()
    t.join(timeout=max_wait_s)
    if state.get("ok"):
        return
    if "err" in state:
        raise state["err"]
    raise RuntimeError(
        f"TPU backend grant not issued within {max_wait_s:.0f} s "
        "(tunnel outage?); giving up cleanly")


def main():
    import jax
    import jax.numpy as jnp

    from awesome_tpu.core import grids as G
    from awesome_tpu.fit import FitConfig
    from awesome_tpu.fit.prior_fit import make_fit_fn
    from awesome_tpu.nn.path_connected import real_nvp_path_connected_net

    _wait_for_backend()

    # Shapes chosen to keep the remote-compile path reliable on the
    # tunneled chip (128x128 programs have been observed to wedge the
    # remote compile service); 8 x 2000-step fits on a 64x64 grid is the
    # validated configuration.
    h = w = 64
    batch = 8
    steps = 2000

    yy, xx = np.mgrid[0:h, 0:w]
    fg = (((yy - h / 2) ** 2 / (0.09 * h * h)
           + (xx - w / 2) ** 2 / (0.05 * w * w)) <= 1.0)
    unaries = 1.0 - fg.astype(np.float32)
    points = G.flatten_grid(G.pixel_grid((h, w)))
    target = jnp.asarray(unaries).reshape(-1, 1)
    targets = jnp.stack([target] * batch)

    model = real_nvp_path_connected_net(
        channels=2, hidden_units=32, flow_n_flows=12, flow_output_fn="tanh",
        spatial_shape=(h, w), convex_net_hidden_units=130,
        convex_net_hidden_layers=2,
    )
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    stacked = jax.vmap(model.init)(keys)

    # tanh-bounded flow: loss-only NaN guard suffices (the reference has
    # no guard at all, so this is still strictly more robust than parity)
    cfg = FitConfig(num_steps=steps, lr=1e-3, unroll=8,
                    nan_guard_grads=False)
    fit = make_fit_fn(model, cfg)
    vfit = jax.jit(jax.vmap(fit, in_axes=(0, None, 0)))

    # warmup/compile
    fitted, aux = vfit(stacked, points, targets)
    jax.block_until_ready(fitted)

    # best of 3: the tunneled chip shows ~10% run-to-run variance
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        fitted, aux = vfit(stacked, points, targets)
        jax.block_until_ready(fitted)
        dt = min(dt, time.time() - t0)

    assert bool(np.isfinite(np.asarray(aux["loss_hist"])).all()), "NaN in fit"
    point_steps = batch * steps * points.shape[0]
    value = point_steps / dt

    # single-image fit latency via the fused Pallas step (1.9x the XLA
    # path for batch-1; the reference's own protocol is per-image serial)
    fused_cfg = FitConfig(num_steps=steps, lr=1e-3, nan_guard_grads=False,
                          fused=True)
    ffit = jax.jit(make_fit_fn(model, fused_cfg))
    fparams = model.init(jax.random.PRNGKey(1))
    out = ffit(fparams, points, target)
    jax.block_until_ready(out)
    fdt = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = ffit(fparams, points, target)
        jax.block_until_ready(out)
        fdt = min(fdt, time.time() - t0)

    # FULL-RESOLUTION per-image fit (the real protocol: convexity-51 /
    # FBMS images are 240x320..480x640, where the reference loop needs
    # minutes-to-hours) — fused single-image fit at 480x640, validated
    # compile envelope (PARITY.md: compiles in ~16 s, fits in ~10 s)
    fh, fw = 480, 640
    fyy, fxx = np.mgrid[0:fh, 0:fw]
    ffg = (((fyy - fh / 2) ** 2 / (0.09 * fh * fh)
            + (fxx - fw / 2) ** 2 / (0.05 * fw * fw)) <= 1.0)
    fpoints = G.flatten_grid(G.pixel_grid((fh, fw)))
    ftarget = jnp.asarray(1.0 - ffg.astype(np.float32)).reshape(-1, 1)
    frfit = jax.jit(make_fit_fn(model, fused_cfg))
    frparams = model.init(jax.random.PRNGKey(2))
    frout = frfit(frparams, fpoints, ftarget)
    jax.block_until_ready(frout)
    frdt = float("inf")
    for _ in range(3):
        t0 = time.time()
        frout = frfit(frparams, fpoints, ftarget)
        jax.block_until_ready(frout)
        frdt = min(frdt, time.time() - t0)
    fullres_rate = steps * fpoints.shape[0] / frdt
    flops_pp = _matmul_flops_per_point_step(frparams)

    # real-image anchor: the convex-depth teaser protocol on the
    # reference's own shipped data, scored against its shipped result
    # mask (runner/teaser.py; full 9-protocol sweep: scripts/run_teasers.py)
    realimage_iou = None
    try:
        from awesome_tpu.runner import teaser as teaser_mod

        if teaser_mod.reference_data_available():
            realimage_iou = round(teaser_mod.run_convex_depth().iou, 4)
    except Exception:  # noqa: BLE001 — bench must still print its line
        realimage_iou = None

    measured, mdata = _measured_baseline()
    result = {
        "metric": "coord-point-steps/s/chip (batched prior fit)",
        "value": round(value, 1),
        "unit": "point-steps/s",
        "vs_baseline_estimated_gpu": round(
            value / BASELINE_EST_GPU_POINT_STEPS_PER_SEC, 3
        ),
        # the real per-image protocol at full resolution
        "per_image_fullres_shape": f"{fh}x{fw}",
        "per_image_fullres_seconds": round(frdt, 2),
        "per_image_fullres_point_steps_per_sec": round(fullres_rate, 1),
        # the reference loop is launch-bound (~3 ms/step at any size)
        "per_image_fullres_vs_estimated_gpu": round(
            BASELINE_EST_GPU_PER_IMAGE_SECONDS * (steps / 2000.0) / frdt, 1
        ),
        # f32 model-FLOPs utilization of the full-res fused fit
        "mfu_pct": round(
            100.0 * fullres_rate * flops_pp / F32_PEAK_FLOPS, 2
        ),
        "mfu_flops_per_point_step": int(flops_pp),
    }
    if realimage_iou is not None:
        # IoU vs the reference's own shipped result mask on its own
        # shipped image (convex-depth teaser; full table in PARITY.md)
        result["realimage_convex_depth_iou_vs_shipped_mask"] = realimage_iou
    if measured:
        result["vs_baseline"] = round(value / measured, 1)
        result["baseline_source"] = (
            f"measured: torch reference loop on this host "
            f"({mdata['hardware']}), {measured:.0f} point-steps/s, "
            f"{mdata['per_image_seconds']}s/image (BASELINE_MEASURED.json)"
        )
        # per-image wall-clock comparison at identical shapes: the fused
        # Pallas single-image fit vs the reference's serial per-image loop
        result["per_image_fit_seconds"] = round(fdt, 4)
        result["per_image_fit_seconds_reference"] = mdata["per_image_seconds"]
        result["per_image_fit_vs_reference"] = round(
            mdata["per_image_seconds"] / fdt, 1
        )
    else:
        result["vs_baseline"] = result["vs_baseline_estimated_gpu"]
        result["baseline_source"] = "estimate (BASELINE_MEASURED.json absent)"
    fr_measured, fr_data = _measured_baseline_fullres()
    if fr_measured and fr_data.get("grid") == [fh, fw]:
        # the torch loop's MEASURED rate at this exact shape (short run;
        # rate extrapolated to the protocol's 2000 steps)
        ref_fullres_s = steps * fpoints.shape[0] / fr_measured
        result["per_image_fullres_seconds_reference_measured"] = round(
            ref_fullres_s, 1
        )
        result["per_image_fullres_vs_reference_measured"] = round(
            ref_fullres_s / frdt, 1
        )
        result["fullres_baseline_source"] = (
            f"measured: torch loop at {fh}x{fw}, "
            f"{fr_measured:.0f} point-steps/s over "
            f"{fr_data.get('steps_per_image')} steps "
            "(BASELINE_MEASURED_FULLRES.json)"
        )
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
