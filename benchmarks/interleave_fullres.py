"""Interleaved+remat duo kernel vs solo at full-res (VERDICT r4 #1)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from awesome_tpu.core import grids as G
from awesome_tpu.fit.prior_fit import FitConfig, make_fit_fn
from awesome_tpu.fit.fused_fit import make_grouped_fused_fit_fn
from awesome_tpu.nn.path_connected import real_nvp_path_connected_net

STEPS = 200
fh, fw = 480, 640
fyy, fxx = np.mgrid[0:fh, 0:fw]
ffg = (((fyy - fh / 2) ** 2 / (0.09 * fh * fh)
        + (fxx - fw / 2) ** 2 / (0.05 * fw * fw)) <= 1.0)
points = G.flatten_grid(G.pixel_grid((fh, fw)))
target = jnp.asarray(1.0 - ffg.astype(np.float32)).reshape(-1, 1)
cfg = FitConfig(num_steps=STEPS, lr=1e-3, nan_guard_grads=False, fused=True)

model = real_nvp_path_connected_net(
    channels=2, hidden_units=32, flow_n_flows=12, flow_output_fn="tanh",
    spatial_shape=(fh, fw), convex_net_hidden_units=130,
    convex_net_hidden_layers=2,
)


def bench(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best, out


solo = jax.jit(make_fit_fn(model, cfg))
params = model.init(jax.random.PRNGKey(1))
t_solo, _ = bench(solo, params, points, target)
print(f"solo tile2048:              {t_solo / STEPS * 1e3:8.3f} ms/step",
      flush=True)

for group, tile in ((2, 2048), (4, 1024), (4, 2048)):
    try:
        gfit = jax.jit(make_grouped_fused_fit_fn(
            model, cfg, group=group, tile_n=tile, interleave=True))
        keys = jax.random.split(jax.random.PRNGKey(2), group)
        stacked = jax.vmap(model.init)(keys)
        tgts = jnp.stack([target] * group)
        t_g, out = bench(gfit, stacked, points, tgts)
        lh = np.asarray(out[1]["loss_hist"])
        assert np.isfinite(lh).all(), "NaN in interleaved fit"
        print(f"ILV group={group} tile{tile}:  {t_g / STEPS * 1e3:8.3f} "
              f"ms/step = {t_g / STEPS / group * 1e3:7.3f} ms/step/image "
              f"({t_solo / (t_g / group):.3f}x vs solo) "
              f"loss[0] {lh[0].mean():.4f} -> {lh[-1].mean():.4f}",
              flush=True)
    except Exception as e:
        print(f"ILV group={group} tile{tile}:  FAILED "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)
print("DONE", flush=True)
