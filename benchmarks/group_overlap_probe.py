"""Does the grouped flagship kernel ALREADY overlap the per-image chains
(Mosaic scheduling across the sequential source loop)?  Zero-code-change
probe before any remat/interleave surgery (VERDICT r4 #1).

Benches at the full-res shape (480x640 = 307200 points, 200 steps):
  1. solo fused fit, tile 2048              (baseline, ~4.6-4.9 ms/step)
  2. grouped fit, group=2, tile 1024        (same VMEM envelope as solo)
  3. grouped fit, group=4, tile 512
  4. solo with ICNN width 128 (vs 130)      (MXU tile-tax check, non-parity)
Per-image ms/step is the comparable number.
"""
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


def bench(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best


def mk(width):
    return real_nvp_path_connected_net(
        channels=2, hidden_units=32, flow_n_flows=12, flow_output_fn="tanh",
        spatial_shape=(fh, fw), convex_net_hidden_units=width,
        convex_net_hidden_layers=2,
    )


model = mk(130)

# 1. solo baseline
solo = jax.jit(make_fit_fn(model, cfg))
params = model.init(jax.random.PRNGKey(1))
t_solo = bench(solo, params, points, target)
print(f"solo tile2048 w130:   {t_solo / STEPS * 1e3:8.3f} ms/step "
      f"(total {t_solo:.2f}s)", flush=True)

# 2./3. grouped
for group, tile in ((2, 1024), (4, 512)):
    gfit = jax.jit(make_grouped_fused_fit_fn(model, cfg, group=group,
                                             tile_n=tile))
    keys = jax.random.split(jax.random.PRNGKey(2), group)
    stacked = jax.vmap(model.init)(keys)
    tgts = jnp.stack([target] * group)
    t_g = bench(gfit, stacked, points, tgts)
    print(f"group={group} tile{tile}:     {t_g / STEPS * 1e3:8.3f} ms/step "
          f"= {t_g / STEPS / group * 1e3:7.3f} ms/step/image "
          f"({t_solo / (t_g / group):.3f}x vs solo)", flush=True)

# 4. width-128 tile tax (non-parity diagnostic)
m128 = mk(128)
solo128 = jax.jit(make_fit_fn(m128, cfg))
p128 = m128.init(jax.random.PRNGKey(1))
t_128 = bench(solo128, p128, points, target)
print(f"solo tile2048 w128:   {t_128 / STEPS * 1e3:8.3f} ms/step "
      f"({t_solo / t_128:.3f}x vs w130)", flush=True)
print("DONE", flush=True)
