"""Regression: the flow must remain bijective AFTER fitting.

Caught in round-1 verification: coupling masks stored in the param tree
were updated by the optimizer, silently destroying invertibility while the
fit loss kept improving. Masks are static config now."""
import jax
import jax.numpy as jnp
import numpy as np

from awesome_tpu.core import grids as G
from awesome_tpu.fit import FitConfig, fit_prior
from awesome_tpu.nn.path_connected import real_nvp_path_connected_net


def test_flow_invertible_after_fit():
    h = w = 24
    yy, xx = np.mgrid[0:h, 0:w]
    fg = ((yy - h / 2) ** 2 + (xx - w / 2) ** 2) <= (h / 3) ** 2
    unaries = 1.0 - fg.astype(np.float32)
    points = G.flatten_grid(G.pixel_grid((h, w)))
    target = jnp.asarray(unaries).reshape(-1, 1)
    model = real_nvp_path_connected_net(
        channels=2, hidden_units=16, flow_n_flows=4, flow_output_fn="tanh",
        spatial_shape=(h, w), convex_net_hidden_units=16,
        convex_net_hidden_layers=1,
    )
    params = model.init(jax.random.PRNGKey(0))
    fitted, aux = fit_prior(
        model, params, points, target, FitConfig(num_steps=150, lr=1e-3)
    )
    assert np.isfinite(np.asarray(aux["loss_hist"])).all()
    xd = model.deformation(fitted, points)
    x_rec = model.inverse(fitted, xd)
    err = float(jnp.abs(x_rec - points).max())
    assert err < 1e-3, f"fitted flow not invertible: max err {err}"
