"""Fused fit engine: short-fit equivalence against the XLA fit engine
(identical optimizer/scheduler/clip semantics; only the loss+grad compute
is the Pallas kernel, run in interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from awesome_tpu.core import grids as G
from awesome_tpu.fit.fused_fit import make_fused_fit_fn
from awesome_tpu.fit.prior_fit import FitConfig, make_fit_fn
from awesome_tpu.measures.metrics import iou
from awesome_tpu.nn.path_connected import real_nvp_path_connected_net


def test_fused_fit_matches_xla_fit_short():
    h = w = 16
    model = real_nvp_path_connected_net(
        channels=2, hidden_units=8, flow_n_flows=4, flow_output_fn="tanh",
        spatial_shape=(h, w), convex_net_hidden_units=12,
        convex_net_hidden_layers=2,
    )
    params = model.init(jax.random.PRNGKey(0))
    pts = G.flatten_grid(G.pixel_grid((h, w)))
    yy, xx = np.mgrid[0:h, 0:w]
    fg = ((yy - h / 2) ** 2 + (xx - w / 2) ** 2) <= (h / 3) ** 2
    target = jnp.asarray(1.0 - fg.astype(np.float32)).reshape(-1, 1)

    cfg = FitConfig(num_steps=25, lr=1e-3, nan_guard_grads=False)
    ref_fit = jax.jit(make_fit_fn(model, cfg))
    ref_params, ref_aux = ref_fit(params, pts, target)

    fused_fit = jax.jit(make_fused_fit_fn(model, cfg, interpret=True))
    f_params, f_aux = fused_fit(params, pts, target)

    np.testing.assert_allclose(
        np.asarray(f_aux["loss_hist"]), np.asarray(ref_aux["loss_hist"]),
        rtol=2e-4,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(f_params),
        jax.tree_util.tree_leaves(ref_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-6
        )


def test_fused_fit_quality_small():
    """A longer fused fit actually solves the toy problem (IoU gate)."""
    h = w = 16
    model = real_nvp_path_connected_net(
        channels=2, hidden_units=8, flow_n_flows=2, flow_output_fn="tanh",
        spatial_shape=(h, w), convex_net_hidden_units=16,
        convex_net_hidden_layers=1,
    )
    params = model.init(jax.random.PRNGKey(1))
    pts = G.flatten_grid(G.pixel_grid((h, w)))
    yy, xx = np.mgrid[0:h, 0:w]
    fg = ((yy - h / 2) ** 2 + (xx - w / 2) ** 2) <= (h / 3) ** 2
    target = jnp.asarray(1.0 - fg.astype(np.float32)).reshape(-1, 1)
    cfg = FitConfig(num_steps=400, lr=5e-3, nan_guard_grads=False)
    fused_fit = jax.jit(make_fused_fit_fn(model, cfg, interpret=True))
    fitted, aux = fused_fit(params, pts, target)
    prob = jax.nn.sigmoid(model.apply(fitted, pts))
    score = float(iou(prob > 0.5, target > 0.5, invert=True))
    assert score > 0.9, (score, float(aux["loss_hist"][-1]))


def test_fused_sequential_warm_start():
    """FitConfig(fused=True) drives the sequential (reuse_state) engine —
    the reference's actual per-image pretrain protocol — with interpret
    auto-selected off-TPU."""
    import dataclasses

    from awesome_tpu.fit.prior_fit import fit_priors_sequential

    h = w = 12
    model = real_nvp_path_connected_net(
        channels=2, hidden_units=8, flow_n_flows=2, flow_output_fn="tanh",
        spatial_shape=(h, w), convex_net_hidden_units=8,
        convex_net_hidden_layers=1,
    )
    params = model.init(jax.random.PRNGKey(0))
    pts = G.flatten_grid(G.pixel_grid((h, w)))
    yy, xx = np.mgrid[0:h, 0:w]
    fg = ((yy - h / 2) ** 2 + (xx - w / 2) ** 2) <= (h / 3) ** 2
    target = jnp.asarray(1.0 - fg.astype(np.float32)).reshape(-1, 1)
    targets = jnp.stack([target] * 3)
    cfg = FitConfig(num_steps=20, lr=1e-3, fused=True, nan_guard_grads=False)
    warm = dataclasses.replace(cfg, num_steps=8)
    stacked, aux = fit_priors_sequential(
        model, params, pts, targets, cfg, warm_cfg=warm
    )
    leaves = jax.tree_util.tree_leaves(stacked)
    assert leaves[0].shape[0] == 3
    assert np.isfinite(np.asarray(aux["first_aux"]["loss_hist"])).all()


def test_grouped_fused_fit_matches_single_fused():
    """group-G kernel programs: per-image losses and fitted params match
    the group=1 fused engine (same math, same order; only the program
    packing differs). Plateau acts on the group mean (inactive here)."""
    h = w = 12
    model = real_nvp_path_connected_net(
        channels=2, hidden_units=8, flow_n_flows=2, flow_output_fn="tanh",
        spatial_shape=(h, w), convex_net_hidden_units=8,
        convex_net_hidden_layers=1,
    )
    from awesome_tpu.fit.fused_fit import make_grouped_fused_fit_fn

    g = 2
    stacked = jax.vmap(model.init)(jax.random.split(jax.random.PRNGKey(0), g))
    pts = G.flatten_grid(G.pixel_grid((h, w)))
    yy, xx = np.mgrid[0:h, 0:w]
    t0 = 1.0 - (((yy - 5) ** 2 + (xx - 5) ** 2) <= 9).astype(np.float32)
    t1 = 1.0 - (((yy - 7) ** 2 + (xx - 7) ** 2) <= 9).astype(np.float32)
    targets = jnp.asarray(np.stack([t0, t1])).reshape(g, -1, 1)

    cfg = FitConfig(num_steps=20, lr=1e-3, nan_guard_grads=False)
    gfit = jax.jit(make_grouped_fused_fit_fn(model, cfg, group=g,
                                             interpret=True, tile_n=64))
    g_params, g_aux = gfit(stacked, pts, targets)
    assert g_aux["loss_hist"].shape == (20, g)

    sfit = jax.jit(make_fused_fit_fn(model, cfg, interpret=True, tile_n=64))
    for i in range(g):
        from awesome_tpu.core import tree as T

        s_params, s_aux = sfit(
            T.tree_select(stacked, i), pts, targets[i]
        )
        np.testing.assert_allclose(
            np.asarray(g_aux["loss_hist"][:, i]),
            np.asarray(s_aux["loss_hist"]), rtol=2e-4,
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(T.tree_select(g_params, i)),
            jax.tree_util.tree_leaves(s_params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-6
            )


def test_fused_fit_point_mask_matches_unpadded():
    """The fused engine consumes point masks through the weight vector:
    a bucket-padded fused fit equals the unpadded fused fit (interpret
    mode off-TPU)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from awesome_tpu.fit.prior_fit import FitConfig, make_fit_fn
    from awesome_tpu.nn.path_connected import real_nvp_path_connected_net

    h = w = 12
    model = real_nvp_path_connected_net(
        channels=2, hidden_units=8, flow_n_flows=2, flow_output_fn="tanh",
        spatial_shape=(h, w), convex_net_hidden_units=12,
        convex_net_hidden_layers=1,
    )
    params = model.init(jax.random.PRNGKey(0))
    yy, xx = np.mgrid[0:h, 0:w]
    pts = (np.stack([yy / h, xx / w], -1).reshape(-1, 2) - 0.5).astype(
        np.float32
    )
    tgt = (((pts**2).sum(-1) > 0.09).astype(np.float32)).reshape(-1, 1)
    cfg = FitConfig(num_steps=10, lr=1e-2, fused=True,
                    nan_guard_grads=False)
    fit = jax.jit(make_fit_fn(model, cfg))
    ref, ref_aux = fit(params, jnp.asarray(pts), jnp.asarray(tgt))

    pad = 32
    pts_p = np.concatenate([pts, np.full((pad, 2), 5.0, np.float32)])
    tgt_p = np.concatenate([tgt, np.zeros((pad, 1), np.float32)])
    mask = np.zeros((pts_p.shape[0],), bool)
    mask[: pts.shape[0]] = True
    padded, pad_aux = fit(
        params, jnp.asarray(pts_p), jnp.asarray(tgt_p),
        point_mask=jnp.asarray(mask),
    )
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(padded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(ref_aux["loss_hist"]), np.asarray(pad_aux["loss_hist"]),
        atol=1e-6,
    )
