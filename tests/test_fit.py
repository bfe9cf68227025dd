"""Fit-engine tests: optimizer parity with torch semantics, plateau
scheduler, and the end-to-end convexity slice (SURVEY.md §7 step 4) on a
synthetic image — small sizes to keep CPU compile times down."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from awesome_tpu.core import grids as G
from awesome_tpu.core import tree as T
from awesome_tpu.fit import optim
from awesome_tpu.fit.prior_fit import (
    FitConfig,
    fit_prior,
    fit_priors_batched,
    fit_priors_sequential,
    learn_convex_net,
    learn_flow_identity,
)
from awesome_tpu.measures.metrics import iou
from awesome_tpu.nn.icnn import ConvexNextNet
from awesome_tpu.nn.path_connected import real_nvp_path_connected_net


def _torch_reference_adamax(params, grads_seq, lr=0.1, wd=0.0):
    import torch

    p = torch.tensor(np.asarray(params), requires_grad=True)
    opt = torch.optim.Adamax([p], lr=lr, weight_decay=wd)
    for g in grads_seq:
        opt.zero_grad()
        p.grad = torch.tensor(np.asarray(g))
        opt.step()
    return p.detach().numpy()


def test_adamax_matches_torch():
    x0 = jnp.asarray([1.0, -2.0, 3.0])
    grads_seq = [jnp.asarray([0.5, -0.1, 0.2]), jnp.asarray([-0.3, 0.4, 0.1])]
    state = optim.adamax_init(x0)
    p = x0
    for g in grads_seq:
        p, state = optim.adamax_update(p, g, state, lr=0.1)
    expect = _torch_reference_adamax(x0, grads_seq, lr=0.1)
    np.testing.assert_allclose(np.asarray(p), expect, rtol=1e-5)


def test_adamax_weight_decay_matches_torch():
    x0 = jnp.asarray([1.0, -2.0])
    grads_seq = [jnp.asarray([0.5, -0.1])] * 3
    state = optim.adamax_init(x0)
    p = x0
    wd = jax.tree_util.tree_map(lambda _: 0.01, p)
    for g in grads_seq:
        p, state = optim.adamax_update(p, g, state, lr=0.1, weight_decay=wd)
    expect = _torch_reference_adamax(x0, grads_seq, lr=0.1, wd=0.01)
    np.testing.assert_allclose(np.asarray(p), expect, rtol=1e-5)


def test_adam_matches_torch():
    import torch

    x0 = jnp.asarray([1.0, -2.0, 0.5])
    grads_seq = [jnp.asarray([0.5, -0.1, 0.3])] * 4
    state = optim.adam_init(x0)
    p = x0
    for g in grads_seq:
        p, state = optim.adam_update(p, g, state, lr=0.05)
    pt = torch.tensor(np.asarray(x0), requires_grad=True)
    opt = torch.optim.Adam([pt], lr=0.05)
    for g in grads_seq:
        opt.zero_grad()
        pt.grad = torch.tensor(np.asarray(g))
        opt.step()
    np.testing.assert_allclose(np.asarray(p), pt.detach().numpy(), rtol=1e-5)


def test_plateau_scheduler_reduces():
    s = optim.plateau_init()
    # no improvement for patience+1 steps -> scale halves
    s = optim.plateau_update(s, jnp.asarray(1.0), patience=3)
    for _ in range(5):
        s = optim.plateau_update(s, jnp.asarray(1.0), patience=3)
    assert float(s.scale) == 0.5


def test_plateau_scheduler_improvement_resets():
    s = optim.plateau_init()
    losses = [1.0, 0.9, 0.8, 0.7, 0.6]
    for l in losses:
        s = optim.plateau_update(s, jnp.asarray(l), patience=2)
    assert float(s.scale) == 1.0


def _synthetic_unaries(h=32, w=32):
    """Occluded disk: a disk with a bite taken out — the convex prior should
    recover the full disk (the how-to tomato scenario)."""
    yy, xx = np.mgrid[0:h, 0:w]
    disk = ((yy - h / 2) ** 2 + (xx - w / 2) ** 2) <= (h / 3) ** 2
    bite = (yy < h / 2) & (xx > w / 2)
    fg = disk & ~bite
    # unaries convention: fg = 0, bg = 1
    return 1.0 - fg.astype(np.float32)


def test_end_to_end_convexity_howto():
    """The minimum end-to-end slice: fit ConvexNextNet on a grid to
    occluded-disk unaries; thresholded output must be a convex region
    covering the full disk. Spec: notebooks/how_to/convexity.ipynb."""
    h = w = 32
    unaries = jnp.asarray(_synthetic_unaries(h, w))
    grid = G.pixel_grid((h, w))
    points = G.flatten_grid(grid)
    target = unaries.reshape(-1, 1)

    model = ConvexNextNet(n_hidden=32, n_hidden_layers=1)
    params = model.init(jax.random.PRNGKey(0))
    cfg = FitConfig(
        num_steps=400, lr=2e-3, optimizer="adam", fg_weight=0.4,
        plateau_patience=10_000,
    )
    fitted, aux = fit_prior(model, params, points, target, cfg)
    assert np.isfinite(np.asarray(aux["loss_hist"])).all()
    assert float(aux["loss_hist"][-1]) < float(aux["loss_hist"][0])

    prob = jax.nn.sigmoid(model.apply(fitted, points)).reshape(h, w)
    pred_fg = np.asarray(prob) < 0.5  # fg encoded as 0
    true_disk = 1.0 - _synthetic_unaries(h, w)
    yy, xx = np.mgrid[0:h, 0:w]
    full_disk = ((yy - h / 2) ** 2 + (xx - w / 2) ** 2) <= (h / 3) ** 2
    # prediction should cover most of the full disk (incl. the occluded bite)
    cover = (pred_fg & full_disk).sum() / full_disk.sum()
    assert cover > 0.8, f"disk coverage {cover}"


def test_batched_fit_matches_single():
    """vmapped stacked-params fit == independent fits (the core design)."""
    h = w = 16
    model = ConvexNextNet(n_hidden=16, n_hidden_layers=1)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    stacked = jax.vmap(model.init)(keys)
    grid = G.pixel_grid((h, w))
    points = G.flatten_grid(grid)
    targets = jnp.stack(
        [jnp.asarray(_synthetic_unaries(h, w)).reshape(-1, 1)] * 3
    )
    cfg = FitConfig(num_steps=50, lr=2e-3, optimizer="adam")
    fitted, aux = fit_priors_batched(model, stacked, points, targets, cfg)
    single, _ = fit_prior(
        model, T.tree_select(stacked, 1), points, targets[1], cfg
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(T.tree_select(fitted, 1)),
        jax.tree_util.tree_leaves(single),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_batched_fit_gate_and_valid_mask():
    h = w = 16
    model = ConvexNextNet(n_hidden=16, n_hidden_layers=1)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    stacked = jax.vmap(model.init)(keys)
    points = G.flatten_grid(G.pixel_grid((h, w)))
    good = jnp.asarray(_synthetic_unaries(h, w)).reshape(-1, 1)
    single_valued = jnp.ones_like(good)  # no fg -> invalid image
    targets = jnp.stack([good, single_valued])
    valid = jnp.asarray([True, False])
    cfg = FitConfig(num_steps=30, lr=2e-3, optimizer="adam",
                    gate_threshold=0.0)
    fitted, aux = fit_priors_batched(
        model, stacked, points, targets, cfg, valid_mask=valid
    )
    # invalid image's params must be untouched
    for a, b in zip(
        jax.tree_util.tree_leaves(T.tree_select(fitted, 1)),
        jax.tree_util.tree_leaves(T.tree_select(stacked, 1)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert "gate_iou" in aux


def test_sequential_fit_warm_start():
    h = w = 16
    model = ConvexNextNet(n_hidden=16, n_hidden_layers=1)
    params0 = model.init(jax.random.PRNGKey(0))
    points = G.flatten_grid(G.pixel_grid((h, w)))
    t = jnp.asarray(_synthetic_unaries(h, w)).reshape(-1, 1)
    targets = jnp.stack([t, t, t])
    cfg = FitConfig(num_steps=40, lr=2e-3, optimizer="adam")
    warm = dataclasses.replace(cfg, num_steps=10)
    stacked, aux = fit_priors_sequential(
        model, params0, points, targets, cfg, warm_cfg=warm
    )
    leaves = jax.tree_util.tree_leaves(stacked)
    assert leaves[0].shape[0] == 3
    assert np.isfinite(np.asarray(aux["first_aux"]["loss_hist"])).all()


def test_prefits_run_and_improve():
    model = real_nvp_path_connected_net(
        channels=2, hidden_units=8, flow_n_flows=2, spatial_shape=(16, 16),
        convex_net_hidden_units=8, convex_net_hidden_layers=1,
    )
    params = model.init(jax.random.PRNGKey(0))
    points = G.flatten_grid(G.pixel_grid((16, 16)))
    params2, hist = learn_flow_identity(model, params, points, max_iter=20)
    assert np.isfinite(np.asarray(hist)).all()
    target = jnp.asarray(_synthetic_unaries(16, 16)).reshape(-1, 1)
    params3, hist2 = learn_convex_net(
        model, params2, points, target, mode="circle", grid_shape=(16, 16),
        max_iter=20,
    )
    assert float(hist2[-1]) <= float(hist2[0])


def test_lr_watchdog_freezes_updates():
    """When the plateau scale decays below lr_stop_scale, params freeze —
    the in-scan LearningRateStopTrainingWatchdog equivalent."""
    model = ConvexNextNet(n_hidden=8, n_hidden_layers=1)
    params = model.init(jax.random.PRNGKey(0))
    points = G.flatten_grid(G.pixel_grid((8, 8)))
    target = jnp.asarray(_synthetic_unaries(8, 8)).reshape(-1, 1)
    # patience 1 -> scale halves fast; stop when scale < 0.3 (i.e. after 2 cuts)
    cfg = FitConfig(
        num_steps=60, lr=1e-3, optimizer="adam", plateau_patience=1,
        plateau_factor=0.5, lr_stop_scale=0.3,
    )
    # force no improvement by fitting an already-converged-ish config with
    # tiny lr; mostly checks it runs and scale decays below threshold
    fitted, aux = fit_prior(model, params, points, target, cfg)
    assert np.isfinite(np.asarray(aux["loss_hist"])).all()


def test_mixed_precision_fit_path():
    """Opt-in bf16 compute: master params stay f32, fit still converges."""
    h = w = 16
    model = ConvexNextNet(n_hidden=16, n_hidden_layers=1)
    params = model.init(jax.random.PRNGKey(0))
    points = G.flatten_grid(G.pixel_grid((h, w)))
    target = jnp.asarray(_synthetic_unaries(h, w)).reshape(-1, 1)
    cfg = FitConfig(num_steps=80, lr=2e-3, optimizer="adam",
                    compute_dtype=jnp.bfloat16)
    fitted, aux = fit_prior(model, params, points, target, cfg)
    assert np.isfinite(np.asarray(aux["loss_hist"], np.float32)).all()
    assert float(aux["loss_hist"][-1]) < float(aux["loss_hist"][0])
    # master weights remained f32
    for leaf in jax.tree_util.tree_leaves(fitted):
        assert leaf.dtype == jnp.float32
