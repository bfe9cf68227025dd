"""Heterogeneous image sizes end-to-end (VERDICT r2 #1).

The real convexity-51 protocol has per-image sizes; the reference is
shape-agnostic per image (`awesome/dataset/convexity_segmentation_dataset.py:178-246`).
XLA needs static shapes, so the repo's contract is pad-to-bucket + mask
(CLAUDE.md invariant). These tests lock:

- masked point weights: a bucket-padded fit computes EXACTLY the unpadded
  per-image loss/updates (bit parity),
- the gate IoU ignores padded points,
- AwesomeRunner trains + sequentially refits + evaluates a MIXED-size
  synthetic set (48x64 and 64x64) in pixel and image mode.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awesome_tpu.fit.prior_fit import (
    FitConfig,
    _gate_iou,
    fit_priors_batched,
    fit_priors_sequential,
    make_fit_fn,
    make_point_weights,
)
from awesome_tpu.nn.icnn import ConvexNextNet


def _grid(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([yy / h - 0.5, xx / w - 0.5], -1).reshape(-1, 2).astype(
        np.float32
    )


def _disk_target(h, w, r=0.3):
    pts = _grid(h, w)
    inside = (pts ** 2).sum(-1) < r ** 2
    return (1.0 - inside.astype(np.float32)).reshape(-1, 1)  # fg = 0


@pytest.mark.parametrize("weight_mode", ["none", "sssdms"])
def test_padded_fit_matches_unpadded(weight_mode):
    """Weight-0 padding reproduces the unpadded fit bit-for-bit: the loss
    normalization excludes padded points, so every step's gradients match."""
    model = ConvexNextNet(in_features=2, n_hidden=12, n_hidden_layers=1)
    cfg = FitConfig(num_steps=30, lr=1e-2, weight_mode=weight_mode)
    params = model.init(jax.random.PRNGKey(0))

    h, w = 12, 16
    pts = _grid(h, w)
    tgt = _disk_target(h, w)

    fit = make_fit_fn(model, cfg)
    ref_params, ref_aux = jax.jit(fit)(params, jnp.asarray(pts),
                                       jnp.asarray(tgt))

    pad = 64  # pad with garbage points that MUST not matter
    pts_p = np.concatenate(
        [pts, np.full((pad, 2), 7.0, np.float32)], axis=0
    )
    tgt_p = np.concatenate(
        [tgt, np.zeros((pad, 1), np.float32)], axis=0  # fake "fg" padding
    )
    mask = np.zeros((pts_p.shape[0],), bool)
    mask[: pts.shape[0]] = True
    pad_params, pad_aux = jax.jit(fit)(
        params, jnp.asarray(pts_p), jnp.asarray(tgt_p),
        point_mask=jnp.asarray(mask),
    )

    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(pad_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ref_aux["loss_hist"]), np.asarray(pad_aux["loss_hist"]),
        atol=1e-6,
    )


def test_point_weights_masked_normalization():
    tgt = jnp.asarray([[0.0], [1.0], [1.0], [0.0]])  # 2 fg, 2 bg
    mask = jnp.asarray([True, True, True, False])
    cfg = FitConfig(weight_mode="none")
    w = make_point_weights(tgt, cfg, mask)
    np.testing.assert_allclose(np.asarray(w[:, 0]),
                               [1 / 3, 1 / 3, 1 / 3, 0.0], atol=1e-6)
    # class-balanced: counts over the valid region only
    cfg2 = FitConfig(weight_mode="equal")
    w2 = make_point_weights(tgt, cfg2, mask)
    assert float(w2[3, 0]) == 0.0
    # bg/fg = 2/1 on valid -> fg weight 2, bg weight 1, /3 points
    np.testing.assert_allclose(np.asarray(w2[:, 0]),
                               [2 / 3, 1 / 3, 1 / 3, 0.0], atol=1e-6)


def test_gate_iou_ignores_padding():
    model = ConvexNextNet(in_features=2, n_hidden=8, n_hidden_layers=1)
    params = model.init(jax.random.PRNGKey(1))
    cfg = FitConfig()
    pts = jnp.asarray(_grid(8, 8))
    tgt = jnp.asarray(_disk_target(8, 8))
    base = float(_gate_iou(model, params, pts, tgt, cfg))
    # padded tail claiming all-fg would change an unmasked IoU
    pad_pts = jnp.concatenate([pts, jnp.zeros((32, 2))], axis=0)
    pad_tgt = jnp.concatenate([tgt, jnp.zeros((32, 1))], axis=0)
    mask = jnp.concatenate(
        [jnp.ones((64,), bool), jnp.zeros((32,), bool)]
    )
    masked = float(_gate_iou(model, params, pad_pts, pad_tgt, cfg, mask))
    assert masked == pytest.approx(base, abs=1e-6)


def test_batched_fit_mixed_sizes():
    """Two images of different sizes share one bucket-padded program; each
    fit matches its own single-image fit."""
    from awesome_tpu.data.batching import stack_padded

    model = ConvexNextNet(in_features=2, n_hidden=12, n_hidden_layers=1)
    cfg = FitConfig(num_steps=25, lr=1e-2)
    keys = jax.random.split(jax.random.PRNGKey(2), 2)
    stacked = jax.vmap(model.init)(keys)

    shapes = [(12, 16), (16, 16)]
    pts_list = [_grid(h, w) for h, w in shapes]
    tgt_list = [_disk_target(h, w) for h, w in shapes]
    pts, masks = stack_padded(pts_list, granularity=64)
    tgts, _ = stack_padded(tgt_list, granularity=64)

    fitted, aux = fit_priors_batched(
        model, stacked, jnp.asarray(pts), jnp.asarray(tgts), cfg,
        point_masks=jnp.asarray(masks),
    )

    fit = jax.jit(make_fit_fn(model, cfg))
    for i, (p, t) in enumerate(zip(pts_list, tgt_list)):
        pi = jax.tree_util.tree_map(lambda x: x[i], stacked)
        ref, _ = fit(pi, jnp.asarray(p), jnp.asarray(t))
        for a, b in zip(jax.tree_util.tree_leaves(ref),
                        jax.tree_util.tree_leaves(
                            jax.tree_util.tree_map(lambda x: x[i], fitted))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


def test_sequential_fit_mixed_sizes():
    """The reuse_state warm-start sweep accepts per-image bucket-padded
    grids + masks and returns finite per-image params."""
    model = ConvexNextNet(in_features=2, n_hidden=10, n_hidden_layers=1)
    cfg = FitConfig(num_steps=20, lr=1e-2)
    warm = dataclasses.replace(cfg, num_steps=8)
    params = model.init(jax.random.PRNGKey(3))
    from awesome_tpu.data.batching import stack_padded

    shapes = [(12, 16), (16, 16), (10, 10)]
    pts, masks = stack_padded([_grid(h, w) for h, w in shapes],
                              granularity=64)
    tgts, _ = stack_padded([_disk_target(h, w) for h, w in shapes],
                           granularity=64)
    stacked, aux = fit_priors_sequential(
        model, params, jnp.asarray(pts), jnp.asarray(tgts), cfg,
        warm_cfg=warm, point_masks=jnp.asarray(masks),
    )
    for leaf in jax.tree_util.tree_leaves(stacked):
        assert leaf.shape[0] == 3
        assert np.isfinite(np.asarray(leaf)).all()


def _mixed_runner(tmp_path, dimension="2d", seg_type=None, **extra):
    from awesome_tpu.runner.config import AwesomeConfig
    from awesome_tpu.runner.runner import AwesomeRunner

    cfg = AwesomeConfig(
        name_experiment="mixed",
        runs_path=str(tmp_path),
        num_epochs=20,
        dataset_args={"dimension": dimension,
                      "shapes": [(20, 28), (28, 28), (24, 20)]},
        optimizer_args={"lr": 0.02},
        compute_metrics_during_training_nth_epoch=0,
        **extra,
    )
    if seg_type:
        cfg.segmentation_model_type = seg_type
    return AwesomeRunner(cfg)


def test_runner_mixed_sizes_pixel_mode(tmp_path):
    """Pixel-mode e2e on mixed sizes: train, sequential refit, evaluate."""
    runner = _mixed_runner(tmp_path)
    runner.build()
    assert {s.shape for s in runner.samples} == {(20, 28), (28, 28),
                                                 (24, 20)}
    res = runner.train()
    assert np.isfinite(res["loss_hist"]).all()
    refit = runner.sequential_prior_fit(num_steps=30, lr=5e-3)
    assert refit["gate_iou"].shape == (3,)
    m = runner.evaluate()
    assert 0.0 <= m["MeanForegroundBinaryMIOU"] <= 1.0
    assert 0.0 <= m["PriorMeanForegroundBinaryMIOU"] <= 1.0


def test_runner_mixed_sizes_image_mode(tmp_path):
    """Image mode pads to the (Hmax, Wmax) bucket instead of raising; the
    conv seg net runs on one static shape, losses and metrics are masked
    to each image's valid region."""
    runner = _mixed_runner(
        tmp_path,
        dimension="3d",
        seg_type="awesome_tpu.nn.seg.CNNNet",
        segmentation_model_args={"input": "rgbxy"},
    )
    runner.build()
    assert runner.image_mode is True
    assert runner._shape == (28, 28)
    b = runner._batch
    # image 0 is 20x28: rows beyond 20 must be invalid
    v0 = b["valid"][0].reshape(28, 28)
    assert v0[:20, :].all() and not v0[20:, :].any()
    res = runner.train()
    assert np.isfinite(res["loss_hist"]).all()
    m = res["final_metrics"]
    assert 0.0 <= m["MeanForegroundBinaryMIOU"] <= 1.0


def test_mixed_vs_uniform_iou_parity(tmp_path):
    """A mixed-size run reaches the same prior quality as the same images
    run uniformly: fit each image alone vs inside the mixed bucket-padded
    batch and compare gate IoUs."""
    from awesome_tpu.data.batching import stack_padded
    from awesome_tpu.data.synthetic import make_sample

    model = ConvexNextNet(in_features=2, n_hidden=16, n_hidden_layers=1)
    cfg = FitConfig(num_steps=150, lr=2e-2, gate_threshold=None)
    samples = [make_sample(0, 24, 32), make_sample(1, 32, 32)]
    pts_list, tgt_list = [], []
    for s in samples:
        h, w = s.shape
        pts_list.append(_grid(h, w))
        tgt_list.append(s.gt.reshape(-1, 1).astype(np.float32))
    pts, masks = stack_padded(pts_list, granularity=256)
    tgts, _ = stack_padded(tgt_list, granularity=256)
    keys = jax.random.split(jax.random.PRNGKey(5), 2)
    stacked = jax.vmap(model.init)(keys)
    fitted, _ = fit_priors_batched(
        model, stacked, jnp.asarray(pts), jnp.asarray(tgts), cfg,
        point_masks=jnp.asarray(masks),
    )
    for i, s in enumerate(samples):
        pi = jax.tree_util.tree_map(lambda x: x[i], fitted)
        score = float(_gate_iou(
            model, pi, jnp.asarray(pts_list[i]), jnp.asarray(tgt_list[i]),
            cfg,
        ))
        ref_i = jax.tree_util.tree_map(lambda x: x[i], stacked)
        solo, _ = jax.jit(make_fit_fn(model, cfg))(
            ref_i, jnp.asarray(pts_list[i]), jnp.asarray(tgt_list[i])
        )
        solo_score = float(_gate_iou(
            model, solo, jnp.asarray(pts_list[i]),
            jnp.asarray(tgt_list[i]), cfg,
        ))
        assert score == pytest.approx(solo_score, abs=1e-4)
