"""True validation holdout (VERDICT r2 #2 + #8).

The reference's split produces a val dataloader whose images are never
stepped (`awesome/dataset/separable_dataset.py:10-105`,
`awesome/agent/torch_agent.py:233-243` no-grad val phase). These tests
lock the TPU engines' equivalent:

- 'single' mode: val images' stacked wrapper params stay BIT-IDENTICAL
  through training,
- 'multi' mode: val priors stay frozen AND the shared-seg gradient mean
  excludes val images (equivalence with training on the train subset only),
- best-model selection keys off the held-out val loss,
- Runner.evaluate reports train/ and val/ metric variants.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awesome_tpu.fit.pixel_trainer import (
    PixelTrainConfig,
    make_pixel_segment_fn,
    make_shared_pixel_segment_fn,
    pixel_train_init,
    shared_pixel_train_init,
)
from awesome_tpu.nn.icnn import ConvexNextNet
from awesome_tpu.nn.seg import Net
from awesome_tpu.nn.wrapper import WrapperModule


def _wrapper():
    return WrapperModule(
        segmentation_module=Net(in_features=5),
        prior_module=ConvexNextNet(in_features=2, n_hidden=8,
                                   n_hidden_layers=1),
        input_mode="pixel",
        prior_arg_mode="xy_c_preattached",
    )


def _data(b=3, n=48, seed=0):
    rng = np.random.default_rng(seed)
    px = rng.uniform(-0.5, 0.5, size=(b, n, 5)).astype(np.float32)
    gt = (rng.random((b, n, 1)) > 0.5).astype(np.float32)
    smask = np.ones((b, n), bool)
    rmask = np.zeros((b, n), bool)
    return (jnp.asarray(px), jnp.asarray(gt), jnp.asarray(smask),
            jnp.asarray(rmask))


def _leaves_equal(a, b):
    return all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b))
    )


def test_single_mode_val_params_frozen():
    wrapper = _wrapper()
    cfg = PixelTrainConfig(num_epochs=10, lr=0.05)
    px, gt, smask, rmask = _data()
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    stacked = jax.vmap(wrapper.init)(keys)
    state = pixel_train_init(wrapper, stacked, cfg)
    segment = make_pixel_segment_fn(wrapper, cfg, 10)
    trainable = jnp.asarray([True, True, False])
    new_state, aux = segment(state, px, gt, smask, rmask, trainable)

    sel = lambda t, i: jax.tree_util.tree_map(lambda x: x[i], t)
    # val image 2: bit-identical params
    assert _leaves_equal(sel(new_state.params, 2), sel(stacked, 2))
    # train images actually moved
    assert not _leaves_equal(sel(new_state.params, 0), sel(stacked, 0))
    # val loss is still measured (finite forward-only curve)
    assert np.isfinite(np.asarray(aux["loss_hist"][2])).all()


def test_multi_mode_val_prior_frozen_and_grad_excluded():
    """Shared-seg training with a held-out third image must equal training
    on the two train images alone (same seg updates), and the val prior
    must stay bit-identical."""
    wrapper = _wrapper()
    cfg = PixelTrainConfig(num_epochs=8, lr=0.05)
    px, gt, smask, rmask = _data()
    # identical param construction for the 3-image and 2-image runs
    k_seg = jax.random.PRNGKey(1)
    seg_params = wrapper.segmentation_module.init(k_seg)
    prior_keys = jax.random.split(jax.random.PRNGKey(2), 3)
    prior_stack = jax.vmap(wrapper.prior_module.init)(prior_keys)
    sel2 = lambda t: jax.tree_util.tree_map(lambda x: x[:2], t)

    from awesome_tpu.fit import optim
    from awesome_tpu.fit.pixel_trainer import PixelTrainState

    def mk_state(params):
        return PixelTrainState(
            params=params,
            opt_state=optim.adam_init(params),
            sched=optim.plateau_init(),
            epoch=jnp.zeros((), jnp.int32),
        )

    segment = make_shared_pixel_segment_fn(wrapper, cfg, 8)
    full = mk_state({"seg": seg_params, "prior": prior_stack})
    held, aux_held = segment(
        full, px, gt, smask, rmask, jnp.asarray([True, True, False])
    )
    two = mk_state({"seg": seg_params, "prior": sel2(prior_stack)})
    ref, aux_ref = segment(two, px[:2], gt[:2], smask[:2], rmask[:2],
                           jnp.asarray([True, True]))

    # shared seg: val image contributed nothing to the gradient mean
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(held.params["seg"])[0]),
        np.asarray(jax.tree_util.tree_leaves(ref.params["seg"])[0]),
        atol=1e-6,
    )
    # train priors identical across the two runs
    assert np.allclose(
        np.asarray(jax.tree_util.tree_leaves(
            sel2(held.params["prior"]))[0]),
        np.asarray(jax.tree_util.tree_leaves(ref.params["prior"])[0]),
        atol=1e-6,
    )
    # val prior bit-identical to its init
    val_new = jax.tree_util.tree_map(lambda x: x[2], held.params["prior"])
    val_old = jax.tree_util.tree_map(lambda x: x[2], prior_stack)
    assert _leaves_equal(val_new, val_old)
    # per-image loss history: (B, L), val row finite
    assert np.asarray(aux_held["loss_hist"]).shape == (3, 8)


def _split_runner(tmp_path, n=4):
    from awesome_tpu.runner.config import AwesomeConfig
    from awesome_tpu.runner.runner import AwesomeRunner

    cfg = AwesomeConfig(
        name_experiment="holdout",
        runs_path=str(tmp_path),
        num_epochs=20,
        dataset_args={"dimension": "2d", "n": n, "h": 20, "w": 20,
                      "split_ratio": 0.75},
        optimizer_args={"lr": 0.02},
        validation_each_nth_epoch=10,
        compute_metrics_during_training_nth_epoch=0,
    )
    return AwesomeRunner(cfg)


def test_runner_holdout_end_to_end(tmp_path):
    runner = _split_runner(tmp_path)
    runner.build()
    assert runner.val_indices, "split must hold out at least one image"
    init_params = runner.stacked_params
    sel = lambda t, i: jax.tree_util.tree_map(lambda x: x[i], t)
    frozen_before = [sel(init_params, i) for i in runner.val_indices]
    res = runner.train()
    for i, before in zip(runner.val_indices, frozen_before):
        after = sel(runner.stacked_params, i)
        assert _leaves_equal(after, before), (
            f"val image {i} was trained"
        )
    # best-model keys off held-out val loss
    assert runner.tracker.primary_mode == "val"
    assert runner.best_params is not None
    assert runner.tracker.get_best_performance() is not None
    # split-aware eval metrics
    m = runner.evaluate()
    assert "val/MeanForegroundBinaryMIOU" in m
    assert "train/MeanForegroundBinaryMIOU" in m


def test_runner_holdout_multi_mode(tmp_path):
    from awesome_tpu.runner.config import AwesomeConfig
    from awesome_tpu.runner.runner import AwesomeRunner

    cfg = AwesomeConfig(
        name_experiment="holdout_multi",
        runs_path=str(tmp_path),
        num_epochs=10,
        segmentation_training_mode="multi",
        dataset_args={"dimension": "2d", "n": 4, "h": 20, "w": 20,
                      "split_ratio": 0.75},
        optimizer_args={"lr": 0.02},
        validation_each_nth_epoch=5,
        compute_metrics_during_training_nth_epoch=0,
    )
    runner = AwesomeRunner(cfg)
    runner.build()
    res = runner.train()
    assert runner.val_indices
    # per-image loss history covers all images
    assert res["loss_hist"].shape[0] == 4
    assert np.isfinite(res["loss_hist"]).all()
    m = res["final_metrics"]
    assert "val/MeanForegroundBinaryMIOU" in m


def test_reuse_state_pretrain_keeps_skipped_priors(tmp_path):
    """The reuse_state pretrain must NOT leak the previous image's fitted
    prior into skipped (val-holdout) slots — they keep their own params."""
    from awesome_tpu.runner.config import AwesomeConfig
    from awesome_tpu.runner.runner import AwesomeRunner

    cfg = AwesomeConfig(
        name_experiment="seq_skip",
        runs_path=str(tmp_path),
        num_epochs=4,
        dataset_args={"dimension": "2d", "n": 4, "h": 16, "w": 16,
                      "split_ratio": 0.75},
        optimizer_args={"lr": 0.02},
        pretrain_args={"reuse_state": True, "num_epochs": 10,
                       "reuse_state_epochs": 4},
        do_pretraining=True,
        compute_metrics_during_training_nth_epoch=0,
    )
    runner = AwesomeRunner(cfg)
    runner.build()
    assert runner.val_indices
    before = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), runner.stacked_params["prior"]
    )
    runner.pretrain()
    after = runner.stacked_params["prior"]
    sel = lambda t, i: jax.tree_util.tree_map(lambda x: np.asarray(x)[i], t)
    for i in runner.val_indices:
        for a, b in zip(jax.tree_util.tree_leaves(sel(after, i)),
                        jax.tree_util.tree_leaves(sel(before, i))):
            assert np.array_equal(a, b), f"val image {i} prior was altered"
    # at least one train image's prior was actually fitted (individual
    # train images may legitimately skip when the fresh seg's unaries are
    # single-valued, `path_connected_net.py:848-855`)
    any_changed = any(
        any(
            not np.array_equal(a, b)
            for a, b in zip(jax.tree_util.tree_leaves(sel(after, i)),
                            jax.tree_util.tree_leaves(sel(before, i)))
        )
        for i in runner.train_indices
    )
    assert any_changed, "no train image's prior was fitted"
