"""Round-2 runner handle wiring: validation cadence + best-model
checkpointing, CRF'd eval metrics, periodic image dumps, pretrain
orchestration with state load/save, and segmentation_training_mode
'none'/'multi'. Spec: `awesome/run/awesome_runner.py:294-475`,
`awesome/agent/torch_agent.py:553-607`."""
import os

import numpy as np

from awesome_tpu.runner.config import AwesomeConfig
from awesome_tpu.runner.runner import AwesomeRunner


def _config(tmp_path, **kw):
    base = dict(
        name_experiment="handles",
        dataset_args={"n": 3, "h": 24, "w": 24},
        segmentation_model_args={"n_hidden": 16},
        prior_model_args={"n_hidden": 12, "n_hidden_layers": 1},
        optimizer_type="adam",
        optimizer_args={"lr": 0.02},
        num_epochs=40,
        compute_metrics_during_training_nth_epoch=20,
        validation_each_nth_epoch=20,
        runs_path=str(tmp_path),
        seed=5,
    )
    base.update(kw)
    return AwesomeConfig(**base)


def test_best_model_and_periodic_checkpoints(tmp_path):
    runner = AwesomeRunner(_config(tmp_path))
    runner.build()
    res = runner.train()
    assert np.isfinite(res["loss_hist"]).all()
    # nth-epoch + end + best checkpoints exist
    ck = os.path.join(runner.output_folder, "checkpoints")
    assert os.path.isdir(os.path.join(ck, "latest"))
    assert os.path.isdir(os.path.join(ck, "end"))
    assert os.path.isdir(os.path.join(ck, "best"))
    assert runner.best_params is not None
    # eval metrics were tracked during training (cadence handle)
    series = runner.tracker.series
    assert ("MeanForegroundBinaryMIOU", "epoch", "eval") in series
    # prior cache saved alongside the checkpoint
    assert os.path.exists(os.path.join(ck, "end", "prior_cache.npz"))


def test_validation_split_and_val_metric(tmp_path):
    cfg = _config(tmp_path)
    cfg.dataset_args["split_ratio"] = 0.67  # 2 train / 1 val of 3 images
    runner = AwesomeRunner(cfg)
    runner.build()
    assert len(runner.train_indices) == 2 and len(runner.val_indices) == 1
    runner.train()
    assert ("Loss", "epoch", "val") in runner.tracker.series
    # best-model gate keyed on the val metric
    assert runner.tracker.primary_mode == "val"


def test_pretrain_orchestration_saves_then_loads(tmp_path):
    cfg = _config(tmp_path, do_pretraining=True,
                  pretrain_args={"num_epochs": 30, "lr": 1e-2})
    runner = AwesomeRunner(cfg)
    runner.build()
    res = runner.pretrain()
    assert res is not None and res["loaded"] is False
    assert os.path.exists(res["path"])
    # a second runner pointed at the saved state loads instead of fitting
    cfg2 = _config(tmp_path, do_pretraining=True,
                   pretrain_state_path=res["path"])
    runner2 = AwesomeRunner(cfg2)
    runner2.build()
    res2 = runner2.pretrain()
    assert res2["loaded"] is True
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(runner.stacked_params["prior"]),
        jax.tree_util.tree_leaves(runner2.stacked_params["prior"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pretraining_disabled_is_noop(tmp_path):
    runner = AwesomeRunner(_config(tmp_path, do_pretraining=False))
    runner.build()
    assert runner.pretrain() is None


def test_crf_with_metrics(tmp_path):
    runner = AwesomeRunner(_config(tmp_path, compute_crf_with_metrics=True))
    runner.build()
    metrics = runner.evaluate()
    assert "CRFMeanForegroundBinaryMIOU" in metrics
    assert 0.0 <= metrics["CRFMeanForegroundBinaryMIOU"] <= 1.0


def test_image_dumps_during_training(tmp_path):
    cfg = _config(
        tmp_path,
        plot_indices_during_training=[0, 1],
        plot_indices_during_training_nth_epoch=20,
        plot_final_indices=-1,
        include_unaries_when_saving=True,
    )
    runner = AwesomeRunner(cfg)
    runner.build()
    runner.train()
    out = runner.output_folder
    # dumps at epoch 0 and 20 for plotted indices, final dump for all
    assert os.path.isdir(os.path.join(out, "output", "000", "e00000"))
    assert os.path.isdir(os.path.join(out, "output", "001", "e00020"))
    final0 = os.path.join(out, "final", "002", "e00040")
    assert os.path.isdir(final0)
    assert any("unaries" in f for f in os.listdir(final0))


def test_segmentation_training_mode_none_freezes_seg(tmp_path):
    import jax

    runner = AwesomeRunner(_config(tmp_path, segmentation_training_mode="none",
                                   num_epochs=20))
    runner.build()
    before = jax.tree_util.tree_leaves(runner.stacked_params["seg"])
    runner.train()
    after = jax.tree_util.tree_leaves(runner.stacked_params["seg"])
    for a, b in zip(after, before):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # priors still trained
    pb = jax.tree_util.tree_leaves(runner.stacked_params["prior"])
    assert all(np.isfinite(np.asarray(x)).all() for x in pb)


def test_segmentation_training_mode_multi_shares_seg(tmp_path):
    import jax

    runner = AwesomeRunner(_config(tmp_path, segmentation_training_mode="multi",
                                   num_epochs=20))
    runner.build()
    res = runner.train()
    assert np.isfinite(res["loss_hist"]).all()
    # ONE shared seg tree (no leading image axis), stacked priors
    seg_leaf = jax.tree_util.tree_leaves(runner.stacked_params["seg"])[0]
    prior_leaf = jax.tree_util.tree_leaves(runner.stacked_params["prior"])[0]
    assert prior_leaf.shape[0] == 3
    assert seg_leaf.shape[0] != 3 or seg_leaf.ndim == 1
    metrics = runner.evaluate()
    assert 0.0 <= metrics["MeanForegroundBinaryMIOU"] <= 1.0


def test_force_pretrain_refits_despite_saved_state(tmp_path):
    cfg = _config(tmp_path, do_pretraining=True,
                  pretrain_args={"num_epochs": 20, "lr": 1e-2})
    runner = AwesomeRunner(cfg)
    runner.build()
    res = runner.pretrain()
    assert res["loaded"] is False
    cfg2 = _config(tmp_path, do_pretraining=True, force_pretrain=True,
                   pretrain_state_path=res["path"],
                   pretrain_args={"num_epochs": 20, "lr": 1e-2})
    runner2 = AwesomeRunner(cfg2)
    runner2.build()
    res2 = runner2.pretrain()
    assert res2["loaded"] is False  # refit, not loaded


def test_segmentation_state_dict_warm_start(tmp_path):
    import jax

    from awesome_tpu.fit.checkpoint import save_pytree

    r1 = AwesomeRunner(_config(tmp_path))
    r1.build()
    seg0 = jax.tree_util.tree_map(lambda x: x[0], r1.stacked_params["seg"])
    sd = str(tmp_path / "seg_state")
    save_pytree(seg0, sd)
    r2 = AwesomeRunner(_config(tmp_path,
                               segmentation_model_state_dict_path=sd))
    r2.build()
    import numpy as np

    for a, b in zip(
        jax.tree_util.tree_leaves(r2.stacked_params["seg"]),
        jax.tree_util.tree_leaves(r1.stacked_params["seg"]),
    ):
        # every image slot warm-started from r1's image-0 seg params
        for i in range(a.shape[0]):
            np.testing.assert_allclose(np.asarray(a[i]), np.asarray(b[0]),
                                       atol=1e-7)


def test_persisted_split_indices(tmp_path):
    cfg = _config(tmp_path)
    cfg.dataset_args["split_ratio"] = 0.67
    cfg.dataset_args["indices_file"] = str(tmp_path / "split.json")
    r1 = AwesomeRunner(cfg)
    r1.build()
    # a rerun with a different seed still reads the persisted split
    cfg2 = _config(tmp_path, seed=99)
    cfg2.dataset_args["split_ratio"] = 0.67
    cfg2.dataset_args["indices_file"] = str(tmp_path / "split.json")
    r2 = AwesomeRunner(cfg2)
    r2.build()
    assert r1.train_indices == r2.train_indices
    assert r1.val_indices == r2.val_indices


def test_composable_handles_library(tmp_path):
    """handles.py predicates + factories attach to the runner loop.
    Spec: `awesome/run/handles.py:25-477`."""
    from awesome_tpu.runner import handles as H

    runner = AwesomeRunner(_config(tmp_path, num_epochs=40))
    runner.build()
    fired = []
    runner.handles["epoch_processed"].append(
        H.compute_eval_metrics_handle(
            only_execute_on=H.callable_or(
                H.only_nth_epoch(40), H.only_training_done()
            )
        )
    )
    runner.handles["epoch_processed"].append(
        lambda r, e: fired.append(e)
    )
    runner.train()
    assert fired  # custom handle ran each segment
    # predicate semantics
    p = H.callable_and(H.only_nth_epoch(20), H.only_nth_epoch(10))
    assert p(runner, 40) and not p(runner, 10)
    assert H.only_training_done()(runner, 40)
    assert not H.only_training_done()(runner, 39)
    runner.training_error = RuntimeError("x")
    assert H.on_training_error(True)(runner)
    assert not H.on_training_error(False)(runner)


def test_multi_mode_pretrain_seeds_shared_training(tmp_path):
    """'multi' mode: pretrain builds the shared state, fits the stacked
    priors, and train() reuses them instead of fresh inits."""
    import jax

    cfg = _config(tmp_path, segmentation_training_mode="multi",
                  do_pretraining=True, num_epochs=20,
                  pretrain_args={"num_epochs": 20, "lr": 1e-2})
    runner = AwesomeRunner(cfg)
    runner.build()
    res = runner.pretrain()
    assert res is not None and res["loaded"] is False
    pre_prior = jax.tree_util.tree_leaves(runner.stacked_params["prior"])[0]
    runner.train()
    # priors continued from the pretrained values (not re-initialized):
    # finite + correct stacking
    post_prior = jax.tree_util.tree_leaves(runner.stacked_params["prior"])[0]
    assert post_prior.shape == pre_prior.shape
    assert np.isfinite(np.asarray(post_prior)).all()


def test_crf_after_pretraining(tmp_path):
    cfg = _config(tmp_path, do_pretraining=True,
                  compute_crf_after_pretraining=True,
                  pretrain_args={"num_epochs": 20, "lr": 1e-2})
    runner = AwesomeRunner(cfg)
    runner.build()
    res = runner.pretrain()
    assert "metrics" in res
    assert "CRFMeanForegroundBinaryMIOU" in res["metrics"]
