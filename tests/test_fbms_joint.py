"""run_fbms_unet_joint parity: joint UNet + per-frame prior training on a
synthetic sequence through FBMSRunner."""
import numpy as np

from awesome_tpu.runner.fbms_runner import FBMSExperimentConfig, FBMSRunner
from tests.test_fbms import _write_sequence


def test_fbms_joint_training(tmp_path):
    seq = _write_sequence(tmp_path)
    cfg = FBMSExperimentConfig(
        dataset_path=seq, num_epochs=10, lr=2e-3,
        prior_hidden_units=8, prior_flows=2,
        convex_hidden_units=12, convex_hidden_layers=1,
    )
    runner = FBMSRunner(cfg).build()
    res = runner.train_joint(num_epochs=4, lr=1e-3, prior_lr=1e-3,
                             batch_size=2)
    losses = res["loss"]
    # 4 epochs x 3 batches of 2 (5 frames; the tail batch is bucket-padded
    # at weight 0 instead of dropped, so every frame trains every epoch)
    assert len(losses) == 4 * 3
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 1.5  # not diverging
    # state carries per-frame priors + UNet
    import jax

    leaves = jax.tree_util.tree_leaves(runner.joint_state.prior_params)
    assert leaves[0].shape[0] == 5


def test_joint_pretrain_then_train_and_evaluate(tmp_path):
    """Reference flow: per-frame prior PRETRAIN (cold + reuse_state warm
    starts) seeds the joint training; evaluate_joint reports seg+prior IoU
    on GT frames."""
    import jax

    seq = _write_sequence(tmp_path)
    cfg = FBMSExperimentConfig(
        dataset_path=seq, prior_hidden_units=8, prior_flows=2,
        convex_hidden_units=12, convex_hidden_layers=1,
    )
    runner = FBMSRunner(cfg).build()
    pre = runner.pretrain_joint_priors(num_steps=60, reuse_state_steps=20,
                                       lr=5e-3)
    assert np.isfinite(pre["cold_loss"])
    leaves = jax.tree_util.tree_leaves(runner.joint_prior_init)
    assert leaves[0].shape[0] == len(runner.dataset)
    res = runner.train_joint(num_epochs=2, lr=1e-3, prior_lr=1e-3,
                             batch_size=2)
    assert np.isfinite(res["loss"]).all()
    # the trained state starts from the pretrained priors
    m = runner.evaluate_joint()
    assert m["num_gt_frames"] >= 1
    assert 0.0 <= m["PriorMeanForegroundBinaryMIOU"] <= 1.0
    assert 0.0 <= m["MeanForegroundBinaryMIOU"] <= 1.0


def test_pretrain_from_config_with_prefits_and_zoo(tmp_path):
    """The joint YAML's pretrain_args drive the per-image pretrain:
    reuse_state epochs, flow-identity prefit (Zoo-cached) and the convex
    circle prefit."""
    import os

    from awesome_tpu.nn.zoo import Zoo
    from awesome_tpu.runner.reference_import import load_reference_config

    path = ("/root/reference/config/path-connectedness/joint/"
            "UNET+cars3+edge+diffeo+original+joint.yaml")
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference configs not present")
    from awesome_tpu.runner.fbms_runner import FBMSRunner

    cfg, _ = load_reference_config(path)
    assert cfg.pretrain_args["prefit_flow_net_identity"] is True
    assert cfg.pretrain_args["prefit_convex_net"] is True
    seq = _write_sequence(tmp_path)
    cfg.prior_model_args.update(
        hidden_units=8, flow_n_flows=2, convex_net_hidden_units=12,
        convex_net_hidden_layers=1,
    )
    runner = FBMSRunner.from_awesome_config(cfg, dataset_path=seq)
    runner.build()
    zoo = Zoo(str(tmp_path / "zoo"))
    res = runner.pretrain_joint_priors_from_config(
        zoo=zoo, num_steps=30, reuse_state_steps=10,
        prefit_flow_identity_steps=20, prefit_convex_steps=20,
    )
    assert np.isfinite(res["cold_loss"])
    # zoo cached the flow-identity prefit
    assert any(f.endswith(".npz") for f in os.listdir(str(tmp_path / "zoo")))
    # a second run hits the cache (same result path, no error)
    runner2 = FBMSRunner.from_awesome_config(cfg, dataset_path=seq)
    runner2.build()
    res2 = runner2.pretrain_joint_priors_from_config(
        zoo=zoo, num_steps=30, reuse_state_steps=10,
        prefit_flow_identity_steps=20, prefit_convex_steps=20,
    )
    assert np.isfinite(res2["cold_loss"])


def test_joint_eval_cadence_and_best_model(tmp_path):
    """In-training eval cadence + best-model capture + checkpoints during
    joint FBMS training (the reference's
    compute_metrics_during_training_nth_epoch handle,
    `run/handles.py:339-477`)."""
    import os

    import numpy as np

    from awesome_tpu.runner.fbms_runner import (
        FBMSExperimentConfig,
        FBMSRunner,
    )
    from tests.test_fbms import _write_sequence

    seq = _write_sequence(tmp_path)
    cfg = FBMSExperimentConfig(
        dataset_path=str(seq), prior_hidden_units=8, prior_flows=2,
        convex_hidden_units=12, convex_hidden_layers=1,
    )
    runner = FBMSRunner(cfg)
    runner.build()
    ckpt = str(tmp_path / "ckpts")
    res = runner.train_joint(
        num_epochs=4, batch_size=2, eval_nth_epoch=2, checkpoint_dir=ckpt,
    )
    assert np.isfinite(res["loss"]).all()
    tr = runner.joint_tracker
    assert tr.primary_metric == "MeanForegroundBinaryMIOU"
    assert tr.get_best_performance() is not None
    assert runner.best_joint_state is not None
    assert os.path.isdir(os.path.join(ckpt, "end"))
    assert os.path.isdir(os.path.join(ckpt, "best"))


def test_joint_lr_scheduler_and_watchdog(tmp_path):
    """Epoch-level StepLR decay reaches the compiled joint step through a
    traced scale, and the LR watchdog stops training once the decayed LR
    hits the floor (the refit-unet family's use_step_lr_scheduler +
    use_lr_stop_training_watchdog flags)."""
    import numpy as np

    from awesome_tpu.runner.fbms_runner import (
        FBMSExperimentConfig,
        FBMSRunner,
    )
    from tests.test_fbms import _write_sequence

    seq = _write_sequence(tmp_path)
    cfg = FBMSExperimentConfig(
        dataset_path=str(seq), prior_hidden_units=8, prior_flows=2,
        convex_hidden_units=12, convex_hidden_layers=1,
    )
    runner = FBMSRunner(cfg)
    runner.build()
    res = runner.train_joint(
        num_epochs=10, batch_size=2, lr=1e-3, prior_lr=1e-3,
        scheduler={"type": "step", "gamma": 0.1, "step_size": 2},
        watchdog_lr=1e-6,
    )
    # lr decays x0.1 every 2 epochs: 1e-3 -> 1e-6 after 6 epochs -> stop
    assert res["stopped_early"] is True
    assert len(res["loss"]) < 10 * 3  # fewer than 10 epochs of batches
    assert np.isfinite(res["loss"]).all()
    assert res["final_lr_scale"] <= 1e-3 + 1e-12


def test_scheduler_from_config():
    from awesome_tpu.runner.config import AwesomeConfig
    from awesome_tpu.runner.fbms_runner import FBMSRunner

    cfg = AwesomeConfig(
        use_step_lr_scheduler=True,
        step_lr_scheduler_args={"gamma": 0.5, "step_size": 7},
    )
    s = FBMSRunner._scheduler_from_config(cfg)
    assert s == {"type": "step", "gamma": 0.5, "step_size": 7}
    cfg2 = AwesomeConfig(
        use_lr_on_plateau_scheduler=True,
        lr_on_plateau_scheduler_args={"factor": 0.2, "patience": 3},
    )
    s2 = FBMSRunner._scheduler_from_config(cfg2)
    assert s2 == {"type": "plateau", "factor": 0.2, "patience": 3,
                  "threshold": 1e-4}
    assert FBMSRunner._scheduler_from_config(AwesomeConfig()) is None


def test_export_tensorboard(tmp_path):
    import os

    from awesome_tpu.runner.fbms_runner import (
        FBMSExperimentConfig,
        FBMSRunner,
    )
    from tests.test_fbms import _write_sequence

    seq = _write_sequence(tmp_path)
    cfg = FBMSExperimentConfig(
        dataset_path=str(seq), prior_hidden_units=8, prior_flows=2,
        convex_hidden_units=12, convex_hidden_layers=1,
    )
    runner = FBMSRunner(cfg)
    runner.build()
    runner.train_joint(num_epochs=2, batch_size=2, eval_nth_epoch=1)
    out = runner.export_tensorboard(str(tmp_path / "tb"))
    assert os.path.isdir(out)
    assert any(os.scandir(out))


def test_joint_plot_dumps(tmp_path):
    """Periodic qualitative frame dumps during joint training
    (`awesome_runner.py:304-333` _save_image parity for the FBMS path)."""
    import os

    from awesome_tpu.runner.fbms_runner import (
        FBMSExperimentConfig,
        FBMSRunner,
    )
    from tests.test_fbms import _write_sequence

    seq = _write_sequence(tmp_path)
    cfg = FBMSExperimentConfig(
        dataset_path=str(seq), prior_hidden_units=8, prior_flows=2,
        convex_hidden_units=12, convex_hidden_layers=1,
    )
    runner = FBMSRunner(cfg)
    runner.build()
    out = str(tmp_path / "plots")
    runner.train_joint(
        num_epochs=2, batch_size=2,
        plot_indices=[0, 2], plot_nth_epoch=1, plot_dir=out,
    )
    for idx in (0, 2):
        d = os.path.join(out, f"{idx:03d}")
        assert os.path.isdir(d)
        assert len(os.listdir(d)) == 2  # one dump per epoch


def test_fbms_eval_table_roundtrip(tmp_path):
    """The fbms_eval_icml pipeline in miniature: joint training with an
    epoch-0 Baseline eval + CRF-refined metrics, persisted via
    save_joint_results, reloaded through ResultModel, and the notebook's
    Baseline(0)/Joint(last) columns extracted by epoch index
    (`notebooks/fbms_eval_icml.ipynb` index_mapping, col_mapping)."""
    import os

    import pytest

    from awesome_tpu.analytics.result_model import ResultModel
    from awesome_tpu.runner.fbms_runner import FBMSRunner
    from awesome_tpu.runner.reference_import import load_reference_config

    path = ("/root/reference/config/path-connectedness/joint/"
            "UNET+cars3+edge+diffeo+original+joint.yaml")
    if not os.path.exists(path):
        pytest.skip("reference configs not present")
    cfg, _ = load_reference_config(path)
    cfg.runs_path = str(tmp_path / "runs")
    cfg.compute_crf_with_metrics = True
    # cadence 2: eval ticks at epoch 2 (cadence) and 3 (final) — the
    # series must be indexed by TRAINING epoch, not by tick count
    cfg.compute_metrics_during_training_nth_epoch = 2
    cfg.prior_model_args.update(
        hidden_units=8, flow_n_flows=2, convex_net_hidden_units=12,
        convex_net_hidden_layers=1,
    )
    seq = _write_sequence(tmp_path)
    runner = FBMSRunner.from_awesome_config(cfg, dataset_path=seq)
    runner.build()
    res = runner.train_joint_from_config(num_epochs=3, eval_epoch0=True)
    assert np.isfinite(res["loss"]).all()
    out = runner.save_joint_results(str(tmp_path / "run_dir"))

    m = ResultModel.from_path(out)
    base = m.metric_at_epoch("MeanForegroundBinaryMIOU", 0)
    joint = m.metric("MeanForegroundBinaryMIOU", selection="last")
    assert base is not None and 0.0 <= base <= 1.0
    assert joint is not None and 0.0 <= joint <= 1.0
    # the notebook's epoch indexing: baseline 0, evals at true epochs
    s = runner.joint_tracker.series[
        ("MeanForegroundBinaryMIOU", "epoch", "eval")]
    assert s.steps == [0, 2, 3], s.steps
    assert m.metric_at_epoch("MeanForegroundBinaryMIOU", 1) is None
    assert m.metric_at_epoch("MeanForegroundBinaryMIOU", 3) == joint
    # CRF columns recorded at every eval tick incl. the baseline
    crf0 = m.metric_at_epoch("CRFMeanForegroundBinaryMIOU", 0)
    assert crf0 is not None and 0.0 <= crf0 <= 1.0
    acc = m.metric_at_epoch("MeanPixelAccuracy", 0)
    assert acc is not None and 0.0 <= acc <= 1.0
    # absent epochs return None, not a crash
    assert m.metric_at_epoch("MeanForegroundBinaryMIOU", 99) is None
