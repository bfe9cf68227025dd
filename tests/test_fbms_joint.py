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
