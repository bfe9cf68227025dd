"""End-to-end execution of UNMODIFIED reference YAML configs (VERDICT #5):
load the original experiment files from /root/reference/config, build the
runner, train on the synthetic replica (real data is download-only /
zero-egress), and produce metrics.

- convexity sequential: `config/convexity/sequential/CNNET_benchmark+xy+convex.yaml`
  (CNNNet rgbxy image mode + ConvexNet prior, gradient penalty, 'single')
- flagship joint: `config/path-connectedness/joint/
  UNET+cars3+edge+diffeo+original+joint.yaml` (UNet + RealNVP
  path-connected priors, 'multi')
"""
import os

import numpy as np
import pytest

from awesome_tpu.runner.reference_import import load_reference_config
from awesome_tpu.runner.runner import AwesomeRunner

REF = "/root/reference/config"
CNNET = os.path.join(REF, "convexity/sequential/CNNET_benchmark+xy+convex.yaml")
JOINT = os.path.join(
    REF, "path-connectedness/joint/UNET+cars3+edge+diffeo+original+joint.yaml"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference configs not present"
)


def test_cnnet_convexity_yaml_end_to_end(tmp_path):
    cfg, extra = load_reference_config(CNNET)
    # verify the import picked up the experiment's defining fields
    assert cfg.segmentation_model_type == "awesome_tpu.nn.seg.CNNNet"
    assert cfg.prior_model_type == "awesome_tpu.nn.icnn.ConvexNet"
    assert cfg.optimizer_type == "adam"
    assert cfg.optimizer_args["lr"] == 0.02
    assert cfg.use_extra_penalty_hook is True
    assert cfg.dataset_args["dimension"] == "3d"
    assert cfg.num_epochs == 3000
    # shrink ONLY the cost knobs for CI; semantics stay the reference's
    cfg.num_epochs = 40
    cfg.extra_penalty_after_n_epochs = 20
    cfg.compute_metrics_during_training_nth_epoch = 20
    cfg.dataset_args["n"] = 2
    cfg.dataset_args["h"] = cfg.dataset_args["w"] = 24
    cfg.runs_path = str(tmp_path)

    runner = AwesomeRunner(cfg)
    runner.build()
    # image mode active (dimension 3d) with a conv seg net + gradient penalty
    assert runner.image_mode is True
    assert runner.wrapper.segmentation_module.__class__.__name__ == "CNNNet"
    assert runner.wrapper.segmentation_module.in_type == "rgbxy"
    assert runner._gp_weights() == (0.01, 0.01)
    res = runner.train()
    assert np.isfinite(res["loss_hist"]).all()
    metrics = res["final_metrics"]
    assert 0.0 <= metrics["MeanForegroundBinaryMIOU"] <= 1.0
    assert "PriorMeanForegroundBinaryMIOU" in metrics


def test_joint_fbms_yaml_end_to_end(tmp_path):
    from awesome_tpu.runner.fbms_runner import FBMSRunner
    from tests.test_fbms import _write_sequence

    cfg, extra = load_reference_config(JOINT)
    assert cfg.prior_model_type == (
        "awesome_tpu.nn.path_connected.real_nvp_path_connected_net"
    )
    assert cfg.prior_model_args["flow_n_flows"] == 12
    assert cfg.prior_model_args["flow_output_fn"] == "tanh"
    assert cfg.segmentation_training_mode == "multi"
    assert cfg.loss_args["alpha"] == 1 and cfg.loss_args["beta"] == 1
    assert cfg.use_segmentation_output_inversion is True
    assert cfg.num_epochs == 15
    # tiny synthetic sequence replica; shrink prior for CI speed
    seq = _write_sequence(tmp_path)
    cfg.runs_path = str(tmp_path)  # per-epoch checkpoints stay out of cwd
    cfg.prior_model_args.update(
        hidden_units=8, flow_n_flows=2, convex_net_hidden_units=12,
        convex_net_hidden_layers=1,
    )
    runner = FBMSRunner.from_awesome_config(cfg, dataset_path=seq)
    runner.build()
    res = runner.train_joint_from_config(num_epochs=2)
    losses = np.asarray(res["loss"])
    assert losses.size > 0 and np.isfinite(losses).all()
    # per-frame priors + shared UNet exist in the joint state
    import jax

    leaves = jax.tree_util.tree_leaves(runner.joint_state.prior_params)
    assert leaves[0].shape[0] == len(runner.dataset)


@pytest.mark.parametrize("name,xytype", [
    ("FCNET_benchmark+feat+convex.yaml", "feat"),
    ("FCNET_benchmark+featxy+convex.yaml", "featxy"),
    ("FCNET_benchmark+xy+convex.yaml", "xy"),
])
def test_fcnet_sequential_yaml_families(tmp_path, name, xytype):
    """The FCNET sequential families (2d pixel mode, xytype feature
    encodings incl. the feature-space convex prior) run end-to-end from
    their unmodified YAMLs."""
    cfg, extra = load_reference_config(
        os.path.join(REF, "convexity/sequential", name)
    )
    assert cfg.segmentation_model_type == "awesome_tpu.nn.seg.FCNet"
    assert cfg.dataset_args["xytype"] == xytype
    assert cfg.dataset_args["dimension"] == "2d"
    cfg.num_epochs = 20
    cfg.compute_metrics_during_training_nth_epoch = 20
    cfg.dataset_args["n"] = 2
    cfg.dataset_args["h"] = cfg.dataset_args["w"] = 20
    cfg.runs_path = str(tmp_path)
    runner = AwesomeRunner(cfg)
    runner.build()
    assert runner.image_mode is False
    expected_enc = {"xy": 2, "feat": 2, "featxy": 4}[xytype]
    assert runner._batch["px"].shape[-1] == expected_enc + 3
    res = runner.train()
    assert np.isfinite(res["loss_hist"]).all()
    m = res["final_metrics"]
    assert 0.0 <= m["MeanForegroundBinaryMIOU"] <= 1.0
    # the prior consumed the first two (encoding) channels
    assert "PriorMeanForegroundBinaryMIOU" in m


def test_cnnet_joint_yaml_end_to_end(tmp_path):
    """Convexity JOINT family: image mode + AwesomeImageLossJoint
    (gamma/beta extra-penalty scales) + gradient penalty + reduce-lr hook,
    from the unmodified YAML."""
    cfg, extra = load_reference_config(
        os.path.join(REF, "convexity/joint/CNNET_benchmark+xy+convex+joint.yaml")
    )
    assert cfg.loss_type == "awesome_loss_joint"
    assert cfg.use_extra_penalty_hook is True
    assert cfg.use_reduce_lr_in_extra_penalty_hook is True
    cfg.num_epochs = 30
    cfg.extra_penalty_after_n_epochs = 15
    cfg.compute_metrics_during_training_nth_epoch = 30
    cfg.dataset_args["n"] = 2
    cfg.dataset_args["h"] = cfg.dataset_args["w"] = 20
    cfg.runs_path = str(tmp_path)
    runner = AwesomeRunner(cfg)
    runner.build()
    assert runner.image_mode is True
    # joint loss -> (gamma, beta) extra-penalty scales from loss_args
    assert runner._penalty_scales() == (
        float(cfg.loss_args.get("gamma", 1.0)),
        float(cfg.loss_args.get("beta", 1.0)),
    )
    res = runner.train()
    assert np.isfinite(res["loss_hist"]).all()
    assert 0.0 <= res["final_metrics"]["MeanForegroundBinaryMIOU"] <= 1.0


def test_refit_prior_only_yaml_end_to_end(tmp_path):
    """refit-unet-prior-only family: pretrain_only + frozen segmentation
    ('none') — per-frame prior refits against a fixed UNet, from the
    unmodified YAML on the synthetic sequence."""
    from awesome_tpu.runner.fbms_runner import FBMSRunner
    from tests.test_fbms import _write_sequence

    cfg, extra = load_reference_config(os.path.join(
        REF, "path-connectedness/refit-unet-prior-only/"
        "UNET+cars3+edge+diffeo+only_prior.yaml"
    ))
    assert cfg.pretrain_only is True
    assert cfg.do_pretraining is True
    assert cfg.segmentation_training_mode == "none"
    assert cfg.loss_type == "fbms_joint_loss"
    seq = _write_sequence(tmp_path)
    cfg.runs_path = str(tmp_path)  # per-epoch checkpoints stay out of cwd
    cfg.prior_model_args.update(
        hidden_units=8, flow_n_flows=2, convex_net_hidden_units=12,
        convex_net_hidden_layers=1,
    )
    runner = FBMSRunner.from_awesome_config(cfg, dataset_path=seq)
    runner.build()
    # pretrain-only flow: fit per-frame priors, then a short frozen-seg
    # joint pass must leave the UNet untouched
    runner.pretrain_joint_priors(num_steps=30, reuse_state_steps=10, lr=5e-3)
    res = runner.train_joint_from_config(num_epochs=1)
    assert np.isfinite(res["loss"]).all()
    assert int(runner.joint_state.step) > 0


def test_spatiotemporal_yaml_end_to_end(tmp_path):
    """Spatio-temporal family: ONE shared (x, y, t) prior for the whole
    sequence (channels: 3), from the unmodified YAML."""
    from awesome_tpu.runner.fbms_runner import FBMSRunner
    from tests.test_fbms import _write_sequence

    cfg, extra = load_reference_config(os.path.join(
        REF, "path-connectedness/spatio-temporal/"
        "UNET+cars3+edge+diffeo+spatio-temporal+realnvp.yaml"
    ))
    assert cfg.prior_model_args["channels"] == 3
    assert cfg.dataset_args.get("spatio_temporal") is True
    seq = _write_sequence(tmp_path)
    cfg.prior_model_args.update(
        hidden_units=8, flow_n_flows=3, convex_net_hidden_units=12,
        convex_net_hidden_layers=1,
    )
    runner = FBMSRunner.from_awesome_config(cfg, dataset_path=seq)
    runner.build()
    # the shared-prior pretrain is the spatio-temporal fit path
    runner.config.num_epochs = 60
    res = runner.pretrain()
    assert np.isfinite(res["epoch_loss"]).all()
    m = runner.evaluate()
    assert m["num_gt_frames"] == 2
    assert 0.0 <= m["MeanForegroundBinaryMIOU"] <= 1.0


def test_noisy_spatiotemporal_yaml_noise_level(tmp_path):
    """Noisy spatio-temporal family: 'noisy_percentage' is FRAME-level
    unaries noise (reference awesome/model/noisy_path_connected_net.py:178-230
    replaces the middle round(T*pct) frames' dense unaries with garbage),
    NOT per-point label flipping — so it maps to frame_noise_percentage."""
    from awesome_tpu.runner.fbms_runner import FBMSRunner
    from tests.test_fbms import _write_sequence

    base = os.path.join(REF, "path-connectedness/noisy-spatio-temporal")
    name = [f for f in sorted(os.listdir(base)) if "np0_2" in f][0]
    cfg, extra = load_reference_config(os.path.join(base, name))
    seq = _write_sequence(tmp_path)
    runner = FBMSRunner.from_awesome_config(cfg, dataset_path=seq)
    assert runner.config.frame_noise_percentage == 0.2
    assert runner.config.flip_probability == 0.0
    cfg0, _ = load_reference_config(
        os.path.join(base, [f for f in sorted(os.listdir(base))
                            if f.endswith("np0.yaml")][0])
    )
    runner0 = FBMSRunner.from_awesome_config(cfg0, dataset_path=seq)
    assert runner0.config.frame_noise_percentage == 0.0
