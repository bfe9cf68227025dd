"""The last 3 reference config families e2e (VERDICT r2 #4): unmodified
YAMLs from /root/reference/config/path-connectedness/{sequential,
refit-unet, weight-decay}, run on the synthetic sequence replica.

- sequential: pretrain_only with reuse_state 400 + flow-identity/convex
  prefits + Zoo + pretrain_state_path save/load,
- refit-unet: use_prior_model false — the UNet alone retrained on weak
  labels (sssdms-weighted BCE),
- weight-decay: pretrain_only with a flow_weight_decay sweep.
"""
import os

import numpy as np
import pytest

from awesome_tpu.runner.fbms_runner import FBMSRunner
from awesome_tpu.runner.reference_import import load_reference_config
from tests.test_fbms import _write_sequence

REF = "/root/reference/config/path-connectedness"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference configs not present"
)

SMALL_PRIOR = dict(
    hidden_units=8, flow_n_flows=2, convex_net_hidden_units=12,
    convex_net_hidden_layers=1,
)


def test_sequential_family_yaml_end_to_end(tmp_path):
    """path-connectedness/sequential: pretrain_only reuse_state flow with
    prefits, Zoo cache and pretrain-state persistence."""
    cfg, extra = load_reference_config(os.path.join(
        REF, "sequential/UNET+cars3+edge+original+ep4000+refit400+realnvp.yaml"
    ))
    assert cfg.pretrain_only is True
    assert cfg.do_pretraining is True and cfg.force_pretrain is True
    assert cfg.num_epochs == 0  # no joint training in this family
    pa = cfg.pretrain_args
    assert pa["num_epochs"] == 4000 and pa["reuse_state_epochs"] == 400
    assert pa["prefit_flow_net_identity"] and pa["prefit_convex_net"]
    assert isinstance(pa.get("zoo"), dict)

    seq = _write_sequence(tmp_path)
    cfg.prior_model_args.update(SMALL_PRIOR)
    # shrink ONLY cost knobs; redirect artifact paths into tmp
    pa["zoo"] = {"zoo_folder": str(tmp_path / "zoo")}
    cfg.pretrain_state_path = str(tmp_path / "pretrain_state")
    cfg.force_pretrain = False  # exercise the state save->load round trip
    runner = FBMSRunner.from_awesome_config(cfg, dataset_path=seq)
    runner.build()
    res = runner.run_pretrain_only_from_config(
        num_steps=40, reuse_state_steps=10, lr=5e-3,
        prefit_flow_identity_steps=10, prefit_convex_steps=10,
    )
    assert res["loaded"] is False
    assert np.isfinite(res["cold_loss"])
    import jax

    leaves = jax.tree_util.tree_leaves(runner.joint_prior_init)
    assert leaves[0].shape[0] == len(runner.dataset)
    # the zoo cached the flow-identity prefit
    assert os.path.isdir(tmp_path / "zoo")
    assert any(os.scandir(tmp_path / "zoo"))
    # second run loads the persisted pretrain state instead of refitting
    runner2 = FBMSRunner.from_awesome_config(cfg, dataset_path=seq)
    runner2.build()
    res2 = runner2.run_pretrain_only_from_config(
        num_steps=40, reuse_state_steps=10, lr=5e-3,
    )
    assert res2["loaded"] is True
    a = jax.tree_util.tree_leaves(runner.joint_prior_init)
    b = jax.tree_util.tree_leaves(runner2.joint_prior_init)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_refit_unet_family_yaml_end_to_end(tmp_path):
    """path-connectedness/refit-unet: NO prior (use_prior_model false), the
    seg net is NOT frozen — 15 epochs of weighted-BCE UNet retraining."""
    cfg, extra = load_reference_config(os.path.join(
        REF, "refit-unet/UNET+cars3+edge+REFIT.yaml"
    ))
    assert cfg.use_prior_model is False
    assert cfg.do_pretraining is False
    assert cfg.segmentation_training_mode == "multi"
    assert cfg.loss_type == "weighted_loss"
    assert cfg.num_epochs == 15

    seq = _write_sequence(tmp_path)
    cfg.output_folder = str(tmp_path / "out")
    runner = FBMSRunner.from_awesome_config(cfg, dataset_path=seq)
    runner.build()
    import jax

    res = runner.train_joint_from_config(num_epochs=2)
    assert np.isfinite(res["loss"]).all()
    state = runner.joint_state
    # no prior slots exist; the UNet was actually trained
    assert jax.tree_util.tree_leaves(state.prior_params) == []
    assert int(state.step) > 0
    m = runner.evaluate_joint()
    assert "PriorMeanForegroundBinaryMIOU" in m
    assert m["PriorMeanForegroundBinaryMIOU"] == 0.0  # no prior channel
    assert 0.0 <= m["MeanForegroundBinaryMIOU"] <= 1.0


@pytest.mark.parametrize("name,wd", [
    ("WD_1_UNET+bear01+edge+diffeo+only_prior+TESTING.yaml", 1.0),
    ("WD_1e-05_UNET+bear01+edge+diffeo+only_prior+TESTING.yaml", 1e-5),
])
def test_weight_decay_family_yaml(tmp_path, name, wd):
    """path-connectedness/weight-decay: the flow_weight_decay sweep knob
    reaches the fit engine's flow param group."""
    cfg, extra = load_reference_config(os.path.join(REF, "weight-decay",
                                                    name))
    assert cfg.pretrain_only is True
    assert float(cfg.pretrain_args["flow_weight_decay"]) == wd

    seq = _write_sequence(tmp_path)
    cfg.prior_model_args.update(SMALL_PRIOR)
    runner = FBMSRunner.from_awesome_config(cfg, dataset_path=seq)
    runner.build()
    res = runner.run_pretrain_only_from_config(
        num_steps=30, reuse_state_steps=10, lr=5e-3,
        prefit_flow_identity=False, prefit_convex=False,
    )
    assert np.isfinite(res["cold_loss"])


def test_weight_decay_sweep_changes_flow_norm(tmp_path):
    """Extreme weight decay (1.0) must visibly shrink the flow weights vs
    1e-5 — proving the YAML knob is live in the optimizer."""
    import jax

    seq = _write_sequence(tmp_path)
    fitted = {}
    for name, wd in (
        ("WD_1_UNET+bear01+edge+diffeo+only_prior+TESTING.yaml", 1.0),
        ("WD_1e-05_UNET+bear01+edge+diffeo+only_prior+TESTING.yaml", 1e-5),
    ):
        cfg, _ = load_reference_config(os.path.join(REF, "weight-decay",
                                                    name))
        cfg.prior_model_args.update(SMALL_PRIOR)
        runner = FBMSRunner.from_awesome_config(cfg, dataset_path=seq)
        runner.build()
        runner.run_pretrain_only_from_config(
            num_steps=60, reuse_state_steps=10, lr=5e-3,
            prefit_flow_identity=False, prefit_convex=False,
        )
        flow = runner.joint_prior_init["flow"]
        fitted[wd] = float(np.mean([
            np.linalg.norm(np.asarray(x))
            for x in jax.tree_util.tree_leaves(flow)
        ]))
    assert fitted[1.0] < fitted[1e-5]


def test_spatio_temporal_family_yaml_end_to_end(tmp_path):
    """path-connectedness/spatio-temporal: ONE shared (x, y, t) prior for
    the whole sequence (channels=3, spatio_temporal dataset flag),
    pretrain_only — routed to FBMSRunner.pretrain's spatio-temporal
    engine. Spec: `config/path-connectedness/spatio-temporal/
    UNET+cars3+edge+diffeo+spatio-temporal+realnvp.yaml`."""
    cfg, extra = load_reference_config(os.path.join(
        REF, "spatio-temporal/UNET+cars3+edge+diffeo+spatio-temporal"
             "+realnvp.yaml"))
    assert extra == {}
    assert cfg.pretrain_only is True and cfg.num_epochs == 0
    assert (cfg.dataset_args or {}).get("spatio_temporal") is True
    assert cfg.prior_model_args.get("channels") == 3
    assert cfg.pretrain_args["prefit_flow_net_identity"]

    seq = _write_sequence(tmp_path)
    cfg.prior_model_args.update(SMALL_PRIOR)
    runner = FBMSRunner.from_awesome_config(cfg, dataset_path=seq)
    assert runner.config.flip_probability == 0.0
    runner.config.num_epochs = 30  # cost knob only
    runner.build()
    res = runner.pretrain()
    losses = np.asarray(res["epoch_loss"])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    metrics = runner.evaluate()
    assert 0.0 <= metrics["MeanForegroundBinaryMIOU"] <= 1.0


@pytest.mark.parametrize("yaml_name,expected_noise", [
    ("UNET+cars3+edge+diffeo+only_prior+realnvp+spatio-temporal+noisy"
     "+seed131+np0.yaml", 0.0),
    ("UNET+cars3+edge+diffeo+only_prior+realnvp+spatio-temporal+noisy"
     "+seed47+np0_4.yaml", 0.4),
])
def test_noisy_spatio_temporal_family_yaml(tmp_path, yaml_name,
                                           expected_noise):
    """path-connectedness/noisy-spatio-temporal: the FRAME-noise
    robustness experiment — noisy_percentage of the middle frames has
    its dense unaries replaced by clamp(N(0.5, 1), 0, 1) garbage before
    the shared (x, y, t) fit
    (`awesome/model/noisy_path_connected_net.py:178-230`). The
    BASELINE.md noise-curve family; full replay:
    scripts/run_noise_curve.py."""
    cfg, extra = load_reference_config(os.path.join(
        REF, "noisy-spatio-temporal", yaml_name))
    assert extra == {}
    assert cfg.pretrain_only is True
    assert float(cfg.pretrain_args["noisy_percentage"]) == expected_noise

    seq = _write_sequence(tmp_path)
    cfg.prior_model_args.update(SMALL_PRIOR)
    # shrink cost knobs only
    cfg.pretrain_args = dict(cfg.pretrain_args,
                             num_epochs=30,
                             prefit_convex_net_num_epochs=30,
                             prefit_flow_net_identity_num_epochs=10)
    runner = FBMSRunner.from_awesome_config(cfg, dataset_path=seq)
    assert runner.config.frame_noise_percentage == expected_noise
    runner.build()
    res = runner.pretrain()
    assert np.isfinite(np.asarray(res["epoch_loss"])).all()
    metrics = runner.evaluate()
    assert 0.0 <= metrics["MeanForegroundBinaryMIOU"] <= 1.0


def test_frame_noise_replaces_middle_frames(tmp_path):
    """np0_4 vs np0 on the same sequence: round(T * 0.4) MIDDLE frames'
    dense unaries become garbage draws; first/last frames (the convex
    prefit anchors) are bit-identical."""
    seq = _write_sequence(tmp_path)

    def collect(noise):
        cfg, _ = load_reference_config(os.path.join(
            REF, "noisy-spatio-temporal",
            "UNET+cars3+edge+diffeo+only_prior+realnvp+spatio-temporal"
            "+noisy+seed47+np0_4.yaml"))
        cfg.prior_model_args.update(SMALL_PRIOR)
        runner = FBMSRunner.from_awesome_config(cfg, dataset_path=seq)
        runner.config.frame_noise_percentage = noise
        runner.build()
        return runner._frame_noise_targets()

    t0, l0 = collect(0.0)
    t4, l4 = collect(0.4)
    assert l0.all() and l4.all()  # dense protocol: every point labeled
    n_frames = t0.shape[0]
    changed = [
        bool((t0[i] != t4[i]).any()) for i in range(n_frames)
    ]
    assert not changed[0] and not changed[-1]  # prefit anchors exempt
    assert sum(changed) == round(n_frames * 0.4)
    # garbage frames are clamp(N(0.5, 1)) draws: heavy mass at 0 and 1
    i = changed.index(True)
    vals = t4[i, :, 0]
    assert (vals == 0.0).mean() > 0.1 and (vals == 1.0).mean() > 0.1
