"""End-to-end runner test: synthetic convexity experiment through the full
config -> build -> train -> evaluate -> save pipeline."""
import os

import numpy as np

from awesome_tpu.runner.config import AwesomeConfig, Config
from awesome_tpu.runner.runner import AwesomeRunner


def _config(tmp_path, epochs=120):
    return AwesomeConfig(
        name_experiment="synthetic_convexity",
        dataset_args={"n": 3, "h": 32, "w": 32},
        segmentation_model_args={"n_hidden": 32},
        prior_model_args={"n_hidden": 24, "n_hidden_layers": 1},
        optimizer_type="adam",
        optimizer_args={"lr": 0.02},
        num_epochs=epochs,
        scribble_percentage=0.8,
        use_extra_penalty_hook=True,
        extra_penalty_after_n_epochs=max(epochs - 40, 10),
        runs_path=str(tmp_path),
        seed=3,
    )


def test_runner_end_to_end(tmp_path):
    cfg = _config(tmp_path)
    runner = AwesomeRunner(cfg)
    runner.build()
    result = runner.train()
    loss = result["loss_hist"]
    assert np.isfinite(loss).all()
    assert loss[:, -1].mean() < loss[:, 0].mean()
    metrics = runner.evaluate()
    assert 0.0 <= metrics["MeanForegroundBinaryMIOU"] <= 1.0
    # with scribbles on a clean synthetic object even a short run should
    # reach a sensible IoU
    assert metrics["MeanForegroundBinaryMIOU"] > 0.4, metrics
    out = runner.save_results()
    assert os.path.exists(os.path.join(out, "config.yaml"))
    assert os.path.exists(os.path.join(out, "tracker.json"))
    assert os.path.exists(os.path.join(out, "params.npz"))


def test_config_yaml_roundtrip(tmp_path):
    cfg = _config(tmp_path)
    cfg.prepare()
    path = str(tmp_path / "c.yaml")
    cfg.save(path)
    loaded = AwesomeConfig.load(path)
    assert loaded.optimizer_args == cfg.optimizer_args
    assert loaded.num_epochs == cfg.num_epochs
    assert loaded.name_experiment == cfg.name_experiment


def test_config_diff():
    a = AwesomeConfig(num_epochs=100)
    b = AwesomeConfig(num_epochs=200, optimizer_args={"lr": 0.1})
    ch = b.changes(a)
    assert set(ch) == {"num_epochs", "optimizer_args"}


def test_config_argparse_bridge():
    parser = AwesomeConfig.get_parser()
    args = parser.parse_args(
        ["--num-epochs", "5", "--optimizer-args", "{lr: 0.5}",
         "--use-prior-model", "false"]
    )
    cfg = AwesomeConfig()
    cfg.apply_parsed_args(args)
    assert cfg.num_epochs == 5
    assert cfg.optimizer_args == {"lr": 0.5}
    assert cfg.use_prior_model is False


def test_reference_type_translation():
    cfg = AwesomeConfig(
        prior_model_type="awesome.model.net_factory.real_nvp_path_connected_net",
        optimizer_type="torch.optim.Adamax",
    )
    cfg.prepare()
    assert cfg.prior_model_type == (
        "awesome_tpu.nn.path_connected.real_nvp_path_connected_net"
    )
    assert cfg.optimizer_type == "adamax"


def test_run_script_fbms_dispatch(tmp_path, monkeypatch):
    """scripts/run.py routes FBMS configs to FBMSRunner and runs the
    pretrain_only flow from the unmodified reference YAML (CLI parity
    for the sequential/weight-decay families)."""
    import os
    import sys

    ref = ("/root/reference/config/path-connectedness/sequential/"
           "UNET+cars3+edge+original+ep4000+refit400+realnvp.yaml")
    if not os.path.exists(ref):
        import pytest

        pytest.skip("reference configs not present")
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import importlib

    run_mod = importlib.import_module("run")
    from awesome_tpu.runner.reference_import import load_reference_config
    from tests.test_fbms import _write_sequence

    cfg, _ = load_reference_config(ref)
    assert run_mod._is_fbms(cfg)
    seq = _write_sequence(tmp_path)
    cfg.dataset_args["dataset"]["dataset_path"] = seq
    cfg.prior_model_args.update(
        hidden_units=8, flow_n_flows=2, convex_net_hidden_units=12,
        convex_net_hidden_layers=1,
    )
    cfg.pretrain_args.update(num_epochs=20, reuse_state_epochs=5,
                             prefit_flow_net_identity_num_epochs=5,
                             prefit_convex_net_num_epochs=5)
    cfg.pretrain_args["zoo"] = {"zoo_folder": str(tmp_path / "zoo")}
    cfg.pretrain_state_path = str(tmp_path / "ps")
    run_mod.main(cfg)  # pretrain_only: returns after the prior fit
    from awesome_tpu.fit.checkpoint import pytree_exists

    assert pytree_exists(str(tmp_path / "ps"))


def test_reuse_state_pretrain_gate_and_retry(tmp_path):
    """The sequential (reuse_state) pretrain gates every fit and retries
    failed ones from a fresh init at the FULL epoch count
    (`path_connected_net.py:964-982`): with too few steps to fit, the
    retry path executes and gate scores are reported per image."""
    import numpy as np

    from awesome_tpu.runner.config import AwesomeConfig
    from awesome_tpu.runner.runner import AwesomeRunner

    cfg = AwesomeConfig(
        name_experiment="seq_gate",
        runs_path=str(tmp_path),
        num_epochs=2,
        dataset_args={"dimension": "2d", "n": 3, "h": 16, "w": 16},
        optimizer_args={"lr": 0.02},
        pretrain_args={"reuse_state": True, "num_epochs": 3,
                       "reuse_state_epochs": 2},
        do_pretraining=True,
        compute_metrics_during_training_nth_epoch=0,
    )
    runner = AwesomeRunner(cfg)
    runner.build()
    res = runner.pretrain()
    gates = np.asarray(res["gate_iou"])
    assert gates.shape == (3,)
    assert np.isfinite(gates).all()
