"""Noise-curve machinery: pretrain_args fidelity + noisy-run analytics.

The noisy-spatio-temporal family (3 seeds x 7 flip levels) assembles
into the reference's noise -> IoU curve via `NoisyUnariesResultModel`
(`notebooks/fbms_spatio_temporal_noisy_eval.ipynb`; published anchor in
SURVEY.md section 6). Full family replay: scripts/run_noise_curve.py.
"""
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/config/path-connectedness/noisy-spatio-temporal"
YAML = ("UNET+cars3+edge+diffeo+only_prior+realnvp+spatio-temporal"
        "+noisy+seed42+np0_3.yaml")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference configs not present"
)


def _write_sequence(tmp_path, **kw):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from build_all_configs import write_sequence

    return write_sequence(str(tmp_path), **kw)


def test_pretrain_only_mapping_uses_pretrain_args(tmp_path):
    """For pretrain_only YAMLs the fit budget/lr come from pretrain_args
    (num_epochs 1000 / lr 0.001 in the noisy family), NOT the top-level
    joint-loop fields (num_epochs 100 / optimizer lr 0.003); the noise
    draw follows the experiment seed."""
    from awesome_tpu.runner.fbms_runner import FBMSRunner
    from awesome_tpu.runner.reference_import import load_reference_config

    cfg, extra = load_reference_config(os.path.join(REF, YAML))
    assert extra == {}
    assert cfg.num_epochs == 100  # the joint-loop count stays untouched
    seq = _write_sequence(tmp_path)
    runner = FBMSRunner.from_awesome_config(cfg, dataset_path=seq)
    assert runner.config.num_epochs == 1000
    assert runner.config.lr == pytest.approx(0.001)
    assert runner.config.frame_noise_percentage == pytest.approx(0.3)
    assert runner.config.flip_probability == 0.0
    assert runner.config.noise_seed == cfg.seed == 42


def test_prefits_applied_and_improve_fit(tmp_path):
    """pretrain() honors the YAML's prefit_flow_net_identity +
    prefit_convex_net warm starts (`noisy_path_connected_net.py:38-160`):
    with the prefits the short fit starts from a usable shape (higher
    IoU than the cold fit on the same budget)."""
    from awesome_tpu.runner.fbms_runner import FBMSRunner
    from awesome_tpu.runner.reference_import import load_reference_config

    seq = _write_sequence(tmp_path, h=32, w=40, n_fg=40, n_bg=80)

    def run(prefits: bool):
        cfg, _ = load_reference_config(os.path.join(REF, YAML))
        cfg.prior_model_args.update(dict(
            hidden_units=8, flow_n_flows=2, convex_net_hidden_units=12,
            convex_net_hidden_layers=1))
        pa = dict(cfg.pretrain_args)
        pa["num_epochs"] = 120
        pa["noisy_percentage"] = 0.0
        if not prefits:
            pa["prefit_flow_net_identity"] = False
            pa["prefit_convex_net"] = False
        else:
            pa["prefit_convex_net_num_epochs"] = 150
            pa["prefit_flow_net_identity_num_epochs"] = 20
        cfg.pretrain_args = pa
        runner = FBMSRunner.from_awesome_config(cfg, dataset_path=seq)
        runner.build()
        runner.pretrain()
        return runner.evaluate()["MeanForegroundBinaryMIOU"]

    cold = run(False)
    warm = run(True)
    # deterministic on the CPU conftest; at this shrunken scale the warm
    # start wins by a few points (full-scale effect measured in
    # runs/noise_curve: 0.20 -> 0.85 at np0, PARITY.md round-4)
    assert warm > cold, (cold, warm)


def test_noisy_run_saves_and_scans_into_curve(tmp_path):
    """save_results persists an imported-config pretrain run that
    NoisyUnariesResultModel reads back (lenient load of the embedded
    reference class tags) and ResultComparison lines up into a curve."""
    from awesome_tpu.analytics.result_model import (
        NoisyUnariesResultModel,
        ResultComparison,
    )
    from awesome_tpu.runner.fbms_runner import FBMSRunner
    from awesome_tpu.runner.reference_import import load_reference_config

    cfg, _ = load_reference_config(os.path.join(REF, YAML))
    cfg.runs_path = str(tmp_path / "runs")
    seq = _write_sequence(tmp_path)
    runner = FBMSRunner.from_awesome_config(cfg, dataset_path=seq)
    runner.build()
    out = runner.save_results({"MeanForegroundBinaryMIOU": 0.5})
    r = NoisyUnariesResultModel.from_path(out)
    assert r.config is not None  # lenient resurrection of awesome.* tags
    assert r.noise_level == pytest.approx(0.3)
    curve = ResultComparison([r]).noise_curve("MeanForegroundBinaryMIOU")
    assert curve == [(pytest.approx(0.3), pytest.approx(0.5))]
