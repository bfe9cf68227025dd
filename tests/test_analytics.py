import numpy as np
import pytest

from awesome_tpu.analytics import ResultComparison, ResultModel
from awesome_tpu.runner.config import AwesomeConfig
from awesome_tpu.runner.runner import AwesomeRunner
from awesome_tpu.utils.corruptions import CORRUPTIONS, corrupt


def _run(tmp_path, name, epochs):
    cfg = AwesomeConfig(
        name_experiment=name,
        dataset_args={"n": 2, "h": 24, "w": 24},
        segmentation_model_args={"n_hidden": 16},
        prior_model_args={"n_hidden": 16, "n_hidden_layers": 1},
        optimizer_args={"lr": 0.02},
        num_epochs=epochs,
        runs_path=str(tmp_path),
        seed=1,
    )
    r = AwesomeRunner(cfg)
    r.build()
    r.train()
    r.evaluate()
    return r.save_results()


def test_result_model_reload_and_comparison(tmp_path):
    _run(tmp_path, "a", 30)
    _run(tmp_path, "b", 60)
    results = ResultModel.scan_result_directory(str(tmp_path))
    assert len(results) == 2
    r = results[0]
    assert r.config is not None
    assert r.tracker is not None
    assert r.metric("MeanForegroundBinaryMIOU") is not None
    assert isinstance(r.get_params(), list)

    cmp = ResultComparison(results)
    df = cmp.table()
    assert len(df) == 2
    assert "MeanForegroundBinaryMIOU" in df.columns
    md = cmp.to_markdown()
    assert "run" in md
    best = cmp.best("MeanForegroundBinaryMIOU")
    assert best is not None


@pytest.mark.parametrize("name", sorted(CORRUPTIONS))
def test_corruptions_shapes_and_range(name, rng):
    x = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    for sev in (1, 5):
        y = corrupt(x, name, severity=sev, seed=1)
        assert y.shape == x.shape
        assert y.dtype == np.float32
        assert y.min() >= 0.0 and y.max() <= 1.0
        # severity 5 should actually change the image
        if sev == 5:
            assert not np.allclose(y, x)


def test_all_reference_corruptions_present():
    """Every corruption name of `awesome/util/corruptions.py:123-368` has a
    dispatch entry."""
    reference_names = {
        "gaussian_noise", "shot_noise", "impulse_noise", "speckle_noise",
        "gaussian_blur", "glass_blur", "defocus_blur", "motion_blur",
        "zoom_blur", "fog", "frost", "snow", "spatter", "contrast",
        "brightness", "saturate", "jpeg_compression", "pixelate",
        "elastic_transform",
    }
    assert reference_names <= set(CORRUPTIONS)


def test_corrupt_validates():
    x = np.zeros((8, 8, 3), np.float32)
    with pytest.raises(ValueError):
        corrupt(x, "nope")
    with pytest.raises(ValueError):
        corrupt(x, "gaussian_noise", severity=9)


def test_result_model_get_runner_resumes(tmp_path):
    """A saved run reloads into a runnable runner with identical eval."""
    out = _run(tmp_path, "resume_me", 40)
    r = ResultModel.from_path(out)
    runner = r.get_runner()
    m = runner.evaluate()
    # identical params -> identical metrics as the recorded final eval
    np.testing.assert_allclose(
        m["MeanForegroundBinaryMIOU"],
        r.metric("MeanForegroundBinaryMIOU"),
        atol=1e-6,
    )
    # and training can continue from the restored state
    res = runner.train()
    assert np.isfinite(res["loss_hist"]).all()


def test_checkpoint_scanning_and_reload(tmp_path):
    """Per-run checkpoint enumeration + AgentCheckpoint reload + runner
    restore from the 'best' checkpoint.
    Spec: `analytics/result_model.py:411,450,571`."""
    out = _run(tmp_path, "ckpts", 40)
    r = ResultModel.from_path(out)
    ckpts = r.scan_checkpoints()
    assert {"best", "end"} <= set(ckpts)
    ck = r.get_checkpoint("end")
    assert ck.tracker is not None and ck.params is not None
    runner = r.get_runner(checkpoint="best")
    m = runner.evaluate()
    assert 0.0 <= m["MeanForegroundBinaryMIOU"] <= 1.0
    with pytest.raises(FileNotFoundError):
        r.get_checkpoint("nope")


def test_best_epoch_selection_table(tmp_path):
    """ResultComparison reproduces a 'best'-selection table (evaluation
    notebook cell 16) from archived runs."""
    _run(tmp_path, "sel_a", 40)
    _run(tmp_path, "sel_b", 40)
    results = ResultModel.scan_result_directory(str(tmp_path))
    cmp = ResultComparison(results)
    metric = "MeanForegroundBinaryMIOU"
    df_last = cmp.table(metric_names=[metric], selection="last")
    df_best = cmp.table(metric_names=[metric], selection="best")
    assert len(df_best) == len(df_last) == 2
    # best >= last for a maximized metric, and the best epoch is recorded
    assert (df_best[metric] >= df_last[metric] - 1e-9).all()
    assert f"{metric}:epoch" in df_best.columns
    r = results[0]
    best = r.metric_best_epoch(metric)
    assert best is not None and best[1] == r.metric(metric, selection="best")


def test_noisy_unaries_result_model(tmp_path):
    from awesome_tpu.analytics.result_model import NoisyUnariesResultModel

    out = _run(tmp_path, "noisy", 20)
    r = NoisyUnariesResultModel.from_path(out)
    # inject a noise level into the archived config
    cfg = r.config
    cfg.dataset_args["flip_probability"] = 0.2
    assert r.noise_level == 0.2
    cmp = ResultComparison([r])
    df = cmp.table()
    assert "noise" in df.columns
    curve = cmp.noise_curve("MeanForegroundBinaryMIOU")
    assert curve and curve[0][0] == 0.2


def test_grouped_mean_std_table(tmp_path):
    """Seed-grouped mean ± std aggregation (the unireps evaluation
    notebook's summarized frame, `notebooks/unireps_evaluation.ipynb`
    cells 2-5): runs differing only in seed collapse to one row."""
    for seed in (1, 7):
        cfg = AwesomeConfig(
            name_experiment="g",
            dataset_args={"n": 2, "h": 24, "w": 24},
            segmentation_model_args={"n_hidden": 16},
            prior_model_args={"n_hidden": 16, "n_hidden_layers": 1},
            optimizer_args={"lr": 0.02},
            num_epochs=30,
            runs_path=str(tmp_path),
            seed=seed,
        )
        r = AwesomeRunner(cfg)
        r.build()
        r.train()
        r.evaluate()
        r.save_results()
    results = ResultModel.scan_result_directory(str(tmp_path))
    assert len(results) == 2
    comp = ResultComparison(results)
    metric = "MeanForegroundBinaryMIOU"
    df = comp.grouped_table([metric])
    assert len(df) == 1  # the two seeds grouped into one row
    assert df.iloc[0]["n_runs"] == 2
    assert "±" in df.iloc[0][metric]
    assert "1" in df.iloc[0]["seeds"] and "7" in df.iloc[0]["seeds"]

    # list-valued diff_config fields (grid sweeps over e.g. mesh_shape)
    # must not crash the groupby — they group on their repr
    for r in results:
        r.config.diff_config = {"mesh_shape": [2, 4]}
    df2 = comp.grouped_table([metric])
    assert len(df2) == 1 and df2.iloc[0]["n_runs"] == 2
    assert df2.iloc[0]["cfg:mesh_shape"] == repr([2, 4])
