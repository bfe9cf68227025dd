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
