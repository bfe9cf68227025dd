"""Spatio-temporal shared prior: fit on a synthetic moving-disk sequence,
evaluate on GT frames; losses_extra coverage."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awesome_tpu.fit.prior_fit import FitConfig
from awesome_tpu.fit.spatiotemporal import (
    fit_spatiotemporal_prior,
    sequence_points,
)
from awesome_tpu.measures import losses as L
from awesome_tpu.measures.losses_extra import (
    awesome_image_loss,
    awesome_loss_joint,
    prior_image_loss,
    regularizer_loss,
    true_pixel_accuracy,
    unaries_conversion_loss,
)
from awesome_tpu.nn.icnn import ConvexNextNet
from awesome_tpu.runner.fbms_runner import FBMSExperimentConfig, FBMSRunner
from tests.test_fbms import _write_sequence


@pytest.fixture
def tiny_icnn3():
    """3-input ICNN for (x, y, t)."""
    return ConvexNextNet(n_hidden=24, in_features=3, n_hidden_layers=1)


def test_fit_spatiotemporal_prior_smoke(tiny_icnn3):
    t, h, w = 4, 16, 16
    pts = sequence_points((h, w), t)
    assert pts.shape == (t, h * w, 3)
    # moving disk fg
    targets = np.ones((t, h * w, 1), np.float32)
    for f in range(t):
        yy, xx = np.mgrid[0:h, 0:w]
        disk = ((yy - 8) ** 2 + (xx - (4 + 2 * f)) ** 2) <= 9
        targets[f, :, 0] = 1.0 - disk.reshape(-1)
    labeled = jnp.ones((t, h * w), bool)
    params = tiny_icnn3.init(jax.random.PRNGKey(0))
    fitted, aux = fit_spatiotemporal_prior(
        tiny_icnn3, params, pts, jnp.asarray(targets), labeled,
        FitConfig(lr=2e-3, optimizer="adam"), num_epochs=150,
    )
    losses = np.asarray(aux["epoch_loss"])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # per-frame IoU should be decent
    from awesome_tpu.measures.metrics import iou

    prob = jax.nn.sigmoid(tiny_icnn3.apply(fitted, pts[2]))
    score = float(iou(prob < 0.5, targets[2] < 0.5))
    assert score > 0.5, score


def test_fbms_runner_end_to_end(tmp_path):
    seq = _write_sequence(tmp_path)
    cfg = FBMSExperimentConfig(
        dataset_path=seq, num_epochs=120, lr=2e-3,
        prior_hidden_units=8, prior_flows=2,
        convex_hidden_units=16, convex_hidden_layers=1,
    )
    runner = FBMSRunner(cfg).build()
    res = runner.pretrain()
    assert np.isfinite(res["epoch_loss"]).all()
    metrics = runner.evaluate()
    assert metrics["num_gt_frames"] == 2
    assert 0.0 <= metrics["MeanForegroundBinaryMIOU"] <= 1.0


def test_fbms_runner_noise_degrades(tmp_path):
    """Label-noise flipping should not IMPROVE the fit (the noisy
    spatio-temporal experiment's premise)."""
    seq = _write_sequence(tmp_path)
    scores = {}
    for flip in (0.0, 0.5):
        cfg = FBMSExperimentConfig(
            dataset_path=seq, num_epochs=100, lr=2e-3,
            prior_hidden_units=8, prior_flows=2,
            convex_hidden_units=16, convex_hidden_layers=1,
            flip_probability=flip,
        )
        r = FBMSRunner(cfg).build()
        r.pretrain()
        scores[flip] = r.evaluate()["MeanForegroundBinaryMIOU"]
    assert scores[0.5] <= scores[0.0] + 0.05, scores


def test_losses_extra():
    out = jnp.stack(
        [jnp.full((1, 1, 4, 4), 0.8), jnp.full((1, 1, 4, 4), 0.3)], axis=1
    ).reshape(1, 2, 4, 4)
    tgt = jnp.ones((1, 1, 4, 4))
    base = awesome_image_loss(out, tgt)
    with_pen = awesome_image_loss(out, tgt, extra_penalty=True)
    assert float(base) > 0 and float(with_pen) > 0

    out_px = jnp.concatenate(
        [jnp.full((8, 1), 0.8), jnp.full((8, 1), 0.4)], axis=-1
    )
    tgt_px = jnp.ones((8, 1))
    assert float(awesome_loss_joint(out_px, tgt_px)) > 0

    val = regularizer_loss(
        jnp.ones(4) * 0.5, jnp.ones(4), criterion=L.se, tau=0.1,
        regularizer=lambda o: jnp.sum(o**2),
    )
    np.testing.assert_allclose(float(val), 0.25 + 0.1 * 1.0, rtol=1e-6)

    v = unaries_conversion_loss(
        jnp.asarray([0.9, 0.1]), jnp.asarray([0.7, 0.2]), criterion=L.se
    )
    np.testing.assert_allclose(float(v), ((0.9 - 1) ** 2 + 0.1**2) / 2,
                               rtol=1e-5)

    pil = prior_image_loss(out, jnp.full((1, 1, 4, 4), 2.0), noneclass=2.0)
    assert np.isfinite(float(pil))

    acc = true_pixel_accuracy(
        jnp.asarray([1.0, 0.0, 1.0]), jnp.asarray([1.0, 1.0, 0.0])
    )
    np.testing.assert_allclose(float(acc), 0.5)
