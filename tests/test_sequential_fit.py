"""Sequential (post-processing) prior fit through the runner, instance
losses, profiling utilities."""
import jax.numpy as jnp
import numpy as np
import pytest

from awesome_tpu.measures.instance_losses import (
    instance_finetune_loss,
    instance_prior_loss,
)
from awesome_tpu.runner.config import AwesomeConfig
from awesome_tpu.runner.runner import AwesomeRunner
from awesome_tpu.utils.profiling import PhaseTimer, assert_finite


def test_runner_sequential_prior_fit(tmp_path):
    cfg = AwesomeConfig(
        dataset_args={"n": 2, "h": 24, "w": 24},
        segmentation_model_args={"n_hidden": 24},
        prior_model_args={"n_hidden": 16, "n_hidden_layers": 1},
        optimizer_args={"lr": 0.02},
        num_epochs=150,
        runs_path=str(tmp_path),
        seed=5,
    )
    r = AwesomeRunner(cfg)
    r.build()
    r.train()
    before = r.evaluate()
    res = r.sequential_prior_fit(num_steps=150, lr=2e-3,
                                 gate_threshold=None)
    after = r.evaluate()
    # the refit prior should track the seg closely (post-processing role)
    assert after["PriorMeanForegroundBinaryMIOU"] >= 0.3
    assert np.asarray(res["valid"]).all()


def test_instance_prior_loss():
    det_loss = jnp.asarray(1.0)
    masks = jnp.zeros((3, 8, 8)).at[0, 2:6, 2:6].set(5.0) - 2.0
    priors = jnp.full((3, 8, 8), 0.5)
    valid = jnp.asarray([True, True, False])
    base = instance_prior_loss(det_loss, masks, priors, valid)
    assert float(base) > 1.0
    pen = instance_prior_loss(det_loss, masks, priors, valid,
                              extra_penalty=True)
    assert np.isfinite(float(pen))
    # finetune variant flows grads into the detector masks
    import jax

    g = jax.grad(
        lambda m: instance_finetune_loss(det_loss, m, priors, valid)
    )(masks)
    assert float(jnp.abs(g).max()) > 0
    # padded instance contributes no gradient
    assert float(jnp.abs(g[2]).max()) == 0.0


def test_phase_timer_and_assert_finite():
    t = PhaseTimer()
    with t.phase("a"):
        sum(range(1000))
    assert t.report()["a"] >= 0
    assert_finite({"x": jnp.ones(3)}, "ok")
    with pytest.raises(FloatingPointError):
        assert_finite({"x": jnp.asarray([1.0, jnp.nan])}, "bad")
