import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awesome_tpu.errors import (
    ArgumentNoneError,
    MissingGroundTruthError,
    StopTraining,
)
from awesome_tpu.fit.checkpoint import emergency_save
from awesome_tpu.fit.optim import wn_param_groups
from awesome_tpu.nn.flows import NormalizingFlow1D
from awesome_tpu.nn.noisy_path_connected import (
    noisy_path_connected_net,
    pretrain_noisy,
)
from awesome_tpu.nn.wrapper import EvaluationMode, InputMode, PriorMode
from awesome_tpu.utils.logging import basic_config, get_project_root_path


def test_error_types():
    with pytest.raises(ArgumentNoneError):
        raise ArgumentNoneError("foo")
    assert issubclass(MissingGroundTruthError, Exception)
    assert issubclass(StopTraining, Exception)


def test_wn_param_groups_decays_only_g():
    flow = NormalizingFlow1D(num_coupling=2, width=8)
    params = flow.init(jax.random.PRNGKey(0))
    wd = wn_param_groups(params, 5e-5)
    leaves_p, tree_p = jax.tree_util.tree_flatten(params)
    leaves_w, tree_w = jax.tree_util.tree_flatten(wd)
    assert str(tree_p) == str(tree_w)
    assert any(w == 5e-5 for w in leaves_w)  # g leaves decay
    assert any(w == 0.0 for w in leaves_w)  # others don't


def test_wrapper_enums():
    assert PriorMode.FULL.value == "full"
    assert InputMode.PIXEL.value == "pixel"
    assert EvaluationMode.BOTH.value == "both"


def test_project_root_and_logging(tmp_path):
    root = get_project_root_path()
    import os

    assert os.path.exists(os.path.join(root, "awesome_tpu"))
    basic_config(log_file=str(tmp_path / "log.txt"))
    import logging

    logging.getLogger("t").info("hello")
    assert (tmp_path / "log.txt").exists()


def test_emergency_save(tmp_path):
    try:
        raise RuntimeError("boom")
    except RuntimeError as e:
        d = emergency_save(
            str(tmp_path / "emergency"),
            params={"w": jnp.ones(3)},
            batch={"x": jnp.zeros((2, 2))},
            error=e,
            extra={"step": 5},
        )
    import json
    import os

    meta = json.load(open(os.path.join(d, "emergency.json")))
    assert "boom" in meta["error"]
    assert meta["extra"]["step"] == 5


def test_noisy_path_connected_pretrain():
    model = noisy_path_connected_net((8, 8), hidden_units=8, flow_n_flows=2,
                                     convex_net_hidden_units=8,
                                     convex_net_hidden_layers=1)
    params = model.init(jax.random.PRNGKey(0))
    from awesome_tpu.fit.spatiotemporal import sequence_points

    pts = sequence_points((8, 8), 3)
    rng = np.random.default_rng(0)
    targets = jnp.asarray(
        (rng.random((3, 64, 1)) > 0.3).astype(np.float32)
    )
    labeled = jnp.ones((3, 64), bool)
    fitted, aux = pretrain_noisy(model, params, pts, targets, labeled,
                                 num_epochs=20)
    assert np.isfinite(np.asarray(aux["epoch_loss"])).all()
