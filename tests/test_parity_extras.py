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


def test_log_loss_terms_recursive_paths():
    """TrackerLoss.log parity: nested sub-loss dicts land in the tracker
    under path-joined names (`awesome/measures/tracker_loss.py:61`)."""
    from awesome_tpu.fit.tracker import Tracker, log_loss_terms

    t = Tracker()
    log_loss_terms(
        t,
        {"Loss": 1.0, "FBMSJointLoss": {"segmentation_loss": 0.5,
                                        "penalty": {"SE": 0.25}}},
        mode="train",
    )
    assert ("Loss", "epoch", "train") in t.series
    assert ("FBMSJointLoss/segmentation_loss", "epoch", "train") in t.series
    assert t.series[("FBMSJointLoss/penalty/SE", "epoch", "train")].last == 0.25


def test_saveable_decorator(tmp_path):
    from awesome_tpu.runner.functions import saveable

    calls = []

    @saveable
    def plot():
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure()
        plt.plot([0, 1], [0, 1])
        calls.append(1)
        return fig

    p = str(tmp_path / "fig.png")
    plot(path=p)
    import os

    assert os.path.exists(p) and calls == [1]


def test_sam_mask_utils():
    import numpy as np

    from awesome_tpu.runner.functions import (
        filter_sam_masks,
        sam_masks_to_label_mask,
    )

    big = np.zeros((8, 8), bool)
    big[:6, :6] = True
    small = np.zeros((8, 8), bool)
    small[1:3, 1:3] = True
    label = sam_masks_to_label_mask([small, big], scores=[0.9, 0.8])
    # big painted first, small overwrites inside it
    assert label[0, 0] == 1  # big got id 1 (painted first -> bigger area)
    assert label[1, 1] == 2  # small overwrote with id 2
    assert label[7, 7] == 0
    masks, scores = filter_sam_masks(
        [small, big], [0.5, 0.9], min_score=0.8, min_area=5
    )
    assert len(masks) == 1 and scores == [0.9]


def test_space_time_tube_plot(tmp_path):
    import numpy as np

    from awesome_tpu.runner.functions import plot_space_time_tube

    vol = np.zeros((4, 8, 8), bool)
    vol[:, 3:5, 3:5] = True
    p = str(tmp_path / "tube.png")
    plot_space_time_tube(vol, path=p)
    import os

    assert os.path.exists(p)


def test_batch_settings_of_dataset(tmp_path):
    from awesome_tpu.data.batching import BatchSettings
    from awesome_tpu.data.fbms import FBMSSequenceDataset
    from tests.test_fbms import _write_sequence

    seq = _write_sequence(tmp_path)
    ds = FBMSSequenceDataset(seq, training_batch_size=32,
                             shuffle_in_validation_dataloader=True)
    bs = BatchSettings.of(ds)
    assert bs.training_batch_size == 32
    assert bs.shuffle_in_validation_dataloader is True
    # defaults for plain objects
    assert BatchSettings.of(object()).training_batch_size == 1


def test_pretrain_noisy_with_prefits():
    """The noisy override's warm-start prefits (flow-identity + convex on
    first/last frames) run before the shared spatio-temporal fit."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from awesome_tpu.fit.spatiotemporal import sequence_points
    from awesome_tpu.nn.noisy_path_connected import (
        noisy_path_connected_net,
        pretrain_noisy,
    )

    h = w = 10
    t = 3
    model = noisy_path_connected_net((h, w), hidden_units=8, flow_n_flows=3,
                                     convex_net_hidden_units=8,
                                     convex_net_hidden_layers=1)
    params = model.init(jax.random.PRNGKey(0))
    pts = sequence_points((h, w), t)
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    disk = ((yy - h / 2) ** 2 + (xx - w / 2) ** 2) <= (h / 3) ** 2
    targets = jnp.asarray(
        np.stack([1.0 - disk.astype(np.float32).reshape(-1)] * t)
    )[..., None]
    labeled = jnp.asarray(rng.random((t, h * w)) < 0.6)
    fitted, aux = pretrain_noisy(
        model, params, pts, targets, labeled,
        num_epochs=30, lr=5e-3,
        prefit_flow_net_identity=True, prefit_flow_net_identity_num_epochs=15,
        prefit_convex_net=True, prefit_convex_net_num_epochs=15,
    )
    assert np.isfinite(np.asarray(aux["epoch_loss"])).all()
