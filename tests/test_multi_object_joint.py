"""Multi-object joint training (VERDICT r2 #3 + #7).

A synthetic 2-object FBMS-style sequence (two moving disks, trajectory
weak labels with object ids 1 and 2, dense 2-region GT) drives:

- per-object weak-label emission ((K, H, W) channels + id map,
  `awesome/dataset/fbms_sequence_sample.py:779-840`),
- the GT<->weak-label id mapping by point containment,
- joint training of a multi-channel UNet + per-frame MultiPriorModule
  children with a MID-TRAINING GROWTH event (fresh slot + zeroed
  optimizer moments, `awesome/run/awesome_runner.py:460-490`),
- recovery of BOTH objects' masks.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awesome_tpu.data.fbms import (
    FBMSSequenceDataset,
    gt_object_id_weak_label_mapping,
    multi_object_weak_labels,
    parse_trajectories_file,
    value_mask_to_channels,
    weak_label_id_gt_mapping,
)

H, W, FRAMES = 24, 32, 4


def _disk(cy, cx, r=5):
    yy, xx = np.mgrid[0:H, 0:W]
    return ((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r


def _centers(frame):
    # object 1 moves right along the top, object 2 sits bottom-left
    return {1: (7, 6 + 3 * frame), 2: (17, 8)}


def _write_two_object_sequence(root):
    from PIL import Image

    seq = root / "marple99"
    os.makedirs(seq / "GroundTruth")
    os.makedirs(seq / "tracks" / "multicut")
    rng = np.random.default_rng(0)
    trajs = []
    for oid, n_traj in ((1, 10), (2, 10), (0, 25)):
        for _ in range(n_traj):
            pts = []
            if oid == 0:
                x0, y0 = rng.uniform(0, W - 1), rng.uniform(0, H - 1)
                # keep background points off both disks in every frame
                while any(
                    _disk(*_centers(f)[o])[
                        min(int(round(y0)), H - 1),
                        min(int(round(x0)), W - 1)]
                    for f in range(FRAMES) for o in (1, 2)
                ):
                    x0, y0 = rng.uniform(0, W - 1), rng.uniform(0, H - 1)
                for f in range(FRAMES):
                    pts.append((x0, y0, f))
            else:
                ang = rng.uniform(0, 2 * np.pi)
                rad = rng.uniform(0, 3.5)
                for f in range(FRAMES):
                    cy, cx = _centers(f)[oid]
                    pts.append((cx + rad * np.cos(ang),
                                cy + rad * np.sin(ang), f))
            trajs.append((oid, pts))
    with open(seq / "tracks" / "multicut" / "marple99.dat", "w") as f:
        f.write(f"{FRAMES}\n{len(trajs)}\n")
        for oid, pts in trajs:
            f.write(f"{oid} {len(pts)}\n")
            for x, y, fr in pts:
                f.write(f"{x:.2f} {y:.2f} {fr}\n")
    for i in range(FRAMES):
        img = np.zeros((H, W, 3), np.uint8) + 30
        img[_disk(*_centers(i)[1])] = (220, 60, 60)
        img[_disk(*_centers(i)[2])] = (60, 60, 220)
        from PIL import Image as I

        I.fromarray(img).save(seq / f"marple99_{i:02d}.png")
    # dense 2-region GT for frames 0 and 3: region values 100 and 200
    for i in (0, FRAMES - 1):
        gt = np.zeros((H, W), np.uint8)
        gt[_disk(*_centers(i)[1])] = 100
        gt[_disk(*_centers(i)[2])] = 200
        from PIL import Image as I

        I.fromarray(gt).save(seq / "GroundTruth" / f"marple99_{i:02d}.png")
    with open(seq / "GroundTruth" / "marple99Def.dat", "w") as f:
        f.write("Total number of regions:\n3\n")
        f.write("Total number of frames in this shot:\n%d\n" % FRAMES)
        f.write("Total number of labeled frames for this shot:\n2\n")
        f.write(f"marple99_00.png\n0\nmarple99_{FRAMES-1:02d}.png\n"
                f"{FRAMES-1}\n")
    return str(seq)


@pytest.fixture(scope="module")
def seq_path(tmp_path_factory):
    return _write_two_object_sequence(tmp_path_factory.mktemp("mo"))


def test_multi_object_weak_labels(seq_path):
    trajs = parse_trajectories_file(
        os.path.join(seq_path, "tracks/multicut/marple99.dat")
    )
    unaries, labeled, ids = multi_object_weak_labels(
        trajs, 0, (H, W), max_objects=3
    )
    assert unaries.shape == (3, H, W)
    assert set(ids[:2]) == {1, 2} and ids[2] == -1
    # each channel has its own fg points inside its disk only
    for k, oid in enumerate(ids[:2]):
        fg = unaries[k] == 0
        assert fg.any()
        assert fg[_disk(*_centers(0)[oid])].any()
        other = 2 if oid == 1 else 1
        assert not fg[_disk(*_centers(0)[other], r=3)].any()
    # empty slot is all-bg
    assert (unaries[2] == 1.0).all()
    # labeled covers bg trajectory points too
    assert labeled.sum() > (unaries[0] == 0).sum() + (unaries[1] == 0).sum()


def test_gt_weak_id_mapping(seq_path):
    ds = FBMSSequenceDataset(seq_path)
    gtc, gt_ids = ds.load_ground_truth_channels(0)
    assert len(gt_ids) == 2
    mapping = ds.object_id_mapping(0)
    inv = weak_label_id_gt_mapping(mapping)
    # each weak fg object maps to its own GT region, bg to region 0
    assert inv[1] != inv[2]
    assert inv[1] in set(int(g) for g in gt_ids)
    assert inv[2] in set(int(g) for g in gt_ids)
    assert inv[0] == 0


def test_value_mask_channels():
    m = np.array([[0, 1], [2, 1]])
    ch, ids = value_mask_to_channels(m)
    assert list(ids) == [1, 2]
    assert ch[0].sum() == 2 and ch[1].sum() == 1


def test_growth_preserves_existing_children(seq_path):
    """assure_multi_prior_count re-inits ONLY the grown slots; slot 0's
    params and optimizer moments are bit-identical."""
    from awesome_tpu.fit.trainer import (
        JointTrainConfig,
        assure_multi_prior_count,
        multi_object_train_init,
    )
    from awesome_tpu.nn.icnn import ConvexNextNet
    from awesome_tpu.nn.multi_prior import MultiPriorModule
    from awesome_tpu.nn.seg import UNet
    from awesome_tpu.nn.wrapper import WrapperModule

    mp = MultiPriorModule(
        child=ConvexNextNet(in_features=2, n_hidden=8, n_hidden_layers=1),
        max_priors=3,
    )
    wrapper = WrapperModule(
        segmentation_module=UNet(in_chn=4, out_chn=3),
        prior_module=mp,
        input_mode="image",
        prior_arg_mode="param_clean_grid",
        seg_stateful=True,
    )
    cfg = JointTrainConfig()
    state = multi_object_train_init(
        wrapper, jax.random.PRNGKey(0), num_images=4, cfg=cfg,
        initial_count=1,
    )
    assert np.asarray(state.active).sum() == 4  # one slot per frame
    # dirty slot 0's moments so we can detect an accidental reset
    dirty_opt = jax.tree_util.tree_map(
        lambda x: x + 1 if x.dtype.kind == "f" else x, state.prior_opt
    )
    state = state._replace(prior_opt=dirty_opt)
    grown = assure_multi_prior_count(
        wrapper, state, cfg, 2, jax.random.PRNGKey(7)
    )
    assert np.asarray(grown.active).sum() == 8
    sel = lambda t, k: jax.tree_util.tree_map(lambda x: x[:, k], t)
    for a, b in zip(
        jax.tree_util.tree_leaves(sel(grown.prior_params["children"], 0)),
        jax.tree_util.tree_leaves(sel(state.prior_params["children"], 0)),
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(sel(grown.prior_opt, 0)),
        jax.tree_util.tree_leaves(sel(state.prior_opt, 0)),
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # grown slot 1: fresh moments (zeros), differs from slot-1 dirty state
    m_leaf = jax.tree_util.tree_leaves(sel(grown.prior_opt, 1))
    assert any(
        np.allclose(np.asarray(x), 0.0) for x in m_leaf
        if np.asarray(x).dtype.kind == "f"
    )


def test_two_object_joint_training_with_growth(seq_path):
    """Joint training on the 2-object sequence recovers both objects'
    masks, with a growth event after the first epoch (start at 1 active
    prior, grow to 2)."""
    from awesome_tpu.runner.fbms_runner import (
        FBMSExperimentConfig,
        FBMSRunner,
    )

    cfg = FBMSExperimentConfig(
        dataset_path=seq_path, prior_hidden_units=8, prior_flows=2,
        convex_hidden_units=12, convex_hidden_layers=1,
    )
    runner = FBMSRunner(cfg)
    runner.build()
    res = runner.train_joint_multi_object(
        max_objects=2,
        initial_count=1,
        grow_at_epoch={1: 2},
        num_epochs=6,
        lr=3e-3,
        prior_lr=1e-3,
        batch_size=2,
        seed=0,
        pretrain_steps=400,
    )
    assert res["growth_events"] == [(1, 2)]
    assert np.isfinite(res["loss"]).all()
    m = runner.evaluate_multi_object()
    per_obj = m["prior_iou_per_object"]
    assert set(per_obj) == {1, 2}, per_obj
    # both objects' priors localize their own object (well above the
    # cross-object IoU of ~0 and the random ~0.1)
    assert per_obj[1] > 0.3, m
    assert per_obj[2] > 0.3, m


def test_label_mode_multiple_objects_config_dispatch(seq_path, tmp_path):
    """A reference-style config with label_mode multiple_objects routes
    train_joint_from_config to the multi-object engine
    (`awesome/dataset/label_mode.py` MULTIPLE_OBJECTS)."""
    from awesome_tpu.runner.config import AwesomeConfig
    from awesome_tpu.runner.fbms_runner import FBMSRunner

    cfg = AwesomeConfig(
        output_folder=str(tmp_path / "out"),
        name_experiment="mo_dispatch",
        num_epochs=1,
        dataset_args={"dataset": {
            "dataset_path": seq_path,
            "label_mode": {"value": "multiple_objects"},
            "max_objects": 2,
            "training_batch_size": 2,
        }},
        prior_model_args=dict(
            hidden_units=8, flow_n_flows=2, convex_net_hidden_units=12,
            convex_net_hidden_layers=1,
        ),
        pretrain_args={"num_epochs": 30},
        optimizer_args={"lr": 1e-3},
    )
    cfg.compute_metrics_during_training_nth_epoch = 1
    runner = FBMSRunner.from_awesome_config(cfg, dataset_path=seq_path)
    runner.build()
    res = runner.train_joint_from_config(eval_epoch0=True)
    assert np.isfinite(res["loss"]).all()
    assert hasattr(runner, "multi_state")
    # both slots active, per-frame children present
    assert np.asarray(runner.multi_state.active).all()

    # the multi-object branch consumes the eval flags like the
    # single-object one: epoch-0 baseline + per-epoch evals land in the
    # joint tracker (indexed by TRAINING epoch), so save_joint_results
    # and the analytics table layer work on multi-object runs too
    tr = runner.joint_tracker
    s = tr.series.get(("MeanForegroundBinaryMIOU", "epoch", "eval"))
    assert s is not None and s.steps == [0, 1], (s and s.steps)
    ps = tr.series.get(
        ("PriorMeanForegroundBinaryMIOU", "epoch", "eval"))
    assert ps is not None and ps.steps == [0, 1]

    import tempfile

    from awesome_tpu.analytics.result_model import ResultModel

    with tempfile.TemporaryDirectory() as d:
        out = runner.save_joint_results(os.path.join(d, "run"))
        m = ResultModel.from_path(out)
        base = m.metric_at_epoch("PriorMeanForegroundBinaryMIOU", 0)
        assert base is not None and 0.0 <= base <= 1.0


def test_gt_mapping_empty_weak_labels():
    """A GT-labeled frame with zero trajectory points maps every region to
    no weak object (real FBMS: GT labels frames past the track range)."""
    from awesome_tpu.data.fbms import gt_object_id_weak_label_mapping

    gtc = np.zeros((2, 8, 8), bool)
    gtc[0, :4] = True
    gtc[1, 4:] = True
    mapping = gt_object_id_weak_label_mapping(
        gtc, np.array([100, 200]),
        np.zeros((0, 8, 8), bool), np.zeros((0,), np.int64),
    )
    assert mapping == {100: [], 200: [], 0: []}
