"""FBMS dataset tests on a synthetic sequence written in the reference's
directory layout (tracks file, Def.dat, GT PNGs)."""
import os

import numpy as np
import pytest

from awesome_tpu.data.fbms import (
    FBMSSequenceDataset,
    GroundTruthDescription,
    Trajectory,
    parse_trajectories_file,
    trajectories_frame_to_mask,
    weak_label_unaries,
)


def _write_sequence(root, n_frames=5, h=24, w=32):
    """Synthetic moving-disk sequence in FBMS layout (geometry only —
    serialization delegates to ``write_fbms_layout``)."""
    from awesome_tpu.data.synthetic import write_fbms_layout

    rng = np.random.default_rng(0)
    trajs = []
    # object 1: points following the disk; object 0: background points
    for oid, n_traj in ((1, 12), (0, 20)):
        for t in range(n_traj):
            x0 = rng.uniform(4, 10) if oid == 1 else rng.uniform(0, w - 1)
            y0 = rng.uniform(8, 16) if oid == 1 else rng.uniform(0, h - 1)
            pts = [
                (min(x0 + (3 * f if oid == 1 else 0), w - 1), y0, f)
                for f in range(n_frames)
            ]
            trajs.append((oid, pts))
    yy, xx = np.mgrid[0:h, 0:w]

    def _disk(i):
        return ((yy - 12) ** 2 + (xx - (7 + 3 * i)) ** 2) <= 36

    frames = []
    for i in range(n_frames):
        img = np.zeros((h, w, 3), np.uint8) + 30
        img[_disk(i)] = 200
        frames.append(img)
    gt_masks = {
        i: np.where(_disk(i), 255, 0).astype(np.uint8)
        for i in (0, n_frames - 1)
    }
    return write_fbms_layout(root, "cars99", n_frames, trajs, frames,
                             gt_masks)


def test_parse_trajectories_native_matches_python(tmp_path):
    seq = _write_sequence(tmp_path)
    path = os.path.join(seq, "tracks", "multicut", "cars99.dat")
    native = parse_trajectories_file(path, use_native=True)
    python = parse_trajectories_file(path, use_native=False)
    assert len(native) == len(python) == 32
    for a, b in zip(native, python):
        assert a.object_id == b.object_id
        np.testing.assert_allclose(a.coordinates, b.coordinates)
        np.testing.assert_array_equal(a.frame_ids, b.frame_ids)


def test_frame_to_mask():
    trajs = [
        Trajectory(1, np.asarray([[2.0, 3.0], [4.0, 5.0]]),
                   np.asarray([0, 1])),
        Trajectory(0, np.asarray([[0.0, 0.0]]), np.asarray([0])),
    ]
    mask, ids = trajectories_frame_to_mask(trajs, 0, (8, 8))
    assert list(ids) == [0, 1]
    assert mask[1, 3, 2] == 1.0  # (x=2, y=3) -> mask[y, x]
    assert mask[0, 0, 0] == 1.0
    assert mask.sum() == 2


def test_weak_label_unaries_and_noise():
    trajs = [
        Trajectory(1, np.asarray([[2.0, 2.0]]), np.asarray([0])),
        Trajectory(0, np.asarray([[6.0, 6.0]]), np.asarray([0])),
    ]
    u, labeled = weak_label_unaries(trajs, 0, (8, 8))
    assert u[2, 2] == 0.0 and u[6, 6] == 1.0
    assert labeled[2, 2] and labeled[6, 6] and labeled.sum() == 2
    # full flip
    u2, _ = weak_label_unaries(
        trajs, 0, (8, 8), flip_probability=1.0,
        rng=np.random.default_rng(0),
    )
    assert u2[2, 2] == 1.0


def test_gt_description_parse(tmp_path):
    seq = _write_sequence(tmp_path)
    d = GroundTruthDescription.from_file(
        os.path.join(seq, "GroundTruth", "cars99Def.dat")
    )
    assert d.total_number_of_regions == 2
    assert d.total_number_of_frames == 5
    assert d.total_number_of_labeled_frames == 2
    assert [f.frame_index for f in d.frame_descriptions] == [0, 4]
    np.testing.assert_array_equal(d.scale_of_regions, [100, 50])
    assert d.confusion_penalty_matrix.shape == (2, 2)


def test_sequence_dataset_end_to_end(tmp_path):
    seq = _write_sequence(tmp_path)
    ds = FBMSSequenceDataset(seq)
    assert len(ds) == 5
    assert ds.get_ground_truth_indices() == [0, 4]
    s = ds.sample(2)
    assert s["image"].shape == (24, 32, 3)
    assert s["xyt"].shape == (24, 32, 3)
    np.testing.assert_allclose(s["xyt"][..., 2], 0.5)  # t=2, t_max=4
    # weak fg labels follow the moving disk: frame 2 disk center x = 13
    fg = (s["unaries"] == 0) & s["labeled"]
    ys, xs = np.nonzero(fg)
    assert len(xs) > 0 and abs(xs.mean() - 13) < 4
    # GT present only for labeled frames
    assert ds.sample(0)["gt"] is not None
    assert s["gt"] is None
    gt0 = ds.sample(0)["gt"]
    # fg = 0 convention, disk at frame 0 centered at x=7
    assert gt0[12, 7] == 0.0 and gt0[0, 0] == 1.0
