import os

import numpy as np
import pytest

from awesome_tpu.data.batching import bucket_size, pad_points, stack_padded
from awesome_tpu.data.convexity import ConvexityDataset, ConvexitySample
from awesome_tpu.data.image_sample import (
    assemble_channels,
    edge_map,
    semantic_features,
)
from awesome_tpu.data.split import split_indices
from awesome_tpu.data.synthetic import make_sample, synthetic_convexity_dataset


def test_synthetic_sample_conventions():
    s = make_sample(0, h=32, w=32)
    assert s.image.shape == (32, 32, 3)
    assert s.gt.shape == (32, 32)
    # fg = 0 convention
    assert (s.gt[s.fg_mask] == 0).all()
    assert set(np.unique(s.gt)) <= {0.0, 1.0}


def test_important_pixels_layout():
    s = make_sample(1, h=32, w=32)
    px, gt = s.important_pixels()
    assert px.shape[1] == 5 and gt.shape[1] == 1
    assert px.shape[0] == (s.fg_mask | s.bg_mask).sum()
    # normalized coords in [-0.5, 0.5]
    assert px[:, :2].min() >= -0.5 and px[:, :2].max() <= 0.5
    # rgb values match the image at those positions
    idx = np.argwhere(s.fg_mask | s.bg_mask)
    np.testing.assert_allclose(px[:, 2:], s.image[idx[:, 0], idx[:, 1]])


def test_hard_axis_scribble_noise_hits_training_labels():
    """The noisy-scribble hard axis must corrupt TRAINING labels while the
    evaluation GT stays clean. Membership flips alone are invisible to the
    pixel path (targets are the dense GT read at scribble positions, as in
    the reference's get_gt_important_pixels) — the sample carries a
    train_gt view whose values follow the scribble's CLAIMED class."""
    clean = make_sample(5, h=48, w=48, hard=0.0)
    assert clean.train_gt is None  # clean data: bit-identical legacy path

    s = make_sample(5, h=48, w=48, hard=1.0, flip_scale=3.0)
    scr = s.fg_mask | s.bg_mask
    # eval GT untouched by flips: it is the geometric object mask
    assert set(np.unique(s.gt)) <= {0.0, 1.0}
    # training label == the scribble's claimed class, everywhere
    claimed = np.where(s.fg_mask, 0.0, 1.0)
    np.testing.assert_array_equal(s.train_gt[scr], claimed[scr])
    # flips exist and are label noise w.r.t. the clean GT
    n_noisy = int((s.train_gt != s.gt)[scr].sum())
    assert n_noisy > 0
    # important_pixels targets follow train_gt, not gt
    px, tgt = s.important_pixels()
    idx = np.argwhere(scr)
    np.testing.assert_array_equal(tgt[:, 0], s.train_gt[idx[:, 0], idx[:, 1]])

    # the noise fraction scales with flip_scale (same seed, higher rate)
    s1 = make_sample(5, h=48, w=48, hard=1.0, flip_scale=1.0)
    scr1 = s1.fg_mask | s1.bg_mask
    n1 = int((s1.train_gt != s1.gt)[scr1].sum())
    assert n_noisy > n1


def test_scribble_percentage_topup():
    s = make_sample(2, h=32, w=32)
    px_full, _ = s.pixels(1.0)
    px_top, _ = s.pixels(0.5)
    assert px_top.shape[0] >= 2 * px_full.shape[0] - 1


def test_pad_and_bucket():
    assert bucket_size(1000) == 1024
    assert bucket_size(1025) == 2048
    px = np.ones((10, 5), np.float32)
    padded, mask = pad_points(px, 16)
    assert padded.shape == (16, 5)
    assert mask.sum() == 10
    batch, masks = stack_padded([np.ones((5, 5)), np.ones((9, 5))], granularity=8)
    assert batch.shape == (2, 16, 5)
    np.testing.assert_array_equal(masks.sum(axis=1), [5, 9])


def test_split_indices_seeded_and_persisted(tmp_path):
    t1, v1 = split_indices(50, 0.8, seed=7)
    t2, v2 = split_indices(50, 0.8, seed=7)
    assert t1 == t2 and v1 == v2
    assert len(t1) == 40 and len(v1) == 10
    f = str(tmp_path / "split.json")
    t3, v3 = split_indices(50, 0.8, seed=9, indices_file=f)
    # persisted file wins even with a different seed
    t4, v4 = split_indices(50, 0.8, seed=123, indices_file=f)
    assert t3 == t4 and v3 == v4


def test_convexity_dataset_from_disk(tmp_path):
    """Write a synthetic scene in the reference's directory layout and read
    it back through the directory-indexed loader."""
    from PIL import Image

    for sub in ("img", "ground_truth", "user_scribbles"):
        os.makedirs(tmp_path / sub)
    s = make_sample(3, h=24, w=24)
    Image.fromarray((s.image * 255).astype(np.uint8)).save(
        tmp_path / "img" / "img_1.png"
    )
    Image.fromarray(((1 - s.gt) * 255).astype(np.uint8)).save(
        tmp_path / "ground_truth" / "GT_1.png"
    )
    scr = np.zeros((24, 24), np.uint8)
    scr[s.bg_mask] = 128
    scr[s.fg_mask] = 255
    Image.fromarray(scr).save(tmp_path / "user_scribbles" / "scribbleMask_1.png")

    ds = ConvexityDataset(str(tmp_path))
    assert len(ds) == 1
    px, gt = ds[0]
    assert px.shape[1] == 5
    loaded = ds.load(0)
    # GT roundtrip: png value 255 (=1.0) -> class 0
    assert (loaded.gt[s.gt == 0] == 0).all()
    np.testing.assert_array_equal(loaded.fg_mask, s.fg_mask)


def test_edge_map_detects_edges():
    img = np.zeros((32, 32, 3), np.float32)
    img[:, 16:] = 1.0
    e = edge_map(img)
    assert e.shape == (32, 32)
    assert e[:, 14:18].mean() > 5 * (e[:, :8].mean() + 1e-6)


def test_semantic_features_pca():
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(16, 16, 8)).astype(np.float32)
    f = semantic_features(emb)
    assert f.shape == (16, 16, 2)
    assert f.min() >= 0 and f.max() <= 1


def test_assemble_channels_modes():
    img = np.zeros((8, 10, 3), np.float32)
    xy = assemble_channels(img, "xy")
    assert xy.shape == (8, 10, 2)
    xy_t = assemble_channels(img, "xy", t=1.0, t_max=4.0)
    assert xy_t.shape == (8, 10, 3)
    np.testing.assert_allclose(xy_t[..., 2], 0.25)
    scr = np.zeros((8, 10), np.int32)
    scr[0, 0] = 1
    scr[7, 9] = 2
    ds = assemble_channels(img, "distance_scribble", scribble=scr)
    assert ds.shape == (8, 10, 2)
    # channel i = distance to class i (max class = none-class, excluded)
    assert ds[4, 5, 0] == 0.0  # a class-0 pixel has zero distance to class 0
    assert ds[0, 0, 1] == 0.0  # the class-1 scribble pixel, channel 1
    assert ds[0, 0, 0] > 0.0  # but positive distance to class 0


def test_gauss_bubbles_channels():
    """Behavior of `awesome/dataset/transformator.py:85-118`: each channel
    is one normalized Gaussian bump (sum = scale) at a random interior
    location; deterministic under a seeded rng."""
    from awesome_tpu.data.image_sample import gauss_bubbles

    rng = np.random.default_rng(7)
    gb = gauss_bubbles((128, 140), n_bubbles=5, kernel_size=21, std=3.0,
                       rng=rng)
    assert gb.shape == (128, 140, 5)
    # each channel integrates to the scale factor (normalized kernel * 500)
    np.testing.assert_allclose(gb.sum(axis=(0, 1)), 500.0, rtol=1e-4)
    # bump peak is at the channel's center, kernel is symmetric around it
    ch = gb[..., 0]
    cy, cx = np.unravel_index(np.argmax(ch), ch.shape)
    assert ch[cy - 3, cx] == ch[cy + 3, cx]
    assert ch[cy, cx - 3] == ch[cy, cx + 3]
    # deterministic under the same seed
    gb2 = gauss_bubbles((128, 140), n_bubbles=5, kernel_size=21, std=3.0,
                        rng=np.random.default_rng(7))
    np.testing.assert_array_equal(gb, gb2)
    # reference hardcodes kernel 101: images must fit it
    with pytest.raises(ValueError):
        gauss_bubbles((64, 64))


def test_subdivisible_subset_view():
    """Subset view with two-way index remapping + split restriction.
    Spec: `awesome/dataset/subdivisible_dataset.py:13-124`."""
    import numpy as np

    from awesome_tpu.data.subdivisible import SubdivisibleDataset, SubsetView

    v = SubsetView(10, [2, 5, 7])
    assert len(v) == 3
    assert v.get_data_index(1) == 5
    assert v.get_subset_index(7) == 2
    assert v.get_subset_index(3) is None
    assert v.data_indices() == [2, 5, 7]
    train, val = v.subset_split_indices(
        np.asarray([0, 2, 5]), np.asarray([7, 8])
    )
    assert train.tolist() == [0, 1] and val.tolist() == [2]

    # identity (no subset)
    v0 = SubsetView(4)
    assert len(v0) == 4 and v0.get_data_index(3) == 3
    assert v0.get_subset_index(2) == 2

    # slice specifier + dataset wrapper
    class DS:
        def __len__(self):
            return 6

        def load(self, i):
            return i * 10

    sd = SubdivisibleDataset(DS(), subset=slice(1, 5, 2))
    assert len(sd) == 2
    assert sd.load(0) == 10 and sd[1] == 30
    assert sd.get_data_index(1) == 3

    import pytest as _pytest

    with _pytest.raises(IndexError):
        SubsetView(3, [5])


def test_fbms_per_frame_caching(tmp_path):
    """Memory + disk caching of (processed) weak labels.
    Spec: `fbms_sequence_sample.py:275-290`."""
    import numpy as np

    from awesome_tpu.data.fbms import FBMSSequenceDataset
    from tests.test_fbms import _write_sequence

    seq = _write_sequence(tmp_path)
    cache = str(tmp_path / "processed")
    ds = FBMSSequenceDataset(
        seq, use_memory_cache=True, processed_weak_labels_dir=cache,
        do_weak_label_preprocessing=True,
    )
    s1 = ds.sample(0)
    import os

    files = os.listdir(cache)
    assert len(files) == 1 and files[0].endswith("_0000.npz")
    assert 0 in ds._weak_label_cache
    # second access: identical content from the memory cache
    s2 = ds.sample(0)
    np.testing.assert_array_equal(s1["unaries"], s2["unaries"])
    # fresh dataset reuses the DISK cache
    ds2 = FBMSSequenceDataset(
        seq, processed_weak_labels_dir=cache,
        do_weak_label_preprocessing=True,
    )
    s3 = ds2.sample(0)
    np.testing.assert_array_equal(s1["unaries"], s3["unaries"])
    np.testing.assert_array_equal(s1["labeled"], s3["labeled"])


def test_scribble_image_and_sisbosi_depth():
    """ScribbleImage 2d/3d emission, patch crops, subset views.
    Spec: `awesome/dataset/sisbosi_dataset.py:26-181,223,432`."""
    import numpy as np

    from awesome_tpu.data.sisbosi import ScribbleImage, SISBOSIDataset
    from awesome_tpu.data.synthetic import synthetic_convexity_dataset

    samples = synthetic_convexity_dataset(n=3, h=40, w=40)
    scribble = np.full((40, 40), 2, np.uint8)
    scribble[samples[0].fg_mask] = 0
    scribble[samples[0].bg_mask] = 1
    si = ScribbleImage(image=samples[0].image, gt=samples[0].gt,
                       scribble=scribble)
    d3 = si["3d"]
    assert d3["rgb"].shape == (40, 40, 3)
    assert d3["xy"].shape == (40, 40, 2)
    assert d3["feat"].shape == (40, 40, 3)  # rgb fallback
    d2 = si["2d"]
    assert d2["rgb"].shape == (1600, 3)
    assert d2["xy_clean"].shape == (1600, 2)
    assert si.get_number_of_classes() == 2
    assert si.get_xy_dimension() == 2

    # patch crops restrict the emitted size
    ds = SISBOSIDataset(samples, augmentation=False, patch_size=16)
    s = ds.load(0)
    assert s.gt.shape == (16, 16)

    # subset views remap indices
    sub = SISBOSIDataset(samples, augmentation=False, subset=[2, 0])
    assert len(sub) == 2
    assert sub.get_data_index(0) == 2
    np.testing.assert_array_equal(sub.load(1).gt, samples[0].gt)

    # distance-scribble xy encoding
    si_d = ScribbleImage(image=samples[0].image, gt=samples[0].gt,
                         scribble=scribble, xy_mode="distance_scribble")
    assert si_d.xy.shape[-1] == 2  # per-class EDT channels (fg, bg)


def test_awesome_dataset_sample_mode():
    """mode='sample' emits the raw per-image record instead of model
    inputs (`awesome/dataset/awesome_dataset.py:37,72`)."""
    import numpy as np

    from awesome_tpu.data.awesome_dataset import AwesomeDataset
    from awesome_tpu.data.synthetic import synthetic_convexity_dataset

    samples = synthetic_convexity_dataset(n=2, h=16, w=16)
    ds = AwesomeDataset(samples, mode="sample")
    rec = ds[0]
    assert set(rec) == {"image", "label", "mask", "name", "clean_image"}
    assert rec["mask"].shape == (16, 16)
    assert set(np.unique(rec["mask"])) <= {0, 1, 2}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        AwesomeDataset(samples, mode="weird")


def test_fbms_h5_confidence_loading(tmp_path):
    """Reference-format h5 confidence maps feed the uncertainty
    re-labeling (`fbms_sequence_sample.py:525`)."""
    import os

    import h5py
    import numpy as np

    from awesome_tpu.data.fbms import FBMSSequenceDataset
    from tests.test_fbms import _write_sequence

    seq = _write_sequence(tmp_path)
    conf_dir = os.path.join(seq, "conf")
    os.makedirs(conf_dir)
    ds = FBMSSequenceDataset(seq, confidence_dir="conf",
                             do_weak_label_preprocessing=True)
    h, w = ds.load_frame(0).shape[:2]
    stem = os.path.splitext(os.path.basename(ds.frames[0]))[0]
    with h5py.File(os.path.join(conf_dir, f"{stem}.h5"), "w") as f:
        f.create_dataset("confidence", data=np.full((h, w), 0.9, np.float32))
    c = ds._load_confidence(0)
    assert c is not None and c.shape == (h, w)
    s = ds.sample(0)  # preprocessing path consumes the confidence
    assert np.isfinite(s["unaries"]).all()
