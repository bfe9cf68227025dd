import numpy as np

from awesome_tpu.data.weak_label_processing import (
    process_weak_label,
    relabel_uncertain,
    remove_foreground_outliers,
)


def _scene(h=64, w=64):
    unaries = np.ones((h, w), np.float32)
    labeled = np.zeros((h, w), bool)
    # fg cluster
    for y, x in [(10, 10), (11, 10), (10, 11), (12, 12)]:
        unaries[y, x] = 0.0
        labeled[y, x] = True
    # bg points
    for y, x in [(40, 40), (41, 41)]:
        labeled[y, x] = True
    return unaries, labeled


def test_outlier_removal():
    unaries, labeled = _scene()
    # isolated fg point far from the cluster (dist^2 > 1000)
    unaries[60, 60] = 0.0
    labeled[60, 60] = True
    u2, l2 = remove_foreground_outliers(unaries, labeled)
    assert not l2[60, 60] and u2[60, 60] == 1.0
    # cluster survives
    assert l2[10, 10] and u2[10, 10] == 0.0


def test_relabel_uncertain_flips_to_patch_majority():
    h = w = 64
    unaries = np.ones((h, w), np.float32)
    labeled = np.zeros((h, w), bool)
    # dense fg region around (16,16)
    unaries[10:22, 10:22] = 0.0
    labeled[10:22, 10:22] = True
    # one bg-labeled point inside the fg region, marked uncertain
    unaries[16, 16] = 1.0
    conf = np.full((h, w), 1.0, np.float32)
    conf[16, 16] = 0.1
    # some bg labels far away so both classes exist
    labeled[50:54, 50:54] = True
    u2, _ = relabel_uncertain(unaries, labeled, conf)
    assert u2[16, 16] == 0.0  # flipped to fg (patch majority)
    # confident points untouched
    assert u2[50, 50] == 1.0


def test_process_weak_label_pipeline():
    unaries, labeled = _scene()
    conf = np.full(unaries.shape, 1.0, np.float32)
    u2, l2 = process_weak_label(unaries, labeled, conf)
    assert u2.shape == unaries.shape
    np.testing.assert_array_equal(l2, labeled)
