import numpy as np

from awesome_tpu.data.weak_label_processing import (
    flip_on_probability,
    flip_probabilities,
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


def _patch_scene(h=64, w=64):
    unaries = np.ones((h, w), np.float32)
    labeled = np.zeros((h, w), bool)
    # dense fg region around (16,16)
    unaries[10:22, 10:22] = 0.0
    labeled[10:22, 10:22] = True
    # one bg-labeled point inside the fg region
    unaries[16, 16] = 1.0
    # some bg labels far away so both classes exist
    labeled[50:54, 50:54] = True
    return unaries, labeled


def test_flip_probabilities_follow_patch_votes():
    unaries, labeled = _patch_scene()
    p_to_fg, p_to_bg = flip_probabilities(unaries, labeled, patch_radius=64)
    # the bg point inside the fg region has a high fg-vote share
    assert p_to_fg[16, 16] > 0.8
    # fg points may flip to bg only with the (small) bg vote share
    assert 0.0 < p_to_bg[12, 12] < 0.2
    # unlabeled points never flip
    assert p_to_fg[30, 30] == 0.0 and p_to_bg[30, 30] == 0.0


def test_global_frequency_weighting():
    """A globally-dominant (>900 points) class is trusted: its points never
    flip, and flips TOWARD it are capped at 0.3 vote share
    (`fbms_sequence_sample.py:624,658-662`)."""
    h = w = 128
    unaries = np.ones((h, w), np.float32)
    labeled = np.zeros((h, w), bool)
    labeled[64:, :] = True  # 8192 bg points -> globally dominant
    unaries[10:30, 10:30] = 0.0
    labeled[10:30, 10:30] = True  # 400 fg points
    p_to_fg, p_to_bg = flip_probabilities(unaries, labeled, patch_radius=64)
    # bg dominant: no flips to fg at all (own-label trust)
    assert (p_to_fg == 0.0).all()
    # fg points can still flip to bg, capped at 0.3
    assert p_to_bg.max() <= 0.3 + 1e-9
    assert p_to_bg[20, 20] > 0.0


def test_flip_on_probability_sampling():
    unaries = np.ones((8, 8), np.float32)
    p_to_fg = np.zeros((8, 8))
    p_to_fg[2, 2] = 1.0  # certain flip
    out = flip_on_probability(
        unaries, p_to_fg, np.zeros((8, 8)), np.random.default_rng(0)
    )
    assert out[2, 2] == 0.0
    assert (out[0] == 1.0).all()


def test_relabel_uncertain_gates_on_confidence():
    unaries, labeled = _patch_scene()
    conf = np.full(unaries.shape, 1.0, np.float32)
    conf[16, 16] = 0.1  # only this point is uncertain
    rng = np.random.default_rng(1)
    u2, _ = relabel_uncertain(unaries, labeled, conf, rng=rng)
    # confident points untouched even where patch votes disagree
    assert u2[50, 50] == 1.0
    assert (u2[10:22, 10:22][u2[10:22, 10:22] != unaries[10:22, 10:22]]
            .size in (0, 1))
    # the uncertain bg point flips to fg with ~0.9 probability; assert the
    # seeded draw (deterministic given rng(1))
    p_to_fg, _ = flip_probabilities(unaries, labeled, patch_radius=64)
    r = np.random.default_rng(1).random(unaries.shape + (2,))
    expected = 0.0 if r[16, 16, 0] < p_to_fg[16, 16] else 1.0
    assert u2[16, 16] == expected


def test_process_weak_label_pipeline():
    unaries, labeled = _scene()
    conf = np.full(unaries.shape, 1.0, np.float32)
    u2, l2 = process_weak_label(unaries, labeled, conf)
    assert u2.shape == unaries.shape
    np.testing.assert_array_equal(l2, labeled)
