import jax.numpy as jnp
import numpy as np
import pytest

from awesome_tpu.measures import losses as L
from awesome_tpu.measures import metrics as M


def test_se_reductions():
    o = jnp.asarray([1.0, 2.0])
    t = jnp.asarray([0.0, 4.0])
    assert float(L.se(o, t, "sum")) == 5.0
    assert float(L.se(o, t, "mean")) == 2.5
    np.testing.assert_allclose(np.asarray(L.se(o, t, "none")), [1.0, 4.0])


def test_bce_matches_formula():
    o = jnp.asarray([0.8, 0.2])
    t = jnp.asarray([1.0, 0.0])
    expect = -(np.log(0.8) + np.log(0.8)) / 2
    np.testing.assert_allclose(float(L.bce(o, t)), expect, rtol=1e-5)


def test_unaries_weight_modes():
    # 3 bg (>= .5), 1 fg
    t = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    np.testing.assert_allclose(np.asarray(L.unaries_weight(t, "none")), 1.0)
    w = np.asarray(L.unaries_weight(t, "equal"))
    np.testing.assert_allclose(w, [1, 1, 1, 3.0])
    w = np.asarray(L.unaries_weight(t, "ratio", ratio=0.5))
    np.testing.assert_allclose(w, [1, 1, 1, 2.0])
    # sssdms: round((3/1)/10)+1 = 1
    w = np.asarray(L.unaries_weight(t, "sssdms"))
    np.testing.assert_allclose(w, [1, 1, 1, 1.0])
    # with a large imbalance: 100 bg, 2 fg -> round(50/10)+1 = 6
    t2 = jnp.concatenate([jnp.ones(100), jnp.zeros(2)])
    w2 = np.asarray(L.unaries_weight(t2, "sssdms"))
    np.testing.assert_allclose(w2[-1], 6.0)


def test_unaries_weighted_loss_mean():
    t = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    o = jnp.asarray([0.5, 0.5, 0.5, 0.5])
    # equal weights: fg weight = 1 -> plain mean of 0.25
    val = L.unaries_weighted_loss(o, t, criterion=L.se, mode="equal")
    np.testing.assert_allclose(float(val), 0.25, rtol=1e-6)


def test_awesome_loss_channels():
    # (N, 2) output, target (N, 1)
    out = jnp.stack(
        [jnp.asarray([0.9, 0.1]), jnp.asarray([0.8, 0.2])], axis=-1
    )  # (2,2): ch0 seg, ch1 prior
    tgt = jnp.asarray([[1.0], [0.0]])
    val = L.awesome_loss(out, tgt, criterion=L.bce, alpha=1.0)
    seg = L.bce(out[..., 0:1], tgt)
    prior = L.bce(out[..., 1:2], tgt)
    np.testing.assert_allclose(float(val), float(seg + prior), rtol=1e-6)


def test_fbms_joint_loss_clip():
    # prior far from seg -> penalty would dominate; clip caps it at seg loss
    seg = jnp.full((1, 1, 4, 4), 0.6)
    prior = jnp.full((1, 1, 4, 4), 0.01)
    out = jnp.concatenate([seg, prior], axis=1)
    tgt = jnp.ones((1, 1, 4, 4))
    res = L.fbms_joint_loss(out, tgt, beta=100.0)
    seg_part = float(res["segmentation_loss"])
    assert float(res["loss"]) <= 2 * seg_part + 1e-5


def test_iou_basic_and_invert():
    o = jnp.asarray([[1, 1, 0, 0]])
    t = jnp.asarray([[1, 0, 1, 0]])
    np.testing.assert_allclose(float(M.iou(o, t)), 1 / 3, rtol=1e-6)
    # inverted: complement masks [0011] vs [0101] -> 1/3 as well
    np.testing.assert_allclose(float(M.iou(o, t, invert=True)), 1 / 3, rtol=1e-6)


def test_iou_all_zero_target():
    o = jnp.zeros((4, 4))
    t = jnp.zeros((4, 4))
    assert float(M.iou(o, t)) == 0.0


def test_miou_batch():
    o = jnp.asarray([[[1, 1]], [[1, 0]]], dtype=jnp.float32)
    t = jnp.asarray([[[1, 1]], [[1, 1]]], dtype=jnp.float32)
    np.testing.assert_allclose(float(M.miou(o, t)), (1.0 + 0.5) / 2, rtol=1e-6)


def test_pixel_accuracy():
    o = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    t = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(float(M.pixel_accuracy(o, t)), 0.75)


def test_boundary_f1_perfect():
    m = jnp.zeros((16, 16)).at[4:12, 4:12].set(1.0)
    assert float(M.boundary_f1(m, m)) > 0.99


def test_total_variation():
    img = jnp.zeros((4, 4)).at[:, 2:].set(1.0)
    # one column edge of height 4
    np.testing.assert_allclose(float(L.total_variation(img, "sum")), 4.0)


def test_gradient_penalty_runs():
    def model_fn(x):
        return (x**2).sum(axis=-1, keepdims=True)

    x = jnp.ones((8, 7)) * 0.3
    t = jnp.ones((8, 1)) * 0.5
    base = L.gradient_penalty(model_fn, x, t)
    with_pen = L.gradient_penalty(model_fn, x, t, xy_weight=1.0)
    assert float(with_pen) > float(base)


def test_iou_np_parity_with_device_iou():
    """The host numpy twins used by the runner eval loops must match the
    jnp metrics bit-for-bit across thresholds, inversion, noneclass
    masking, and the all-zero-union convention."""
    rng = np.random.default_rng(0)
    for _ in range(20):
        o = rng.random((13, 17)).astype(np.float32)
        t = (rng.random((13, 17)) > 0.5).astype(np.float32)
        np.testing.assert_allclose(
            M.iou_np(o, t), float(M.iou(o, t)), rtol=1e-6)
        np.testing.assert_allclose(
            M.iou_np(o, t, invert=True),
            float(M.iou(o, t, invert=True)), rtol=1e-6)
        np.testing.assert_allclose(
            M.pixel_accuracy_np(o, t),
            float(M.pixel_accuracy(o, t)), rtol=1e-6)
    # noneclass masking
    t2 = t.copy()
    t2[0, :] = 0.5
    np.testing.assert_allclose(
        M.iou_np(o, t2, noneclass=0.5),
        float(M.iou(o, t2, noneclass=0.5)), rtol=1e-6)
    np.testing.assert_allclose(
        M.pixel_accuracy_np(o, t2, noneclass=0.5),
        float(M.pixel_accuracy(o, t2, noneclass=0.5)), rtol=1e-6)
    # all-zero union -> 0.0 (sklearn convention)
    z = np.zeros((4, 4))
    assert M.iou_np(z, z) == float(M.iou(z, z)) == 0.0
