import jax
import jax.numpy as jnp
import numpy as np

from awesome_tpu.core.transforms import MinMax
from awesome_tpu.data.sisbosi import (
    SISBOSIDataset,
    augment,
    remove_semantic_information,
)
from awesome_tpu.data.synthetic import synthetic_convexity_dataset
from awesome_tpu.nn.adapters import DenseNet, ForwardModule, NormNet
from awesome_tpu.nn.flows import RealNVPFlow
from awesome_tpu.utils.shims import batcherize, pixelize, temporary_attrs


def test_pixelize_decorator():
    @pixelize()
    def double(points):
        return points * 2.0

    x = jnp.arange(24.0).reshape(1, 2, 3, 4)
    out = double(x)
    assert out.shape == (1, 2, 3, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2)


def test_batcherize_decorator():
    @batcherize(expected_dim=4)
    def fn(x):
        assert x.ndim == 4
        return x + 1

    out = fn(jnp.zeros((2, 3, 4)))
    assert out.shape == (2, 3, 4)


def test_temporary_attrs():
    class A:
        mode = "a"

        class inner:
            flag = True

    obj = A()
    with temporary_attrs(obj, mode="b", **{"inner.flag": False}):
        assert obj.mode == "b" and obj.inner.flag is False
    assert obj.mode == "a" and obj.inner.flag is True


def test_adapters():
    fm = ForwardModule()
    x = jnp.ones((4, 3))
    np.testing.assert_array_equal(np.asarray(fm.apply(fm.init(None), x)),
                                  np.asarray(x))
    dn = DenseNet(in_features=3, out_features=2, width=8, depth=2)
    params = dn.init(jax.random.PRNGKey(0))
    assert dn.apply(params, x).shape == (4, 2)

    flow = RealNVPFlow(channels=2, hidden_units=8, n_flows=2)
    norm = MinMax(jnp.zeros(2), jnp.ones(2) * 2)
    nn_ = NormNet(net=flow, norm=norm)
    p = nn_.init(jax.random.PRNGKey(0))
    pts = jax.random.uniform(jax.random.PRNGKey(1), (16, 2)) * 2
    y = nn_.apply(p, pts)
    np.testing.assert_allclose(np.asarray(nn_.inverse(p, y)), np.asarray(pts),
                               atol=1e-5)


def test_remove_semantic_information():
    labels = np.asarray([[5, 9], [9, 30]])
    out = remove_semantic_information(labels)
    np.testing.assert_array_equal(out, [[0, 1], [1, 2]])


def test_sisbosi_augmentation():
    samples = synthetic_convexity_dataset(n=1, h=24, w=24)
    ds = SISBOSIDataset(samples, augmentation=True, seed=0)
    px1, gt1 = ds[0]
    px2, gt2 = ds[0]
    assert px1.shape[1] == 5 and gt1.shape[1] == 1
    # fresh augmentation each draw -> different pixel sets or values
    assert px1.shape != px2.shape or not np.allclose(px1, px2)
    # no augmentation -> deterministic
    ds2 = SISBOSIDataset(samples, augmentation=False)
    a, _ = ds2[0]
    b, _ = ds2[0]
    np.testing.assert_array_equal(a, b)


def test_augment_preserves_mask_alignment():
    s = synthetic_convexity_dataset(n=1, h=32, w=32)[0]
    scribble = np.zeros(s.gt.shape, np.uint8)
    scribble[s.bg_mask] = 1
    scribble[s.fg_mask] = 2
    rng = np.random.default_rng(3)
    img, gt, scr = augment(s.image, s.gt, scribble, rng)
    assert img.shape == s.image.shape
    assert img.min() >= 0 and img.max() <= 1
    # fg scribbles still mostly on the object (gt == 0)
    fg = scr == 2
    if fg.sum() > 0:
        assert (gt[fg] < 0.5).mean() > 0.7


def test_fourier_roundtrip_and_shift():
    import numpy as np

    from awesome_tpu.utils.shims import fourier, inverse_fourier

    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 16)).astype(np.float32)
    spec = fourier(x)
    # forward norm: DC bin (centered by fftshift) equals the mean
    np.testing.assert_allclose(complex(spec[4, 8]), x.mean(), atol=1e-6)
    back = inverse_fourier(spec)
    np.testing.assert_allclose(np.asarray(back.real), x, atol=1e-5)
