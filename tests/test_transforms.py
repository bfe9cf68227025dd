import jax
import jax.numpy as jnp
import numpy as np

from awesome_tpu.core.transforms import MeanStd, MinMax


def test_minmax_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(4, 3, 8, 8)).astype(np.float32))
    t = MinMax.fit(x, dim=(0, 2, 3))
    y = t.transform(x)
    assert float(y.min()) >= -1e-6 and float(y.max()) <= 1 + 1e-6
    np.testing.assert_allclose(
        np.asarray(t.inverse_transform(y)), np.asarray(x), atol=1e-5
    )


def test_minmax_custom_range(rng):
    x = jnp.asarray(rng.uniform(size=(10, 2)).astype(np.float32))
    t = MinMax.fit(x, dim=0, new_min=-1.0, new_max=1.0)
    y = t.transform(x)
    np.testing.assert_allclose(np.asarray(y).min(axis=0), -1, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y).max(axis=0), 1, atol=1e-6)


def test_meanstd_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32) * 5 + 2)
    t = MeanStd.fit(x, dim=0)
    y = t.transform(x)
    np.testing.assert_allclose(np.asarray(y).mean(axis=0), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y).std(axis=0), 1, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(t.inverse_transform(y)), np.asarray(x), atol=1e-4
    )


def test_transforms_are_pytrees(rng):
    x = jnp.asarray(rng.uniform(size=(10, 2)).astype(np.float32))
    t = MinMax.fit(x, dim=0)

    @jax.jit
    def f(t_, x_):
        return t_.transform(x_)

    np.testing.assert_allclose(np.asarray(f(t, x)), np.asarray(t.transform(x)))
