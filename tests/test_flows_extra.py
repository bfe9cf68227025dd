import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awesome_tpu.core.affine import (
    apply_homogeneous,
    transformation_matrix_2d,
    transformation_matrix_3d,
)
from awesome_tpu.data.awesome_dataset import AwesomeDataset, PriorCache
from awesome_tpu.data.synthetic import synthetic_convexity_dataset
from awesome_tpu.nn.flows_extra import GlowFlow, SplineFlow
from awesome_tpu.nn.icnn import ConvexNextNet


@pytest.mark.parametrize(
    "flow",
    [
        GlowFlow(channels=2, hidden_channels=16, n_flows=3),
        SplineFlow(channels=2, hidden_units=16, n_flows=3, num_bins=6),
    ],
)
def test_extra_flows_invertible(flow):
    params = flow.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 2), minval=-1,
                           maxval=1)
    y = flow.apply(params, x)
    x_rec = flow.inverse(params, y)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=2e-4)


def test_spline_identity_at_init():
    flow = SplineFlow(channels=2, hidden_units=16, n_flows=2, num_bins=6)
    params = flow.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 2), minval=-2,
                           maxval=2)
    np.testing.assert_allclose(
        np.asarray(flow.apply(params, x)), np.asarray(x), atol=1e-2
    )


def test_extra_flows_trainable():
    """Invertibility must survive a few gradient steps (masks static)."""
    flow = GlowFlow(channels=2, hidden_channels=8, n_flows=2)
    params = flow.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 2))
    target = x[:, ::-1]

    def loss(p):
        return jnp.mean((flow.apply(p, x) - target) ** 2)

    g = jax.grad(loss)
    for _ in range(10):
        grads = g(params)
        params = jax.tree_util.tree_map(lambda p, gr: p - 0.05 * gr, params,
                                        grads)
    y = flow.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(flow.inverse(params, y)), np.asarray(x), atol=1e-3
    )


def test_affine_matrices():
    m = transformation_matrix_2d(rotation=np.pi / 2, translation=(1.0, 0.0))
    pts = jnp.asarray([[1.0, 0.0]])
    out = apply_homogeneous(m, pts)
    np.testing.assert_allclose(np.asarray(out), [[1.0, 1.0]], atol=1e-6)
    m3 = transformation_matrix_3d(rotations=[(np.pi, "z")],
                                  translation=(0, 0, 1))
    out3 = apply_homogeneous(m3, jnp.asarray([[1.0, 0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(out3), [[-1, 0, 1]], atol=1e-6)


def test_awesome_dataset_2d_and_3d():
    samples = synthetic_convexity_dataset(n=2, h=24, w=24)
    ds2 = AwesomeDataset(samples, dimension="2d", supervision_mode="weakly",
                         scribble_percentage=0.8)
    s = ds2[0]
    n = s.target.shape[0]
    assert s.image.shape[1] == 3 and s.feature_encoding.shape[1] == 2
    assert s.image.shape[0] >= n  # random top-up appended
    # weak labels: fg scribbles are 0
    assert set(np.unique(s.target)) <= {0.0, 1.0}

    ds3 = AwesomeDataset(samples, dimension="3d", supervision_mode="full")
    s3 = ds3[1]
    assert s3.image.shape == (24, 24, 3)
    assert s3.target.shape == (24, 24, 1)
    np.testing.assert_array_equal(s3.target[..., 0], samples[1].gt)


def test_awesome_dataset_temporal_and_edge():
    samples = synthetic_convexity_dataset(n=3, h=16, w=16)
    ds = AwesomeDataset(samples, dimension="3d", supervision_mode="full",
                        feature_mode="edge", temporal=True)
    s = ds[1]
    # xy + t + edge channels
    assert s.feature_encoding.shape == (16, 16, 4)
    np.testing.assert_allclose(s.feature_encoding[..., 2], 0.5)


def test_prior_cache_api():
    model = ConvexNextNet(n_hidden=8)
    cache = PriorCache(model, 4)
    p1 = cache.extract_prior(1)
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, p1)
    cache.apply_prior(1, zeroed)
    out = cache.extract_prior(1)
    assert all(
        float(jnp.abs(x).max()) == 0.0
        for x in jax.tree_util.tree_leaves(out)
    )
    # other entries untouched
    assert any(
        float(jnp.abs(x).max()) > 0
        for x in jax.tree_util.tree_leaves(cache.extract_prior(0))
    )
