import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awesome_tpu.nn.convex_modules import (
    ConvexInitialiser,
    ConvexLayerNorm,
    ConvexLinear,
    ConvexMLP,
    TraditionalInitialiser,
    clipped_positivity,
    exponential_positivity,
    negexp_positivity,
    no_positivity,
)


def test_positivity_transforms():
    w = jnp.asarray([-1.0, 0.0, 2.0])
    np.testing.assert_allclose(np.asarray(no_positivity(w)), [-1, 0, 2])
    np.testing.assert_allclose(np.asarray(clipped_positivity(w)), [0, 0, 2])
    ne = np.asarray(negexp_positivity(w))
    np.testing.assert_allclose(ne, [np.exp(-1), 0, 2])
    ex = np.asarray(exponential_positivity(w))
    assert (ex > 0).all()


def test_convex_linear_effective_weights_positive():
    layer = ConvexLinear(4, 3, positivity="exp")
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (10, 4))
    out = layer.apply(params, x)
    assert out.shape == (10, 3)
    # effective weight positive regardless of raw sign
    assert (np.asarray(jnp.exp(params["w"])) > 0).all()


def test_convex_initialiser_statistics():
    init = ConvexInitialiser()
    params = init.init(jax.random.PRNGKey(0), 400, 300, positivity="exp")
    w = np.exp(np.asarray(params["w"]))  # effective weights
    (mean_sq, w_var), (b_mean, _) = init.compute_parameters(400)
    np.testing.assert_allclose(w.mean(), np.sqrt(mean_sq), rtol=0.05)
    # the underlying normal has sigma^2 ~ 5.3: the log-normal is extremely
    # heavy-tailed and empirical variance is a noisy underestimate — check
    # order of magnitude only
    assert 0.1 * w_var < w.var() < 10 * w_var
    np.testing.assert_allclose(np.asarray(params["b"]).mean(), b_mean,
                               rtol=0.05)


def test_traditional_initialiser():
    init = TraditionalInitialiser(gain=2.0)
    params = init.init(jax.random.PRNGKey(0), 100, 50)
    w = np.asarray(params["w"])
    np.testing.assert_allclose(w.var(), 2.0 / 100, rtol=0.2)
    np.testing.assert_allclose(np.asarray(params["b"]), 0.0)


def test_convex_mlp_is_convex():
    model = ConvexMLP(in_features=2, hidden=32, depth=2)
    params = model.init(jax.random.PRNGKey(0))
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    a = jax.random.uniform(k1, (256, 2), minval=-1, maxval=2)
    b = jax.random.uniform(k2, (256, 2), minval=-1, maxval=2)
    mid = 0.5 * (a + b)
    fa, fb, fm = (model.apply(params, x) for x in (a, b, mid))
    viol = float(jnp.max(fm - 0.5 * (fa + fb)))
    assert viol <= 5e-3, viol
    # convexity holds even after arbitrary gradient updates (no projection
    # needed: positivity is a reparameterization)
    g = jax.grad(lambda p: jnp.sum(model.apply(p, a) ** 2))(params)
    params2 = jax.tree_util.tree_map(lambda p, gr: p - 0.1 * gr, params, g)
    fa2, fb2, fm2 = (model.apply(params2, x) for x in (a, b, mid))
    assert float(jnp.max(fm2 - 0.5 * (fa2 + fb2))) <= 5e-3


def test_convex_layer_norm():
    ln = ConvexLayerNorm(8)
    params = ln.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8)) * 3 + 1
    y = ln.apply(params, x)
    np.testing.assert_allclose(np.asarray(y).mean(-1), 0, atol=1e-5)
