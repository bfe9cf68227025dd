import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awesome_tpu.core import tree as T
from awesome_tpu.nn.convex_diffeo import ConvexDiffeomorphismNet
from awesome_tpu.nn.flows import NormalizingFlow1D
from awesome_tpu.nn.icnn import ConvexNextNet
from awesome_tpu.nn.multi_prior import (
    MultiPriorModule,
    MultipleObjectsPathConnectedNet,
)
from awesome_tpu.nn.path_connected import real_nvp_path_connected_net
from awesome_tpu.nn.priors_extra import (
    PeriodicNet,
    RotationSymmetricNet,
    StarShapedNet,
)


def test_multi_prior_counts_and_apply():
    mp = MultiPriorModule(child=ConvexNextNet(n_hidden=8), max_priors=4)
    params = mp.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 2))
    out = mp.apply(params, x, num_priors=2)
    assert out.shape == (32, 2)
    # matches individually applied children
    child0 = mp.child.apply(T.tree_select(params["children"], 0), x)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(child0[:, 0]),
                               atol=1e-6)


def test_multi_prior_tree_is_gradable():
    """count is NOT a param leaf: value_and_grad over the whole tree works
    and every leaf is float (optimizer-safe) — CLAUDE.md invariant."""
    mp = MultiPriorModule(child=ConvexNextNet(n_hidden=8), max_priors=3)
    params = mp.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 2))

    def loss(p):
        return jnp.mean(mp.combine(mp.apply(p, x), count=2) ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert jnp.issubdtype(leaf.dtype, jnp.floating)
        assert np.isfinite(np.asarray(leaf)).all()
    # inactive slot (index 2) receives zero gradient through combine
    g2 = jax.tree_util.tree_leaves(T.tree_select(grads["children"], 2))
    assert all(np.allclose(np.asarray(g), 0.0) for g in g2)


def test_assure_prior_count_grow_reinits_new_slots():
    mp = MultiPriorModule(child=ConvexNextNet(n_hidden=8), max_priors=4)
    params = mp.init(jax.random.PRNGKey(0))
    before2 = T.tree_select(params["children"], 2)
    grown = mp.assure_prior_count(params, 2, 4, key=jax.random.PRNGKey(9))
    after2 = T.tree_select(grown["children"], 2)
    # slot 2 was re-initialized
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(after2),
                        jax.tree_util.tree_leaves(before2))
    )
    assert changed
    # slot 0 untouched
    for a, b in zip(
        jax.tree_util.tree_leaves(T.tree_select(grown["children"], 0)),
        jax.tree_util.tree_leaves(T.tree_select(params["children"], 0)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError):
        mp.assure_prior_count(params, 2, 9)


def test_multi_prior_combine_union():
    mp = MultiPriorModule(child=ConvexNextNet(n_hidden=8), max_priors=2)
    outs = jnp.asarray([[1.0, -2.0], [-3.0, 5.0]])
    combined = mp.combine(outs)
    np.testing.assert_allclose(np.asarray(combined[:, 0]), [-2.0, -3.0])
    # with an active count, inactive slots are ignored (and stay finite)
    combined1 = mp.combine(outs, count=1)
    np.testing.assert_allclose(np.asarray(combined1[:, 0]), [1.0, -3.0])
    assert np.isfinite(np.asarray(combined1)).all()


def test_multi_object_path_connected():
    child = real_nvp_path_connected_net(
        channels=2, hidden_units=8, flow_n_flows=2, spatial_shape=(8, 8),
        convex_net_hidden_units=8, convex_net_hidden_layers=1,
    )
    mp = MultipleObjectsPathConnectedNet(child=child, max_priors=3)
    params = mp.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 2))
    out = mp.apply(params, x, num_priors=3)
    assert out.shape == (16, 3)
    # convexity projection reaches all children
    clipped = mp.enforce_convexity(params)
    w = np.asarray(clipped["children"]["convex"]["out"]["ln"]["w"])
    assert w.min() >= 0.0
    # deformation inverse per child
    xd = mp.deformation(params, x, index=1)
    x_rec = mp.inverse(params, xd, index=1)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)


def test_convex_diffeo_translate():
    model = ConvexDiffeomorphismNet(
        flow=NormalizingFlow1D(num_coupling=2, width=8),
        convex=ConvexNextNet(n_hidden=8, n_hidden_layers=1),
    )
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 2))
    out_before = model.apply(params, x)
    assert out_before.shape == (64, 1)
    # translate: shift prior by (0.3, -0.1); after re-targeting, evaluating
    # at shifted points must reproduce the original outputs
    shift = jnp.asarray([0.3, -0.1])
    from_pts = x[:8]
    to_pts = from_pts + shift
    new_params = model.translate(params, from_pts, to_pts)
    out_shifted = model.apply(new_params, x + shift)
    np.testing.assert_allclose(
        np.asarray(out_shifted), np.asarray(model.apply(params, x)), atol=1e-4
    )
    # inverse roundtrip through the full linear layer
    xd = model.deformation(params, x)
    np.testing.assert_allclose(
        np.asarray(model.inverse(params, xd)), np.asarray(x), atol=1e-4
    )


@pytest.mark.parametrize(
    "cls", [StarShapedNet, RotationSymmetricNet, PeriodicNet]
)
def test_extra_priors_forward(cls):
    model = cls(n_hidden=16)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 2), minval=-1, maxval=1)
    out = model.apply(params, x)
    assert out.shape == (32, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_star_shaped_is_star_shaped():
    """Star-shape property: along any ray from the center, once the field
    exceeds the threshold it stays above (monotone in r after first exit).
    f(x) = r*g(u, r) - 1 with g >= 0 after relu-composition is monotone in
    r when the learned weights make it so; check empirically on rays after
    a projection-free init."""
    model = StarShapedNet(n_hidden=16)
    params = model.init(jax.random.PRNGKey(0))
    angles = np.linspace(0, 2 * np.pi, 16, endpoint=False)
    rs = np.linspace(0.01, 2.0, 64)
    for a in angles:
        pts = jnp.asarray(
            np.stack([rs * np.cos(a), rs * np.sin(a)], -1), jnp.float32
        )
        vals = np.asarray(model.apply(params, pts))[:, 0]
        inside = vals < 0
        # inside-set along the ray must be a prefix (star-shaped wrt center)
        if inside.any():
            last_inside = np.max(np.nonzero(inside)[0])
            assert inside[: last_inside + 1].all()


def test_convex_in_depth_prior():
    """Convex-in-(x, y, depth) prior (the convex-depth teaser notebook,
    `notebooks/icml_teaser_code/convex-depth/convex.ipynb`): the same ICNN
    family with a third input channel; sub-level sets stay convex in the
    3D (x, y, d) space, so a fit recovers a ball from its noisy unaries."""
    from awesome_tpu.fit.prior_fit import FitConfig, fit_prior
    from awesome_tpu.measures.metrics import iou

    n = 12
    zz, yy, xx = np.mgrid[0:n, 0:n, 0:n]
    ball = ((zz - n / 2) ** 2 + (yy - n / 2) ** 2 + (xx - n / 2) ** 2) <= (
        n / 3
    ) ** 2
    pts = np.stack([zz, yy, xx], -1).reshape(-1, 3) / n - 0.5
    target = jnp.asarray(
        1.0 - ball.reshape(-1, 1).astype(np.float32)
    )
    model = ConvexNextNet(n_hidden=24, n_hidden_layers=1, in_features=3)
    params = model.init(jax.random.PRNGKey(0))
    cfg = FitConfig(num_steps=300, lr=1e-2, fg_weight=0.5,
                    nan_guard_grads=False)
    fitted, _ = fit_prior(model, params, jnp.asarray(pts, jnp.float32),
                          target, cfg)
    prob = jax.nn.sigmoid(model.apply(fitted, jnp.asarray(pts, jnp.float32)))
    score = float(iou(prob > 0.5, target > 0.5, invert=True))
    assert score > 0.8, score
    # convexity along a segment THROUGH the 3D space: f(mid) <= max(f(a), f(b))
    a = jnp.asarray([[-0.4, -0.4, -0.4]], jnp.float32)
    b = jnp.asarray([[0.4, 0.4, 0.4]], jnp.float32)
    mid = (a + b) / 2
    fa, fb, fm = (float(model.apply(fitted, p)[0, 0]) for p in (a, b, mid))
    assert fm <= max(fa, fb) + 1e-5
