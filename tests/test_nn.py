"""Property tests for the prior nets: convexity after projection,
flow invertibility, init distributions — the constraint specs from
SURVEY.md §4 (2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awesome_tpu.core import tree as T
from awesome_tpu.nn.flows import (
    DiffeomorphismNet,
    NormalizingFlow1D,
    RealNVPFlow,
    binary_counting_masks,
    capped_exp,
)
from awesome_tpu.nn.icnn import ConvexNet, ConvexNextNet
from awesome_tpu.nn.linear import Linear, PerChannelAffine, WNLinear, wn_weight
from awesome_tpu.nn.path_connected import (
    PathConnectedNet,
    real_nvp_path_connected_net,
)


def _convexity_violation(model, params, key, n_pairs=256):
    """max over segment midpoints of f(mid) - (f(a)+f(b))/2 (should be <= 0
    for a convex function)."""
    k1, k2 = jax.random.split(key)
    a = jax.random.uniform(k1, (n_pairs, 2), minval=-1.0, maxval=2.0)
    b = jax.random.uniform(k2, (n_pairs, 2), minval=-1.0, maxval=2.0)
    mid = 0.5 * (a + b)
    fa, fb, fm = (model.apply(params, x) for x in (a, b, mid))
    return float(jnp.max(fm - 0.5 * (fa + fb)))


@pytest.mark.parametrize("cls", [ConvexNet, ConvexNextNet])
def test_icnn_convex_after_projection(cls):
    model = cls()
    key = jax.random.PRNGKey(0)
    params = model.init(key)
    params = model.enforce_convexity(params)
    viol = _convexity_violation(model, params, jax.random.PRNGKey(1))
    # f32 cancellation over 130 mixed-sign hidden units gives ~1e-3 absolute
    # noise (verified against a float64 NumPy reimplementation: violation
    # is <= 0 exactly); tolerance reflects eval precision, not the property.
    assert viol <= 5e-3, f"midpoint convexity violated by {viol}"


def test_icnn_clip_only_hidden_weights():
    model = ConvexNextNet(n_hidden_layers=2)
    params = model.init(jax.random.PRNGKey(0))
    clipped = model.enforce_convexity(params)
    # hidden ln weights nonnegative
    for blk in clipped["skip"]:
        assert float(blk["ln"]["w"].min()) >= 0.0
    assert float(clipped["out"]["ln"]["w"].min()) >= 0.0
    # input layer and skips untouched
    np.testing.assert_array_equal(
        np.asarray(clipped["input"]["w"]), np.asarray(params["input"]["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(clipped["skip"][0]["skp"]["w"]),
        np.asarray(params["skip"][0]["skp"]["w"]),
    )


def test_capped_exp():
    x = jnp.asarray([-1.0, 0.0, 4.9, 5.1, 100.0])
    y = capped_exp(x)
    assert np.isfinite(np.asarray(y)).all()
    np.testing.assert_allclose(float(y[1]), 1.0)
    assert float(y[4]) < np.exp(5.0) + 2.0


@pytest.mark.parametrize(
    "flow",
    [
        DiffeomorphismNet(),
        NormalizingFlow1D(num_coupling=4, width=16),
        NormalizingFlow1D(num_coupling=2, width=16, backbone="normal_block"),
        RealNVPFlow(channels=2, hidden_units=16, n_flows=6),
    ],
)
def test_flow_invertibility(flow):
    key = jax.random.PRNGKey(0)
    params = flow.init(key)
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 2))
    y = flow.apply(params, x)
    x_rec = flow.inverse(params, y)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)


def test_realnvp_starts_as_identity():
    flow = RealNVPFlow(channels=2, hidden_units=16, n_flows=4)
    params = flow.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 2))
    np.testing.assert_allclose(
        np.asarray(flow.apply(params, x)), np.asarray(x), atol=1e-6
    )


def test_realnvp_actnorm_data_init():
    flow = RealNVPFlow(channels=2, hidden_units=16, n_flows=4)
    params = flow.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (512, 2)) * 3 + 1
    params = flow.actnorm_data_init(params, x)
    z = flow.apply(params, x)
    np.testing.assert_allclose(np.asarray(z).mean(axis=0), 0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(z).std(axis=0), 1, atol=1e-3)
    # still invertible after data init
    np.testing.assert_allclose(
        np.asarray(flow.inverse(params, z)), np.asarray(x), atol=1e-4
    )


def test_binary_counting_masks():
    m = binary_counting_masks(2, 6)
    assert m.shape == (6, 2)
    np.testing.assert_array_equal(m[0], [1, 0])
    np.testing.assert_array_equal(m[1], [0, 1])
    np.testing.assert_array_equal(m[2], [1, 0])


def test_wnlinear_effective_weight_norm():
    layer = WNLinear(4, 3, init_mode="uniform")
    params = layer.init(jax.random.PRNGKey(0))
    w = wn_weight(params)
    # ||w||_F == g
    np.testing.assert_allclose(
        float(jnp.sqrt((w**2).sum())), float(params["g"]), rtol=1e-5
    )


def test_path_connected_composite_and_inverse():
    model = real_nvp_path_connected_net(
        channels=2,
        hidden_units=16,
        flow_n_flows=4,
        spatial_shape=(32, 32),
        convex_net_hidden_units=16,
        convex_net_hidden_layers=1,
    )
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 2))
    out = model.apply(params, x)
    assert out.shape == (256, 1)
    # deformation inverse roundtrip
    xd = model.deformation(params, x)
    x_rec = model.inverse(params, xd)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)
    # convexity projection leaves flow untouched
    clipped = model.enforce_convexity(params)
    a = jax.tree_util.tree_leaves(clipped["flow"])
    b = jax.tree_util.tree_leaves(params["flow"])
    for x1, x2 in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_flow_eval_precision_api():
    """deformation/inverse default to 'high' matmul precision (TPU
    roundtrip consistency: 3.5e-3 -> 4.7e-5 measured on v5e, zero eval
    cost) while apply inherits ambient precision for the fit-hot path.
    On CPU every precision is exact f32 -> results are bit-identical;
    this locks the API shape + jit-compatibility of the static arg."""
    from awesome_tpu.nn.convex_diffeo import ConvexDiffeomorphismNet

    model = real_nvp_path_connected_net(
        channels=2, hidden_units=16, flow_n_flows=4, spatial_shape=(32, 32),
        convex_net_hidden_units=16, convex_net_hidden_layers=1,
    )
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 2))
    z_hi = model.deformation(params, x)
    z_amb = model.deformation(params, x, precision=None)
    np.testing.assert_array_equal(np.asarray(z_hi), np.asarray(z_amb))
    rt = jax.jit(lambda p, a: model.inverse(p, model.deformation(p, a)))
    np.testing.assert_allclose(np.asarray(rt(params, x)), np.asarray(x),
                               atol=1e-4)

    cd = ConvexDiffeomorphismNet.create(nf_layers=2, nf_hidden=8,
                                        n_hidden=8)
    cp = cd.init(jax.random.PRNGKey(2))
    rt2 = jax.jit(lambda p, a: cd.inverse(p, cd.deformation(p, a)))
    np.testing.assert_allclose(np.asarray(rt2(cp, x)), np.asarray(x),
                               atol=1e-4)


def test_per_channel_affine_identity_init_and_inverse():
    layer = PerChannelAffine(2)
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 2))
    np.testing.assert_allclose(np.asarray(layer.apply(params, x)), np.asarray(x))
    params = {"w": jnp.asarray([2.0, 3.0]), "b": jnp.asarray([1.0, -1.0])}
    y = layer.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(layer.inverse(params, y)), np.asarray(x), atol=1e-6
    )


def test_stacked_param_trees_vmap():
    """The core TPU design property: stacked per-image params vmap."""
    model = ConvexNextNet(n_hidden=16)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    stacked = jax.vmap(model.init)(keys)
    x = jax.random.uniform(jax.random.PRNGKey(1), (100, 2))
    out = jax.vmap(lambda p: model.apply(p, x))(stacked)
    assert out.shape == (4, 100, 1)
    # per-image results match individual applies
    single = model.apply(T.tree_select(stacked, 2), x)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(single), atol=1e-6)


def test_linear_init_matches_torch_bounds():
    layer = Linear(100, 50)
    params = layer.init(jax.random.PRNGKey(0))
    bound = 1.0 / np.sqrt(100)
    w = np.asarray(params["w"])
    assert w.min() >= -bound and w.max() <= bound
    assert abs(w.std() - bound / np.sqrt(3)) < 0.01 * bound
