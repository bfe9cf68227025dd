"""Fused flagship loss+grad kernel: math parity against the XLA path
(interpret mode on CPU — the same kernel code compiles for TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awesome_tpu.core import grids as G
from awesome_tpu.fit.prior_fit import FitConfig, make_point_weights
from awesome_tpu.nn.path_connected import real_nvp_path_connected_net
from awesome_tpu.ops.pallas_flagship import (
    flagship_supported,
    make_flagship_loss_grad,
    pack_flagship,
    packed_enforce_convexity,
    unpack_flagship,
)


def _model(h=16, w=16, flows=4, hidden=8, icnn=12, layers=2):
    return real_nvp_path_connected_net(
        channels=2, hidden_units=hidden, flow_n_flows=flows,
        flow_output_fn="tanh", spatial_shape=(h, w),
        convex_net_hidden_units=icnn, convex_net_hidden_layers=layers,
    )


def _data(h=16, w=16, seed=0):
    pts = G.flatten_grid(G.pixel_grid((h, w)))
    yy, xx = np.mgrid[0:h, 0:w]
    fg = ((yy - h / 2) ** 2 + (xx - w / 2) ** 2) <= (h / 3) ** 2
    target = jnp.asarray(1.0 - fg.astype(np.float32)).reshape(-1, 1)
    return pts, target


def test_pack_unpack_roundtrip():
    model = _model()
    params = model.init(jax.random.PRNGKey(0))
    packed = pack_flagship(model, params)
    restored = unpack_flagship(model, packed)
    for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(restored),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # packed apply-equivalence: unpacked params drive the standard model
    pts, _ = _data()
    np.testing.assert_allclose(
        np.asarray(model.apply(restored, pts)),
        np.asarray(model.apply(params, pts)),
        atol=0,
    )


@pytest.mark.parametrize("tile", [64, 256])
def test_fused_loss_and_grad_match_xla(tile):
    model = _model()
    assert flagship_supported(model)
    params = model.init(jax.random.PRNGKey(3))
    # perturb so ActNorm / zero-init layers carry signal through tanh
    params = jax.tree_util.tree_map(
        lambda p: p + 0.05 * jax.random.normal(
            jax.random.PRNGKey(hash(p.shape) % 1000), p.shape
        ),
        params,
    )
    pts, target = _data()
    cfg = FitConfig()
    weights = make_point_weights(target, cfg)

    def xla_loss(p):
        prob = jax.nn.sigmoid(model.apply(p, pts))
        return jnp.sum(weights * (prob - target) ** 2)

    ref_loss, ref_grads = jax.value_and_grad(xla_loss)(params)

    fused = make_flagship_loss_grad(model, tile_n=tile, interpret=True)
    packed = pack_flagship(model, params)
    loss, grads_packed = fused(packed, pts, target, weights)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    grads_tree = unpack_flagship(model, grads_packed)
    ref_flat, _ = jax.tree_util.tree_flatten(ref_grads)
    got_flat, _ = jax.tree_util.tree_flatten(grads_tree)
    for a, b in zip(got_flat, ref_flat):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6
        )


@pytest.mark.parametrize("group", [2, 4])
def test_interleaved_grouped_matches_xla(group):
    """The alternating-chain rematerializing kernel (interleave=True) is
    bit-for-bit the same MATH as the XLA path, per group member —
    distinct params/targets per member so any cross-image mixing fails."""
    model = _model()
    pts, target0 = _data()
    cfg = FitConfig()

    params_list, tgts, wgts = [], [], []
    for g in range(group):
        p = model.init(jax.random.PRNGKey(10 + g))
        p = jax.tree_util.tree_map(
            lambda v, g=g: v + 0.05 * jax.random.normal(
                jax.random.PRNGKey((hash(v.shape) + 7 * g) % 1000), v.shape
            ),
            p,
        )
        params_list.append(p)
        t = jnp.roll(target0, g * 3, axis=0)
        tgts.append(t)
        wgts.append(make_point_weights(t, cfg))

    fused = make_flagship_loss_grad(model, tile_n=64, interpret=True,
                                    group=group, interleave=True)
    packed = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[pack_flagship(model, p) for p in params_list],
    )
    losses, grads_packed = fused(packed, pts, jnp.stack(tgts),
                                 jnp.stack(wgts))

    for g in range(group):
        def xla_loss(p, g=g):
            prob = jax.nn.sigmoid(model.apply(p, pts))
            return jnp.sum(wgts[g] * (prob - tgts[g]) ** 2)

        ref_loss, ref_grads = jax.value_and_grad(xla_loss)(params_list[g])
        np.testing.assert_allclose(float(losses[g]), float(ref_loss),
                                   rtol=2e-5)
        grads_tree = unpack_flagship(
            model, jax.tree_util.tree_map(lambda x: x[g], grads_packed)
        )
        ref_flat, _ = jax.tree_util.tree_flatten(ref_grads)
        got_flat, _ = jax.tree_util.tree_flatten(grads_tree)
        for a, b in zip(got_flat, ref_flat):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6
            )


def test_interleave_requires_group():
    model = _model()
    with pytest.raises(ValueError):
        make_flagship_loss_grad(model, interleave=True)


def test_auto_tile_fits_vmem_budget():
    """tile_n=None sizes the tile to Mosaic's 16 MiB scoped-VMEM stack.

    Anchors are measured: the width-130/6-flow factory default OOMs at
    tile 2048 (17.53 MiB scoped alloc), the bench 32/12 config and the
    measured interleaved duo (group=2, tile 2048) compile; the measured
    group=4 interleave config needed tile 1024."""
    from awesome_tpu.nn.path_connected import (
        real_nvp_path_connected_net as factory,
    )
    from awesome_tpu.ops.pallas_flagship import auto_tile_n

    wide = factory(channels=2, flow_output_fn="tanh")  # hidden 130, 6 flows
    bench = factory(channels=2, hidden_units=32, flow_n_flows=12,
                    flow_output_fn="tanh", convex_net_hidden_units=130,
                    convex_net_hidden_layers=2)
    assert auto_tile_n(wide) == 1024
    assert auto_tile_n(bench) == 2048
    assert auto_tile_n(bench, group=2, interleave=True) == 2048
    assert auto_tile_n(bench, group=4, interleave=True) == 1024
    # grouping WITHOUT remat must shrink faster than with it
    assert auto_tile_n(bench, group=2) <= auto_tile_n(
        bench, group=2, interleave=True
    )


def test_auto_tile_wide_model_runs_interpret():
    """The width-130 default config actually runs end-to-end with the
    auto tile (regression: tile 2048 was a hard TPU VMEM OOM)."""
    model = real_nvp_path_connected_net(
        channels=2, flow_output_fn="tanh", spatial_shape=(16, 16),
    )
    pts, target = _data()
    cfg = FitConfig()
    params = model.init(jax.random.PRNGKey(0))
    fused = make_flagship_loss_grad(model, interpret=True)  # tile_n auto
    packed = pack_flagship(model, params)
    w = make_point_weights(target, cfg)
    loss, grads = fused(packed, pts, target, w)
    assert np.isfinite(float(loss))

    def xla_loss(p):
        prob = jax.nn.sigmoid(model.apply(p, pts))
        return jnp.sum(w * (prob - target) ** 2)

    ref_loss = float(xla_loss(params))
    np.testing.assert_allclose(float(loss), ref_loss, rtol=2e-5)


def test_fused_handles_point_weight_padding():
    """Padded tail points (weight 0) must not contribute."""
    model = _model()
    params = model.init(jax.random.PRNGKey(1))
    pts, target = _data()
    cfg = FitConfig()
    weights = make_point_weights(target, cfg)
    fused = make_flagship_loss_grad(model, tile_n=100, interpret=True)
    packed = pack_flagship(model, params)
    loss_a, grads_a = fused(packed, pts, target, weights)
    fused_b = make_flagship_loss_grad(model, tile_n=256, interpret=True)
    loss_b, grads_b = fused_b(packed, pts, target, weights)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    for k in grads_a:
        np.testing.assert_allclose(
            np.asarray(grads_a[k]), np.asarray(grads_b[k]),
            rtol=1e-4, atol=1e-7,
        )


def test_packed_enforce_convexity():
    model = _model()
    params = model.init(jax.random.PRNGKey(2))
    packed = pack_flagship(model, params)
    packed = dict(packed, wln=packed["wln"] - 0.5, wout=packed["wout"] - 0.5)
    clipped = packed_enforce_convexity(packed)
    assert float(np.asarray(clipped["wln"]).min()) >= 0.0
    assert float(np.asarray(clipped["wout"]).min()) >= 0.0
    # matches the tree-level projection
    tree = unpack_flagship(model, packed)
    tree_clipped = model.enforce_convexity(tree)
    np.testing.assert_array_equal(
        np.asarray(unpack_flagship(model, clipped)["convex"]["skip"][0]["ln"]["w"]),
        np.asarray(tree_clipped["convex"]["skip"][0]["ln"]["w"]),
    )


def test_flagship_rejects_zero_points():
    """A 0-point input would launch a 0-size grid and return
    uninitialized buffers — it must raise instead."""
    import jax
    import jax.numpy as jnp
    import pytest

    from awesome_tpu.nn.path_connected import real_nvp_path_connected_net
    from awesome_tpu.ops.pallas_flagship import (
        make_flagship_loss_grad,
        pack_flagship,
    )

    model = real_nvp_path_connected_net(
        channels=2, hidden_units=8, flow_n_flows=2, flow_output_fn="tanh",
        spatial_shape=(8, 8), convex_net_hidden_units=12,
        convex_net_hidden_layers=1,
    )
    params = model.init(jax.random.PRNGKey(0))
    packed = pack_flagship(model, params)
    f = make_flagship_loss_grad(model, interpret=True)
    with pytest.raises(ValueError, match="at least one point"):
        f(packed, jnp.zeros((0, 2)), jnp.zeros((0, 1)), jnp.zeros((0, 1)))
