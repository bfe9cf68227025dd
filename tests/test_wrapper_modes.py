"""WrapperModule mode completeness: param_grid vs param_clean_grid,
segmentation_arg_mode 'forward' + targets, GradientMode gating, and the
explicit PriorMode FULL/PARTIAL extract/apply API.
Spec: `awesome/model/wrapper_module.py:80-155`,
`awesome/model/abstract_combined_segmentation_module.py:50-129`."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awesome_tpu.core import grids as G
from awesome_tpu.nn.icnn import ConvexNextNet
from awesome_tpu.nn.seg import Net
from awesome_tpu.nn.wrapper import WrapperModule


def _wrapper(**kw):
    base = dict(
        segmentation_module=Net(n_hidden=8),
        prior_module=ConvexNextNet(n_hidden=8, n_hidden_layers=1),
        input_mode="pixel",
    )
    base.update(kw)
    return WrapperModule(**base)


def _data(n=32):
    key = jax.random.PRNGKey(0)
    px = jax.random.uniform(key, (n, 5))
    return px


def test_param_grid_distinct_from_clean_grid():
    px = _data()
    clean = px[:, 0:2]
    deformed = clean + 0.3  # a per-image deformed grid
    w_clean = _wrapper(prior_arg_mode="param_clean_grid")
    w_deformed = _wrapper(prior_arg_mode="param_grid")
    params = w_clean.init(jax.random.PRNGKey(1))
    out_clean = w_clean.apply(params, px, grid=deformed, clean_grid=clean)
    out_deformed = w_deformed.apply(params, px, grid=deformed,
                                    clean_grid=clean)
    # seg halves equal, prior halves differ (different query points)
    np.testing.assert_allclose(
        np.asarray(out_clean[:, 0]), np.asarray(out_deformed[:, 0])
    )
    assert not np.allclose(
        np.asarray(out_clean[:, 1]), np.asarray(out_deformed[:, 1])
    )
    # param_clean_grid queries exactly the clean grid
    prior_ref = jax.nn.sigmoid(
        w_clean.prior_module.apply(params["prior"], clean)
    )
    np.testing.assert_allclose(
        np.asarray(out_clean[:, 1:2]), np.asarray(prior_ref), rtol=1e-6
    )


def test_param_grid_requires_grid():
    w = _wrapper(prior_arg_mode="param_grid")
    params = w.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        w.apply(params, _data())


def test_unknown_segmentation_arg_mode_raises():
    w = _wrapper(segmentation_arg_mode="weird")
    params = w.init(jax.random.PRNGKey(0))
    with pytest.raises(NotImplementedError):
        w.apply(params, _data())


def test_segmentation_module_gets_targets():
    @dataclasses.dataclass(frozen=True)
    class TargetEcho:
        def init(self, key):
            return {"w": jnp.ones((1,))}

        def apply(self, params, x, targets=None):
            base = x[:, 0:1] * params["w"]
            return base + (targets if targets is not None else 0.0)

    w = WrapperModule(
        segmentation_module=TargetEcho(),
        prior_module=None,
        segmentation_module_gets_targets=True,
        use_segmentation_sigmoid=False,
    )
    params = w.init(jax.random.PRNGKey(0))
    px = _data()
    tgt = jnp.ones((px.shape[0], 1))
    out_with = w.apply(params, px, targets=tgt)
    out_without = w.apply(params, px)
    np.testing.assert_allclose(
        np.asarray(out_with - out_without), 1.0, rtol=1e-6
    )


@pytest.mark.parametrize(
    "mode,seg_flows,prior_flows",
    [("both", True, True), ("none", False, False),
     ("segmentation", True, False), ("prior", False, True)],
)
def test_gradient_mode_gates_grads(mode, seg_flows, prior_flows):
    w = _wrapper(gradient_mode=mode)
    params = w.init(jax.random.PRNGKey(2))
    px = _data()

    def loss(p):
        return jnp.sum(w.apply(p, px) ** 2)

    g = jax.grad(loss)(params)
    seg_norm = sum(
        float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g["seg"])
    )
    prior_norm = sum(
        float(jnp.abs(x).sum())
        for x in jax.tree_util.tree_leaves(g["prior"])
    )
    assert (seg_norm > 0) == seg_flows, (mode, seg_norm)
    assert (prior_norm > 0) == prior_flows, (mode, prior_norm)


def test_prior_mode_extract_apply():
    px = _data()
    w_partial = _wrapper(prior_mode="partial")
    params = w_partial.init(jax.random.PRNGKey(3))
    state = w_partial.extract_prior(params)
    assert set(state) == set(params["prior"])
    other = w_partial.init(jax.random.PRNGKey(4))
    merged = w_partial.apply_prior(other, state)
    # prior replaced, seg kept
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(merged["prior"])[0]),
        np.asarray(jax.tree_util.tree_leaves(params["prior"])[0]),
    )
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(merged["seg"])[0]),
        np.asarray(jax.tree_util.tree_leaves(other["seg"])[0]),
    )

    w_full = _wrapper(prior_mode="full")
    state_full = w_full.extract_prior(params)
    assert set(state_full) == {"seg", "prior"}
    assert w_full.apply_prior(other, state_full) is state_full

    w_none = _wrapper(prior_mode="none")
    assert w_none.extract_prior(params) is None
    assert w_none.apply_prior(params, None) is params
