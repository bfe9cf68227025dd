"""Joint trainer tests: one compiled step updating shared seg params and
scattered per-image prior slices."""
import jax
import jax.numpy as jnp
import numpy as np

from awesome_tpu.core import grids as G
from awesome_tpu.core import tree as T
from awesome_tpu.fit.trainer import (
    JointTrainConfig,
    joint_train_init,
    make_joint_train_step,
)
from awesome_tpu.nn.icnn import ConvexNextNet
from awesome_tpu.nn.seg import UNet
from awesome_tpu.nn.wrapper import WrapperModule


def _make(h=16, w=16, num_images=4):
    wrapper = WrapperModule(
        segmentation_module=UNet(in_chn=4, out_chn=1),
        prior_module=ConvexNextNet(n_hidden=8, n_hidden_layers=1),
        input_mode="image",
        prior_arg_mode="param_clean_grid",
        seg_stateful=True,
    )
    cfg = JointTrainConfig(lr=1e-3, prior_lr=1e-3)
    state = joint_train_init(wrapper, jax.random.PRNGKey(0), num_images, cfg)
    grid = G.flatten_grid(G.pixel_grid((h, w)))
    batch = {
        "image": jax.random.uniform(jax.random.PRNGKey(1), (2, h, w, 3)),
        "features": jax.random.uniform(jax.random.PRNGKey(2), (2, h, w, 1)),
        "grid": grid,
        "target": (
            jax.random.uniform(jax.random.PRNGKey(3), (2, h, w, 1)) > 0.5
        ).astype(jnp.float32),
        "index": jnp.asarray([1, 3]),
    }
    return wrapper, cfg, state, batch


def test_joint_step_updates_only_batch_priors():
    wrapper, cfg, state, batch = _make()
    step = jax.jit(make_joint_train_step(wrapper, cfg))
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # priors 1 and 3 updated, 0 and 2 untouched
    for i in (1, 3):
        before = jax.tree_util.tree_leaves(T.tree_select(state.prior_params, i))
        after = jax.tree_util.tree_leaves(
            T.tree_select(new_state.prior_params, i)
        )
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(after, before)
        )
    for i in (0, 2):
        before = jax.tree_util.tree_leaves(T.tree_select(state.prior_params, i))
        after = jax.tree_util.tree_leaves(
            T.tree_select(new_state.prior_params, i)
        )
        for a, b in zip(after, before):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # seg params updated
    sb = jax.tree_util.tree_leaves(state.seg_params)
    sa = jax.tree_util.tree_leaves(new_state.seg_params)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(sa, sb)
    )


def test_joint_step_convexity_maintained():
    wrapper, cfg, state, batch = _make()
    step = jax.jit(make_joint_train_step(wrapper, cfg))
    new_state, _ = step(state, batch)
    p1 = T.tree_select(new_state.prior_params, 1)
    for blk in p1["skip"]:
        assert float(np.asarray(blk["ln"]["w"]).min()) >= 0.0
    assert float(np.asarray(p1["out"]["ln"]["w"]).min()) >= 0.0


def test_joint_step_freeze_segmentation():
    wrapper, _, state, batch = _make()
    cfg = JointTrainConfig(train_segmentation=False)
    step = jax.jit(make_joint_train_step(wrapper, cfg))
    new_state, _ = step(state, batch)
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state.seg_params),
        jax.tree_util.tree_leaves(state.seg_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_joint_step_loss_decreases_over_steps():
    wrapper, cfg, state, batch = _make()
    step = jax.jit(make_joint_train_step(wrapper, cfg))
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
