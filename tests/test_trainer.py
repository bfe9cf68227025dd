"""Joint trainer tests: one compiled step updating shared seg params and
scattered per-image prior slices."""
import jax
import jax.numpy as jnp
import numpy as np

from awesome_tpu.core import grids as G
from awesome_tpu.core import tree as T
from awesome_tpu.fit.trainer import (
    JointTrainConfig,
    epoch_batches,
    joint_train_init,
    make_joint_epoch_fn,
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


def test_joint_step_weight_zero_is_noop_for_that_sample():
    """Padded (weight-0) samples must not touch their prior slice, its
    optimizer moments, or the loss."""
    wrapper, cfg, state, batch = _make()
    step = jax.jit(make_joint_train_step(wrapper, cfg))
    # duplicate the live sample into the padded slot so UNet batchnorm
    # statistics match the solo forward exactly (stats over [x, x] == [x])
    batch = dict(
        batch,
        image=jnp.concatenate([batch["image"][:1]] * 2),
        features=jnp.concatenate([batch["features"][:1]] * 2),
        target=jnp.concatenate([batch["target"][:1]] * 2),
    )
    wbatch = dict(batch, weight=jnp.asarray([1.0, 0.0]))
    new_state, metrics = step(state, wbatch)
    # weight-0 sample (index 3): prior params + moments bit-identical
    for tree_new, tree_old in (
        (new_state.prior_params, state.prior_params),
        (new_state.prior_opt, state.prior_opt),
    ):
        for a, b in zip(
            jax.tree_util.tree_leaves(T.tree_select(tree_new, 3)),
            jax.tree_util.tree_leaves(T.tree_select(tree_old, 3)),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # weight-1 sample (index 1) still trains
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(T.tree_select(new_state.prior_params, 1)),
            jax.tree_util.tree_leaves(T.tree_select(state.prior_params, 1)),
        )
    )
    assert changed
    # loss equals the solo loss of the weight-1 sample
    solo = {
        "image": batch["image"][:1],
        "features": batch["features"][:1],
        "grid": batch["grid"],  # shared (N, 2) grid: not per-sample
        "target": batch["target"][:1],
        "index": batch["index"][:1],
    }
    _, solo_metrics = step(state, solo)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(solo_metrics["loss"]), rtol=1e-5
    )


def test_epoch_batches_plan():
    rng = np.random.default_rng(0)
    idx, wgt = epoch_batches(5, 2, rng)
    assert idx.shape == (3, 2) and wgt.shape == (3, 2)
    # every image exactly once at weight 1
    live = idx[wgt > 0]
    assert sorted(live.tolist()) == [0, 1, 2, 3, 4]
    # no duplicate index within any batch (write-once scatter)
    for row in idx:
        assert len(set(row.tolist())) == len(row)


def test_joint_epoch_scan_trains_all_images():
    wrapper, cfg, state, _ = _make(num_images=5)
    h = w = 16
    t = 5
    key = jax.random.PRNGKey(7)
    data = {
        "image": jax.random.uniform(key, (t, h, w, 3)),
        "features": jax.random.uniform(key, (t, h, w, 1)),
        "grid": G.flatten_grid(G.pixel_grid((h, w))),
        "target": (
            jax.random.uniform(key, (t, h, w, 1)) > 0.5
        ).astype(jnp.float32),
    }
    epoch_fn = jax.jit(make_joint_epoch_fn(wrapper, cfg))
    rng = np.random.default_rng(0)
    idx_mat, wgt_mat = epoch_batches(t, 2, rng)
    new_state, metrics = epoch_fn(
        state, data, jnp.asarray(idx_mat), jnp.asarray(wgt_mat)
    )
    assert metrics["loss"].shape == (3,)
    assert np.isfinite(np.asarray(metrics["loss"])).all()
    # every image's prior trained exactly once this epoch
    for i in range(t):
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(
                    T.tree_select(new_state.prior_params, i)
                ),
                jax.tree_util.tree_leaves(T.tree_select(state.prior_params, i)),
            )
        )
        assert changed, f"prior {i} did not train"
    assert int(new_state.step) == 3


def test_shared_mode_wn_weight_decay_applies():
    """Round-4 review finding: wn_weight_decay must reach the SHARED
    ('multi') engine too, not just the per-image one — a WN magnitude
    leaf ('g') must decay relative to the no-decay run."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from awesome_tpu.fit.pixel_trainer import (
        PixelTrainConfig,
        make_shared_pixel_segment_fn,
        shared_pixel_train_init,
    )
    from awesome_tpu.nn.convex_diffeo import ConvexDiffeomorphismNet
    from awesome_tpu.nn.seg import Net
    from awesome_tpu.nn.wrapper import WrapperModule

    # ConvexDiffeo's NormalizingFlow1D backbones are weight-normalized
    # (WNLinear 'g' magnitude leaves) — the params the reference's
    # get_weight_normalized_param_groups targets
    prior = ConvexDiffeomorphismNet.create(
        in_features=2, n_hidden=8, nf_layers=2, nf_hidden=8)
    wrapper = WrapperModule(
        segmentation_module=Net(n_hidden=8), prior_module=prior,
        prior_arg_mode="xy_c_preattached",
    )
    b, n = 2, 64
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(0, 1, (b, n, 5)).astype(np.float32))
    gt = jnp.asarray((rng.uniform(0, 1, (b, n, 1)) > 0.5).astype(np.float32))
    smask = jnp.ones((b, n), bool)
    rmask = jnp.zeros((b, n), bool)

    def g_leaves(params):
        out = []

        def walk(node):
            if isinstance(node, dict):
                for k, v in node.items():
                    if k == "g":
                        out.append(np.asarray(v))
                    else:
                        walk(v)
            elif isinstance(node, (list, tuple)):
                for v in node:
                    walk(v)

        walk(params)
        return out

    results = {}
    for wd in (0.0, 1.0):
        cfg = PixelTrainConfig(num_epochs=5, lr=1e-3, wn_weight_decay=wd)
        state = shared_pixel_train_init(
            wrapper, jax.random.PRNGKey(0), b, cfg)
        seg_fn = make_shared_pixel_segment_fn(wrapper, cfg, 5)
        state, _ = seg_fn(state, px, gt, smask, rmask,
                          jnp.ones((b,), bool))
        results[wd] = g_leaves(state.params)
    assert results[1.0], "flagship prior should carry WN 'g' leaves"
    # coupled-L2 decay (torch semantics) biases every update toward
    # -sign(g): magnitudes must shrink vs the undecayed run
    mean_nowd = np.mean([np.mean(np.abs(x)) for x in results[0.0]])
    mean_wd = np.mean([np.mean(np.abs(x)) for x in results[1.0]])
    assert mean_wd < mean_nowd, (mean_wd, mean_nowd)
