"""Multi-object training: fit N objects per image via stacked
(image x object) params against per-object unaries, grow with
assure_prior_count, recover 2+ objects on synthetic scenes.
Spec: `awesome/model/multiple_object_aware_path_connected_net.py:24-68`."""
import jax
import jax.numpy as jnp
import numpy as np

from awesome_tpu.core import grids as G
from awesome_tpu.core import tree as T
from awesome_tpu.fit.prior_fit import FitConfig, fit_multi_object_priors
from awesome_tpu.measures.metrics import iou
from awesome_tpu.nn.multi_prior import MultipleObjectsPathConnectedNet
from awesome_tpu.nn.path_connected import real_nvp_path_connected_net


def _two_object_scene(h=24, w=24):
    """Two disjoint disks; returns per-object unaries (2, N, 1) and the
    union GT (N,), fg encoded as 0."""
    yy, xx = np.mgrid[0:h, 0:w]
    o1 = ((yy - h * 0.3) ** 2 + (xx - w * 0.3) ** 2) <= (h * 0.18) ** 2
    o2 = ((yy - h * 0.7) ** 2 + (xx - w * 0.7) ** 2) <= (h * 0.18) ** 2
    per_obj = np.stack(
        [1.0 - o1.astype(np.float32), 1.0 - o2.astype(np.float32)]
    ).reshape(2, -1, 1)
    union = 1.0 - (o1 | o2).astype(np.float32)
    return per_obj, union.reshape(-1)


def test_multi_object_fit_recovers_both_objects():
    h = w = 24
    child = real_nvp_path_connected_net(
        channels=2, hidden_units=8, flow_n_flows=2, flow_output_fn="tanh",
        spatial_shape=(h, w), convex_net_hidden_units=16,
        convex_net_hidden_layers=1,
    )
    mp = MultipleObjectsPathConnectedNet(child=child, max_priors=2)
    n_images = 2
    stacked = jax.vmap(mp.init)(
        jax.random.split(jax.random.PRNGKey(0), n_images)
    )["children"]  # (B, K, ...)
    per_obj, union = _two_object_scene(h, w)
    targets = jnp.asarray(np.stack([per_obj] * n_images))  # (B, K, N, 1)
    pts = G.flatten_grid(G.pixel_grid((h, w)))

    # fg_weight balances the tiny objects (~10% fg) like the how-to's
    # fg/bg weighting; without it the fit collapses to all-background
    cfg = FitConfig(num_steps=400, lr=5e-3, nan_guard_grads=False,
                    gate_threshold=0.5, fg_weight=0.5)
    keys = jax.random.split(jax.random.PRNGKey(9), n_images * 2).reshape(
        n_images, 2, -1
    )
    fitted, aux = fit_multi_object_priors(
        child, stacked, pts, targets, cfg, retry_keys=keys
    )
    assert aux["gate_iou"].shape == (n_images, 2)
    # per-object recovery for image 0
    params0 = {"children": T.tree_select(fitted, 0)}
    for k in range(2):
        childp = T.tree_select(params0["children"], k)
        prob = jax.nn.sigmoid(child.apply(childp, pts))
        score = float(iou(prob > 0.5, targets[0, k] > 0.5, invert=True))
        assert score > 0.75, (k, score)
    # combined union of both objects beats either single object
    outs = jax.nn.sigmoid(mp.apply(params0, pts))  # (N, 2)
    combined = mp.combine(outs, count=2)[:, 0]
    union_iou = float(
        iou(combined < 0.5, jnp.asarray(union) < 0.5)
    )
    assert union_iou > 0.75, union_iou


def test_multi_object_growth_then_fit():
    """assure_prior_count growth: fit 1 object, grow to 2, fit only the new
    slot (valid_mask), first object's params untouched."""
    h = w = 16
    child = real_nvp_path_connected_net(
        channels=2, hidden_units=8, flow_n_flows=2, flow_output_fn="tanh",
        spatial_shape=(h, w), convex_net_hidden_units=12,
        convex_net_hidden_layers=1,
    )
    mp = MultipleObjectsPathConnectedNet(child=child, max_priors=2)
    params = mp.init(jax.random.PRNGKey(0))
    per_obj, _ = _two_object_scene(h, w)
    pts = G.flatten_grid(G.pixel_grid((h, w)))
    cfg = FitConfig(num_steps=400, lr=1e-2, nan_guard_grads=False,
                    fg_weight=0.5)

    # fit object 0 only (count=1)
    stacked = jax.tree_util.tree_map(lambda x: x[None], params["children"])
    targets = jnp.asarray(per_obj)[None]  # (1, 2, N, 1)
    valid = jnp.asarray([[True, False]])
    fitted, _ = fit_multi_object_priors(
        child, stacked, pts, targets, cfg, valid_mask=valid
    )
    # grow 1 -> 2 and fit only the new slot
    grown = mp.assure_prior_count(
        {"children": T.tree_select(fitted, 0)}, 1, 2,
        key=jax.random.PRNGKey(5),
    )
    stacked2 = jax.tree_util.tree_map(
        lambda x: x[None], grown["children"]
    )
    valid2 = jnp.asarray([[False, True]])
    fitted2, _ = fit_multi_object_priors(
        child, stacked2, pts, targets, cfg, valid_mask=valid2
    )
    # object 0 untouched by the second fit
    for a, b in zip(
        jax.tree_util.tree_leaves(T.tree_select(T.tree_select(fitted2, 0), 0)),
        jax.tree_util.tree_leaves(T.tree_select(T.tree_select(stacked2, 0), 0)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # object 1 now fits its unaries
    child1 = T.tree_select(T.tree_select(fitted2, 0), 1)
    prob = jax.nn.sigmoid(child.apply(child1, pts))
    score = float(iou(prob > 0.5, targets[0, 1] > 0.5, invert=True))
    assert score > 0.7, score
