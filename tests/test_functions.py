import os

import jax
import jax.numpy as jnp
import numpy as np

from awesome_tpu.core import grids as G
from awesome_tpu.nn.icnn import ConvexNextNet
from awesome_tpu.nn.seg import Net
from awesome_tpu.nn.wrapper import WrapperModule
from awesome_tpu.runner.functions import (
    channels_to_masks,
    get_prior_result,
    get_result,
    labels_to_onehot,
    masks_to_channels,
    onehot_to_labels,
    plot_mask,
    save_result,
    split_model_result,
    write_gif,
)


def _wrapper():
    return WrapperModule(
        segmentation_module=Net(n_hidden=8),
        prior_module=ConvexNextNet(n_hidden=8, n_hidden_layers=1),
    )


def test_get_result_and_split():
    w = _wrapper()
    stacked = jax.vmap(w.init)(jax.random.split(jax.random.PRNGKey(0), 3))
    px = jax.random.uniform(jax.random.PRNGKey(1), (50, 5))
    out = get_result(w, stacked, px, 1)
    assert out.shape == (50, 2)
    res = split_model_result(w, out)
    assert res["seg"].shape == (50, 1) and res["prior"].shape == (50, 1)


def test_split_with_crf():
    w = _wrapper()
    stacked = jax.vmap(w.init)(jax.random.split(jax.random.PRNGKey(0), 1))
    h = wd = 16
    px = G.flatten_grid(G.pixel_grid((h, wd)))
    px = jnp.concatenate([px, jnp.zeros((px.shape[0], 3))], axis=-1)
    out = get_result(w, stacked, px, 0)
    img = np.zeros((h, wd, 3), np.float32)
    res = split_model_result(
        w, out, image=img, use_crf=True, grid_shape=(h, wd)
    )
    assert res["crf"].shape == res["seg"].shape


def test_get_prior_result_superres():
    model = ConvexNextNet(n_hidden=8, n_hidden_layers=1)
    params = model.init(jax.random.PRNGKey(0))
    out = get_prior_result(model, params, (16, 16), super_resolution=2.0,
                           chunk=128)
    assert out.shape == (32, 32)
    assert (out >= 0).all() and (out <= 1).all()


def test_mask_channel_converters():
    m1 = np.zeros((4, 4), bool)
    m1[0, 0] = True
    m2 = np.ones((4, 4), bool)
    ch = masks_to_channels([m1, m2])
    assert ch.shape == (4, 4, 2)
    back = channels_to_masks(ch)
    np.testing.assert_array_equal(back[0], m1)
    labels = np.asarray([[0, 1], [2, 1]])
    oh = labels_to_onehot(labels)
    assert oh.shape == (2, 2, 3)
    np.testing.assert_array_equal(onehot_to_labels(oh), labels)


def test_save_result_and_gif(tmp_path):
    img = np.random.default_rng(0).uniform(size=(16, 16, 3)).astype(np.float32)
    mask = np.zeros((16, 16), bool)
    mask[4:12, 4:12] = True
    paths = save_result(str(tmp_path), 0, img, mask, prior_mask=mask,
                        unaries=1.0 - mask)
    for p in paths.values():
        assert os.path.exists(p)
    gif = write_gif([img, 1 - img], str(tmp_path / "anim.gif"))
    assert os.path.exists(gif)


def test_ensemble_logits_filters_failed_fits():
    """`runner/teaser.py:ensemble_logits`: mean over loss-valid restarts;
    restarts with tail > 1.5x min are excluded (measured: wrong lattice
    phase-locks / collapsed fits)."""
    import numpy as np

    from awesome_tpu.runner.teaser import ensemble_logits

    good1 = np.full((4, 4), 2.0)
    good2 = np.full((4, 4), 4.0)
    bad = np.full((4, 4), -100.0)
    out = ensemble_logits([good1, good2, bad], tails=[1.0, 1.2, 5.0])
    np.testing.assert_allclose(out, 3.0)  # bad fit excluded
    out_all = ensemble_logits([good1, good2, bad], tails=[1.0, 1.2, 1.3])
    np.testing.assert_allclose(out_all, (2.0 + 4.0 - 100.0) / 3)
