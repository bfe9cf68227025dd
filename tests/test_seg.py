import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awesome_tpu.nn.seg import CNNNet, FCNet, Net, UNet, concat_input


def test_concat_input_modes():
    img = jnp.ones((4, 3))
    grid = jnp.zeros((4, 2))
    assert concat_input("rgb", img, grid).shape == (4, 3)
    assert concat_input("xy", img, grid).shape == (4, 2)
    assert concat_input("rgbxy", img, grid).shape == (4, 5)
    with pytest.raises(ValueError):
        concat_input("bogus", img, grid)


def test_net_forward():
    model = Net(n_hidden=16)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (10, 5))
    assert model.apply(params, x).shape == (10, 1)


def test_fcnet_forward():
    model = FCNet(in_chn=5, out_chn=1, width=16, depth=2, in_type="rgbxy")
    params = model.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (10, 3))
    grid = jax.random.uniform(jax.random.PRNGKey(2), (10, 2))
    assert model.apply(params, img, grid).shape == (10, 1)


def test_cnnnet_forward():
    model = CNNNet(in_chn=5, out_chn=1, kernel_size=3, width=8, depth=1)
    params = model.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3))
    grid = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 2))
    assert model.apply(params, img, grid).shape == (1, 16, 16, 1)


def test_unet_forward_and_state():
    model = UNet(in_chn=5, out_chn=1)
    params, state = model.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    feat = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 2))
    out, new_state = model.apply(params, state, img, feat, train=True)
    assert out.shape == (1, 32, 32, 1)
    # train=True updates running stats
    assert int(new_state["inc"]["bn1"]["count"]) == 1
    # eval mode is deterministic and uses running stats
    out2, st2 = model.apply(params, new_state, img, feat, train=False)
    out3, _ = model.apply(params, st2, img, feat, train=False)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out3), atol=1e-6)


def test_unet_odd_sizes_pad():
    """Non-power-of-two inputs exercise the pad-to-match skip path."""
    model = UNet(in_chn=4, out_chn=1)
    params, state = model.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 35, 43, 3))
    feat = jax.random.uniform(jax.random.PRNGKey(2), (1, 35, 43, 1))
    out, _ = model.apply(params, state, img, feat, train=False)
    assert out.shape == (1, 35, 43, 1)


def test_unet_bf16_compute_dtype_close_to_f32():
    """Opt-in bf16 convs (MXU-rate inputs, f32 accumulation/master) stay
    numerically close to the f32 path and train finitely."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from awesome_tpu.nn.seg import UNet

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    ft = jnp.asarray(rng.random((1, 32, 32, 1)), jnp.float32)
    f32 = UNet(in_chn=4, out_chn=1)
    bf16 = UNet(in_chn=4, out_chn=1, compute_dtype="bfloat16")
    params, state = f32.init(jax.random.PRNGKey(0))
    out_f32, _ = f32.apply(params, state, img, ft, train=False)
    out_bf16, _ = bf16.apply(params, state, img, ft, train=False)
    assert out_bf16.dtype == jnp.float32  # master dtype preserved
    np.testing.assert_allclose(
        np.asarray(out_f32), np.asarray(out_bf16), atol=0.05
    )

    def loss(p):
        out, _ = bf16.apply(p, state, img, ft, train=True)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert leaf.dtype == jnp.float32
        assert np.isfinite(np.asarray(leaf)).all()
