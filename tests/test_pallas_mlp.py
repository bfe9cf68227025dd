"""Fused ICNN kernel: interpret-mode correctness on CPU (the real-TPU
path is exercised by bench/verification drives)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from awesome_tpu.nn.icnn import ConvexNextNet
from awesome_tpu.ops import pallas_mlp
from awesome_tpu.ops.pallas_mlp import FusedConvexNextNet, icnn_forward_fused


def test_fused_falls_back_off_tpu():
    model = ConvexNextNet(n_hidden=16, n_hidden_layers=1)
    fused = FusedConvexNextNet(model)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (100, 2))
    np.testing.assert_allclose(
        np.asarray(fused.apply(params, x)),
        np.asarray(model.apply(params, x)),
        atol=1e-6,
    )


def test_fused_kernel_interpret_mode():
    """Run the actual kernel body through the Pallas interpreter."""
    from jax.experimental import pallas as pl

    model = ConvexNextNet(n_hidden=16, n_hidden_layers=2)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (pallas_mlp.TILE_N, 2))
    weights = tuple(
        w[:, None] if w.ndim == 1 else w.T
        for w in pallas_mlp._flat_weights(params)
    )
    out = pl.pallas_call(
        functools.partial(pallas_mlp._icnn_kernel, model.n_hidden_layers),
        out_shape=jax.ShapeDtypeStruct((1, x.shape[0]), jnp.float32),
        interpret=True,
    )(x.T, *weights)
    ref = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[:, 0]),
                               atol=1e-5)


def test_fused_gradients_match_base():
    model = ConvexNextNet(n_hidden=16, n_hidden_layers=1)
    fused = FusedConvexNextNet(model)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 2))

    g1 = jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2))(params)
    g2 = jax.grad(lambda p: jnp.sum(fused.apply(p, x) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
