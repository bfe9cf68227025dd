"""Fully fused fwd+bwd ICNN kernel: interpret-mode gradient parity."""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from awesome_tpu.nn.icnn import ConvexNextNet
from awesome_tpu.ops import pallas_mlp
from awesome_tpu.ops.pallas_mlp import FullyFusedConvexNextNet


def test_bwd_kernel_interpret_matches_autodiff():
    from jax.experimental import pallas as pl

    model = ConvexNextNet(n_hidden=16, n_hidden_layers=2)
    params = model.init(jax.random.PRNGKey(0))
    n = pallas_mlp.TILE_N
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 2))
    g = jax.random.normal(jax.random.PRNGKey(2), (n, 1))

    weights = tuple(
        w[:, None] if w.ndim == 1 else w.T
        for w in pallas_mlp._flat_weights(params)
    )
    out_shapes = [jax.ShapeDtypeStruct((2, n), jnp.float32)] + [
        jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights
    ]
    outs = pl.pallas_call(
        functools.partial(pallas_mlp._icnn_bwd_kernel, 2),
        out_shape=tuple(out_shapes),
        grid=(1,),
        interpret=True,
    )(x.T, g.T, *weights)
    dx_kernel = outs[0].T

    # autodiff reference
    def f(p, xx):
        return model.apply(p, xx)

    _, vjp = jax.vjp(f, params, x)
    dparams_ref, dx_ref = vjp(g)
    np.testing.assert_allclose(np.asarray(dx_kernel), np.asarray(dx_ref),
                               atol=1e-4)
    # weight grads: compare a few leaves (same flat order as weights)
    flat_ref = pallas_mlp._flat_weights(dparams_ref)
    for i, (ref_w, kern_w) in enumerate(zip(flat_ref, outs[1:])):
        kern = kern_w[:, 0] if ref_w.ndim == 1 else kern_w.T
        np.testing.assert_allclose(
            np.asarray(kern), np.asarray(ref_w), atol=1e-3,
            err_msg=f"weight grad {i}",
        )


def test_fully_fused_gradients_match_on_cpu_fallback():
    model = ConvexNextNet(n_hidden=16, n_hidden_layers=1)
    fused = FullyFusedConvexNextNet(model)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 2))
    g1 = jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2))(params)
    g2 = jax.grad(lambda p: jnp.sum(fused.apply(p, x) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
