"""Micro-benchmark #2 (VERDICT r4 #1): can a REMAT + DUO-interleaved
variant of the real flagship kernel beat the current design?

Micro #1 established:
- ops at these widths are latency-bound (~1.23 us/matmul solo,
  T-invariant for T<=2048), and interleaving N independent chains
  pipelines them (duo 0.63, quad 0.30 us/op);
- interleave at VMEM-forced HALF tiles exactly cancels (0.97x).

The untested lever: keep T=2048 for BOTH images by REMATERIALIZING
instead of saving activations (VMEM: saved-act set ~14 MB/image at
T=2048 forbids two images; remat keeps only the live values). Cost:
+2 matmuls/coupling to recompute the forward inside the backward.

This micro mimics one coupling stage's fwd+bwd structure per image:
  fwd:  h = relu(W1 @ zm); st = W2 @ h; z' = f(z, st)
  bwd (remat): recompute h, st from the SAVED z (cheap: z is the carry,
  2 x T f32 = 16 KB — keeping z per coupling is free; the EXPENSIVE
  saves are h (64 x T) and st), then dW2 = d_st @ h.T; dh = W2.T @ d_st;
  dW1 = dh' @ zm.T; dz = W1.T @ dh'.
solo_saved: current design, 1 image, activations "saved" (no recompute).
duo_remat:  2 images interleaved, h/st recomputed in bwd.
Equal T=2048 for both. If duo_remat total time < 2x solo_saved / 1.3,
kernel surgery pays.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

C = 64      # coupling width stand-in (2*hidden = 64)
T = 2048
NC = 12     # couplings
SCAN_LEN = 20


def solo_saved_kernel(w1_ref, w2_ref, x_ref, o_ref, dw1_ref, dw2_ref):
    """fwd saving h/st, bwd reusing them — the current design's shape."""
    z = x_ref[...]
    hs, sts, zs = [], [], []
    for i in range(NC):
        zs.append(z)
        h = jnp.maximum(jax.lax.dot_general(
            w1_ref[i], z, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), 0.0)
        hs.append(h)
        st = jax.lax.dot_general(
            w2_ref[i], h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sts.append(st)
        z = jnp.tanh(st) + z
    gz = z
    dw1 = jnp.zeros_like(w1_ref[0])
    dw2 = jnp.zeros_like(w2_ref[0])
    for i in reversed(range(NC)):
        st, h, zin = sts[i], hs[i], zs[i]
        dst = gz * (1.0 - jnp.tanh(st) ** 2)
        dw2 = dw2 + jax.lax.dot_general(
            dst, h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh = jax.lax.dot_general(
            w2_ref[i], dst, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * (h > 0)
        dw1 = dw1 + jax.lax.dot_general(
            dh, zin, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        gz = gz + jax.lax.dot_general(
            w1_ref[i], dh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[...] = gz
    dw1_ref[...] = dw1
    dw2_ref[...] = dw2


def duo_remat_kernel(w1a_ref, w2a_ref, w1b_ref, w2b_ref, xa_ref, xb_ref,
                     oa_ref, ob_ref, dw1a_ref, dw2a_ref, dw1b_ref,
                     dw2b_ref):
    """Two images, T=2048 each; only the (cheap) z carries are saved,
    h/st recomputed inside the bwd; ops interleaved a,b per site."""
    w1 = (w1a_ref, w1b_ref)
    w2 = (w2a_ref, w2b_ref)
    z = [xa_ref[...], xb_ref[...]]
    zs = [[], []]
    for i in range(NC):
        h = [None, None]
        st = [None, None]
        for k in (0, 1):
            zs[k].append(z[k])
            h[k] = jnp.maximum(jax.lax.dot_general(
                w1[k][i], z[k], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32), 0.0)
        for k in (0, 1):
            st[k] = jax.lax.dot_general(
                w2[k][i], h[k], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        for k in (0, 1):
            z[k] = jnp.tanh(st[k]) + z[k]
    gz = [z[0], z[1]]
    dw1 = [jnp.zeros_like(w1a_ref[0]), jnp.zeros_like(w1a_ref[0])]
    dw2 = [jnp.zeros_like(w2a_ref[0]), jnp.zeros_like(w2a_ref[0])]
    for i in reversed(range(NC)):
        # REMAT: recompute h and st from the saved z carry, interleaved
        h = [None, None]
        st = [None, None]
        for k in (0, 1):
            h[k] = jnp.maximum(jax.lax.dot_general(
                w1[k][i], zs[k][i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32), 0.0)
        for k in (0, 1):
            st[k] = jax.lax.dot_general(
                w2[k][i], h[k], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dst = [None, None]
        for k in (0, 1):
            dst[k] = gz[k] * (1.0 - jnp.tanh(st[k]) ** 2)
        dh = [None, None]
        for k in (0, 1):
            dw2[k] = dw2[k] + jax.lax.dot_general(
                dst[k], h[k], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dh[k] = jax.lax.dot_general(
                w2[k][i], dst[k], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * (h[k] > 0)
        for k in (0, 1):
            dw1[k] = dw1[k] + jax.lax.dot_general(
                dh[k], zs[k][i], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            gz[k] = gz[k] + jax.lax.dot_general(
                w1[k][i], dh[k], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    oa_ref[...] = gz[0]
    ob_ref[...] = gz[1]
    dw1a_ref[...] = dw1[0]
    dw2a_ref[...] = dw2[0]
    dw1b_ref[...] = dw1[1]
    dw2b_ref[...] = dw2[1]


def scan_wrap(call, args):
    def step(c, _):
        outs = call(*args)
        return c + outs[0][0, 0], None

    @jax.jit
    def run():
        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=SCAN_LEN)
        return c
    return run


def bench(run, reps=5):
    jax.block_until_ready(run())
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        best = min(best, (time.perf_counter() - t0) / SCAN_LEN)
    return best


key = jax.random.PRNGKey(0)
w1 = jax.random.normal(key, (NC, C, C), jnp.float32) * 0.1
w2 = jax.random.normal(key, (NC, C, C), jnp.float32) * 0.1
x = jax.random.normal(key, (C, T), jnp.float32)

solo = lambda w1_, w2_, x_: pl.pallas_call(
    solo_saved_kernel,
    out_shape=(jax.ShapeDtypeStruct((C, T), jnp.float32),
               jax.ShapeDtypeStruct((C, C), jnp.float32),
               jax.ShapeDtypeStruct((C, C), jnp.float32)))(w1_, w2_, x_)

duo = lambda *a: pl.pallas_call(
    duo_remat_kernel,
    out_shape=(jax.ShapeDtypeStruct((C, T), jnp.float32),
               jax.ShapeDtypeStruct((C, T), jnp.float32),
               jax.ShapeDtypeStruct((C, C), jnp.float32),
               jax.ShapeDtypeStruct((C, C), jnp.float32),
               jax.ShapeDtypeStruct((C, C), jnp.float32),
               jax.ShapeDtypeStruct((C, C), jnp.float32)))(*a)

t_solo = bench(scan_wrap(solo, (w1, w2, x)))
t_duo = bench(scan_wrap(duo, (w1, w2, w1 + 0.01, w2 + 0.01, x, x + 0.1)))

# ops: solo fwd 2/coupling + bwd 3 = 5*NC; duo 2*(7*NC) (remat +2)
print(f"solo saved-act (1 img, T={T}):   {t_solo*1e6:9.1f} us "
      f"({5*NC} matmuls)")
print(f"duo remat (2 img, T={T}):        {t_duo*1e6:9.1f} us "
      f"({14*NC} matmuls)")
print(f"per-image speedup vs solo:       {2*t_solo/t_duo:.3f}x")
