"""Micro-benchmark for VERDICT r4 #1: does interleaving two INDEPENDENT
dependent-matmul chains inside ONE Pallas kernel body overlap the
dependency stalls that hold the flagship fused step at 1.9x its
zero-stall pass bound?

Chain shape mimics a flow coupling: (64, 64) @ (64, T), each matmul
consuming the previous result (tanh between).
- solo:  one chain, T=2048 (the real kernel's tile)
- duo:   two chains, separate weights/inputs, T=1024 each (same total
         VMEM/work), ops emitted interleaved a,b,a,b
- solo1024: one chain at T=1024 (so duo vs 2x solo1024 isolates overlap
  from the smaller-tile efficiency change)
Launch/dispatch overhead is cancelled by scanning SCAN_LEN kernel calls
inside one jit and timing the whole scan.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

N = 24        # chain length (matmuls per kernel "rep")
M = 64
REPS = 50     # in-kernel repetitions of the chain
SCAN_LEN = 20 # kernel calls per jit


def solo_kernel(w_ref, x_ref, o_ref):
    def body(_, z):
        for i in range(N):
            z = jnp.tanh(jax.lax.dot_general(
                w_ref[i], z, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        return z
    o_ref[...] = jax.lax.fori_loop(0, REPS, body, x_ref[...])


def duo_kernel(wa_ref, wb_ref, xa_ref, xb_ref, oa_ref, ob_ref):
    def body(_, zz):
        za, zb = zz
        for i in range(N):
            za_new = jax.lax.dot_general(
                wa_ref[i], za, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            zb_new = jax.lax.dot_general(
                wb_ref[i], zb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            za = jnp.tanh(za_new)
            zb = jnp.tanh(zb_new)
        return za, zb
    za, zb = jax.lax.fori_loop(0, REPS, body, (xa_ref[...], xb_ref[...]))
    oa_ref[...] = za
    ob_ref[...] = zb


def quad_kernel(w_refs, x_refs, o_refs):
    ws, xs = w_refs, x_refs
    def body(_, zz):
        zz = list(zz)
        for i in range(N):
            news = [jax.lax.dot_general(
                ws[k][i], zz[k], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) for k in range(4)]
            zz = [jnp.tanh(v) for v in news]
        return tuple(zz)
    out = jax.lax.fori_loop(0, REPS, body, tuple(r[...] for r in xs))
    for k in range(4):
        o_refs[k][...] = out[k]


def _quad(wa, wb, wc, wd, xa, xb, xc, xd):
    def kern(wa_r, wb_r, wc_r, wd_r, xa_r, xb_r, xc_r, xd_r,
             oa_r, ob_r, oc_r, od_r):
        quad_kernel((wa_r, wb_r, wc_r, wd_r), (xa_r, xb_r, xc_r, xd_r),
                    (oa_r, ob_r, oc_r, od_r))
    return pl.pallas_call(
        kern,
        out_shape=tuple(jax.ShapeDtypeStruct((M, 512), jnp.float32)
                        for _ in range(4)),
    )(wa, wb, wc, wd, xa, xb, xc, xd)


def scan_wrap(call, args):
    """Run `call(*args)` SCAN_LEN times inside one jit (data-chained via
    a dummy carry so XLA can't elide the calls)."""
    def step(c, _):
        outs = call(*args)
        first = outs[0] if isinstance(outs, tuple) else outs
        return c + first[0, 0], None

    @jax.jit
    def run():
        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=SCAN_LEN)
        return c
    return run


def bench(run, reps=5):
    r = run()
    jax.block_until_ready(r)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        best = min(best, (time.perf_counter() - t0) / SCAN_LEN)
    return best


key = jax.random.PRNGKey(0)
w = jax.random.normal(key, (N, M, M), jnp.float32) * 0.1
x2048 = jax.random.normal(key, (M, 2048), jnp.float32)
xa, xb = x2048[:, :1024], x2048[:, 1024:]

solo = lambda w_, x_: pl.pallas_call(
    solo_kernel, out_shape=jax.ShapeDtypeStruct((M, 2048), jnp.float32))(w_, x_)
solo1k = lambda w_, x_: pl.pallas_call(
    solo_kernel, out_shape=jax.ShapeDtypeStruct((M, 1024), jnp.float32))(w_, x_)
duo = lambda wa_, wb_, xa_, xb_: pl.pallas_call(
    duo_kernel, out_shape=(jax.ShapeDtypeStruct((M, 1024), jnp.float32),
                           jax.ShapeDtypeStruct((M, 1024), jnp.float32)))(
    wa_, wb_, xa_, xb_)

t_solo = bench(scan_wrap(solo, (w, x2048)))
t_duo = bench(scan_wrap(duo, (w, w + 0.01, xa, xb)))
t_solo1k = bench(scan_wrap(solo1k, (w, xa)))
xq = [x2048[:, k * 512:(k + 1) * 512] for k in range(4)]
t_quad = bench(scan_wrap(_quad, (w, w + 0.01, w + 0.02, w + 0.03, *xq)))
solo512 = lambda w_, x_: pl.pallas_call(
    solo_kernel, out_shape=jax.ShapeDtypeStruct((M, 512), jnp.float32))(w_, x_)
t_solo512 = bench(scan_wrap(solo512, (w, xq[0])))

# zero-stall pass bound for one image's worth of work: N*REPS matmuls x
# ceil(64/128)^2 * ceil(2048/128) = 16 passes, 8 cyc @ 0.94 GHz
bound = N * REPS * 16 * 8 / 0.94e9
print(f"pass bound (1 img worth):      {bound*1e6:9.1f} us")
print(f"solo T=2048:                   {t_solo*1e6:9.1f} us  "
      f"({t_solo/bound:.2f}x bound)")
print(f"solo T=1024 x2:                {2*t_solo1k*1e6:9.1f} us")
print(f"duo  2xT=1024 interleaved:     {t_duo*1e6:9.1f} us")
print(f"solo T=512 x4:                 {4*t_solo512*1e6:9.1f} us")
print(f"quad 4xT=512 interleaved:      {t_quad*1e6:9.1f} us")
print(f"duo speedup vs solo2048:       {t_solo/t_duo:.3f}x")
print(f"duo speedup vs 2xsolo1024:     {2*t_solo1k/t_duo:.3f}x")
print(f"quad speedup vs solo2048:      {t_solo/t_quad:.3f}x")
