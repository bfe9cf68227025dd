"""Pallas TPU kernel: the ENTIRE flagship fit step's loss+grad in ONE
kernel — translation -> MinMax norm -> RealNVP flow (masked affine
couplings + ActNorm, tanh outputs) -> ConvexNextNet ICNN -> weighted-SE on
sigmoid, forward AND hand-derived backward.

Why: the flagship per-image prior fit is LATENCY-bound, not FLOP-bound
(docs/design.md): one XLA step issues ~150 serial tiny MXU ops (12
couplings x ~4 matmuls fwd + the mirrored bwd + ICNN), each with fixed
issue overhead, totalling ~0.6 ms while the arithmetic is worth ~10 us.
Fusing the whole value_and_grad into one Pallas program removes the
per-op overhead: weights (~40 k params) live in VMEM, the point axis is
tiled, the coupling-input chain is kept as kernel-local values, and
weight-gradient partials accumulate across grid steps in VMEM-resident
output blocks (sequential TPU grid; ``@pl.when(first)`` zero-init).

Math parity targets (same ops, same order, f32 throughout):
- `awesome_tpu.nn.path_connected.PathConnectedNet.apply` (translate ->
  norm -> flow -> ICNN; spec `awesome/model/path_connected_net.py:79-85`)
- `awesome_tpu.nn.flows.RealNVPFlow.apply` with output_fn='tanh'
  (spec `awesome/model/net_factory.py:70-114`)
- `awesome_tpu.nn.icnn.ConvexNextNet.apply`
- `awesome_tpu.fit.prior_fit.make_fit_fn`'s default loss
  ``sum(w * (sigmoid(f(x)) - target)^2)``.

Supported (= flagship) shape family: channels C == 2, alternating binary
masks, any flow depth/width, any ICNN width/depth. Everything else keeps
the XLA path.
"""
from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# NOTE: this kernel has NO CPU fallback of its own — off-TPU callers must
# pass interpret=True (tests do; see tests/test_pallas_flagship.py)

TILE_N = 2048

# Mosaic's scoped-VMEM stack limit is 16 MiB; the dominant per-point cost
# is the forward saves that live across the kernel (measured: the default
# width-130/6-flow flagship allocates 17.53 MiB at tile 2048 — OOM — and
# the bench 32/12 config 12.7 MiB — fits). Keep headroom for the
# double-buffered data stream + transients.
_VMEM_BUDGET_BYTES = 14 << 20


def auto_tile_n(model, group: int = 1, interleave: bool = False,
                cap: int = TILE_N) -> int:
    """Largest power-of-two tile (<= ``cap``) whose per-point VMEM save
    footprint fits Mosaic's scoped stack.

    Per point and image, ``_kernel`` keeps (f32 columns): the flow's
    post-relu ``h`` (2*hidden per flow), 2 ``z`` saves + the 4-row ``st``
    per flow, the ICNN ``pre_acts`` ((n_layers+1) * icnn_w), plus ~2
    icnn-width backward transients (dh / hx concat) and ~32 misc columns
    (x, z, xd, target, weights, logits, grad chains).
    ``_kernel_interleaved`` rematerializes ``h`` (and the ICNN acts), so
    its per-image cost drops the 2*hidden*n_flows term but multiplies
    everything by ``group`` and adds one transient ``h`` buffer."""
    flow = model.flow_net
    hidden, n_flows = flow.hidden_units, flow.n_flows
    icnn_w = model.convex_net.n_hidden
    n_layers = model.convex_net.n_hidden_layers
    icnn_cols = (n_layers + 1) * icnn_w + 2 * icnn_w + 32
    if interleave:
        cols = group * (8 * n_flows + icnn_cols) + 2 * hidden
    else:
        cols = group * (n_flows * (2 * hidden + 8) + icnn_cols)
    tile = cap
    while tile > 128 and cols * 4 * tile > _VMEM_BUDGET_BYTES:
        tile //= 2
    return tile


Params = Any

# packed buffer names, in kernel argument order (after the 3 data inputs
# and the 4 static norm constants)
PACKED_FIELDS = (
    "wt", "bt",
    "w1", "b1", "w2", "b2", "an_s", "an_t",
    "win", "bin", "wln", "bln", "wsk", "wout", "bout", "wosk",
)


def _norm_constants(model) -> Tuple[np.ndarray, ...]:
    """Fold the frozen MinMax/MeanStd into pre/post per-channel affines:
    pre:  x2 = (x1 - min) * a + new_min         (norm.transform)
    post: xd = z * (1/a) + (min - new_min / a)  (norm.inverse_transform)
    Identity when model.norm is None."""
    if model.norm is None:
        a = np.ones((2, 1), np.float32)
        mn = np.zeros((2, 1), np.float32)
        new_min = 0.0
    else:
        norm = model.norm
        if hasattr(norm, "min"):  # MinMax
            mn = np.asarray(norm.min, np.float32).reshape(2, 1)
            mx = np.asarray(norm.max, np.float32).reshape(2, 1)
            span = np.where(mx - mn == 0, 1.0, mx - mn)
            a = (norm.new_max - norm.new_min) / span
            new_min = norm.new_min
        else:  # MeanStd: (x - mean)/std
            mn = np.asarray(norm.mean, np.float32).reshape(2, 1)
            std = np.asarray(norm.std, np.float32).reshape(2, 1)
            a = 1.0 / np.where(std == 0, 1.0, std)
            new_min = 0.0
    pre_a = a.astype(np.float32)
    pre_b = (new_min - mn * a).astype(np.float32)  # x2 = x1*a + pre_b
    post_a = (1.0 / a).astype(np.float32)
    post_b = (mn - new_min / a).astype(np.float32)  # xd = z*post_a + post_b
    return pre_a, pre_b, post_a, post_b


def flagship_supported(model) -> bool:
    """The packed kernel covers the flagship family: 2-channel
    PathConnectedNet with a RealNVPFlow (tanh/no output fn, no scale) and a
    ConvexNextNet."""
    from awesome_tpu.nn.flows import RealNVPFlow
    from awesome_tpu.nn.icnn import ConvexNextNet
    from awesome_tpu.nn.path_connected import PathConnectedNet

    return (
        isinstance(model, PathConnectedNet)
        and isinstance(model.flow_net, RealNVPFlow)
        and isinstance(model.convex_net, ConvexNextNet)
        and model.in_channels == 2
        and model.flow_net.channels == 2
        and model.flow_net.output_fn in (None, "tanh")
        and model.flow_net.output_scale is None
    )


def pack_flagship(model, params: Params) -> dict:
    """Standard param tree -> packed transposed kernel buffers."""
    flow = params["flow"]["steps"]
    conv = params["convex"]

    def stack(get):
        return jnp.stack([get(s) for s in flow])

    packed = {
        "wt": params["linear"]["w"].reshape(2, 1),
        "bt": params["linear"]["b"].reshape(2, 1),
        # merged first layers: rows [s(32) | t(32)], weights (out, in)
        "w1": stack(lambda s: jnp.concatenate(
            [s["s"]["l1"]["w"].T, s["t"]["l1"]["w"].T], axis=0)),
        "b1": stack(lambda s: jnp.concatenate(
            [s["s"]["l1"]["b"], s["t"]["l1"]["b"]])[:, None]),
        # merged second layers: block-diagonal (4, 2*hidden) with
        # rows [s(2) | t(2)], cols [hs | ht] — one matmul per coupling
        "w2": stack(lambda s: jnp.concatenate(
            [
                jnp.concatenate(
                    [s["s"]["l2"]["w"].T,
                     jnp.zeros_like(s["s"]["l2"]["w"].T)], axis=1),
                jnp.concatenate(
                    [jnp.zeros_like(s["t"]["l2"]["w"].T),
                     s["t"]["l2"]["w"].T], axis=1),
            ],
            axis=0,
        )),
        "b2": stack(lambda s: jnp.concatenate(
            [s["s"]["l2"]["b"], s["t"]["l2"]["b"]])[:, None]),
        "an_s": stack(lambda s: s["an_s"][:, None]),
        "an_t": stack(lambda s: s["an_t"][:, None]),
        "win": conv["input"]["w"].T,
        "bin": conv["input"]["b"][:, None],
        "wln": jnp.stack([b["ln"]["w"].T for b in conv["skip"]]),
        "bln": jnp.stack([b["ln"]["b"][:, None] for b in conv["skip"]]),
        "wsk": jnp.stack([b["skp"]["w"].T for b in conv["skip"]]),
        "wout": conv["out"]["ln"]["w"].T,
        "bout": conv["out"]["ln"]["b"][:, None],
        "wosk": conv["out"]["skp"]["w"].T,
    }
    return packed


def unpack_flagship(model, packed: dict) -> Params:
    """Packed buffers -> standard param tree (exact inverse of pack)."""
    n_flows = packed["w1"].shape[0]
    hidden = packed["w1"].shape[1] // 2
    steps = []
    for i in range(n_flows):
        steps.append({
            "s": {
                "l1": {"w": packed["w1"][i, :hidden].T,
                       "b": packed["b1"][i, :hidden, 0]},
                "l2": {"w": packed["w2"][i, 0:2, :hidden].T,
                       "b": packed["b2"][i, 0:2, 0]},
            },
            "t": {
                "l1": {"w": packed["w1"][i, hidden:].T,
                       "b": packed["b1"][i, hidden:, 0]},
                "l2": {"w": packed["w2"][i, 2:4, hidden:].T,
                       "b": packed["b2"][i, 2:4, 0]},
            },
            "an_s": packed["an_s"][i, :, 0],
            "an_t": packed["an_t"][i, :, 0],
        })
    n_layers = packed["wln"].shape[0]
    conv = {
        "input": {"w": packed["win"].T, "b": packed["bin"][:, 0]},
        "skip": [
            {
                "ln": {"w": packed["wln"][i].T, "b": packed["bln"][i, :, 0]},
                "skp": {"w": packed["wsk"][i].T},
            }
            for i in range(n_layers)
        ],
        "out": {
            "ln": {"w": packed["wout"].T, "b": packed["bout"][:, 0]},
            "skp": {"w": packed["wosk"].T},
        },
    }
    return {
        "linear": {"w": packed["wt"][:, 0], "b": packed["bt"][:, 0]},
        "flow": {"steps": steps},
        "convex": conv,
    }


def _mask_col(i: int):
    """Static coupling mask column for channels=2 (binary counting:
    even flows keep channel 0, odd keep channel 1). Computed in-kernel via
    iota — captured array constants are rejected by pallas_call."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (2, 1), 0)
    return (rows == (i % 2)).astype(jnp.float32)


def _kernel(n_flows: int, n_layers: int, hidden: int, use_tanh: bool,
            use_sigmoid: bool, use_bf16: bool, group: int,
            x_ref, tgt_ref, wpt_ref,
            pre_a_ref, pre_b_ref, post_a_ref, post_b_ref,
            *refs):
    """One point tile: full fwd + bwd, transposed (C, T) layout.

    ``group`` > 1 processes several images' fits in ONE program (weights /
    data / grads carry a leading group axis; a static python loop emits
    all images' ops into the same program) — amortizing the fixed
    per-program cost that dominates small tiles.
    """
    n_p = len(PACKED_FIELDS)
    w = {name: refs[k] for k, name in enumerate(PACKED_FIELDS)}
    loss_ref = refs[n_p]
    d = {name: refs[n_p + 1 + k] for k, name in enumerate(PACKED_FIELDS)}
    first = pl.program_id(0) == 0
    not_first = jnp.logical_not(first)

    def acc(ref, val, idx=None):
        """Accumulate into a (possibly sliced) VMEM-resident output block
        across sequential grid steps: write on the first program, add on
        the rest (slices of the same buffer are written by different
        static ``idx`` within one program, so zero-init must be per-slice)."""
        if idx is None:
            @pl.when(first)
            def _w():
                ref[...] = val

            @pl.when(not_first)
            def _a():
                ref[...] = ref[...] + val
        else:
            @pl.when(first)
            def _w():
                ref[idx] = val

            @pl.when(not_first)
            def _a():
                ref[idx] = ref[idx] + val

    f32 = jnp.float32
    cdt = jnp.bfloat16 if use_bf16 else jnp.float32

    def mm(a, b):
        """All matmuls route here: optional bf16 inputs (2x MXU packing on
        the K dimension — ICNN K=130 halves its passes), f32 accumulation.
        Precision is PINNED to DEFAULT: under an ambient
        ``jax.default_matmul_precision('highest')`` Mosaic would expand
        every dot into f32-emulation passes and overflow scoped VMEM
        (measured: 47.6M > 16M limit at tile 4096); the kernel's accuracy
        story is the f32 accumulate + f32 master params, not pass count."""
        return jnp.dot(a.astype(cdt), b.astype(cdt),
                       preferred_element_type=f32,
                       precision=jax.lax.Precision.DEFAULT)

    # NOTE: bf16-casting ONLY the weight-gradient matmuls (K = tile_n,
    # where bf16 K-packing halves the MXU passes) was measured SLOWER at
    # 480x640 (5184 vs 4541 us/step): the VPU cast traffic on the
    # (width, T) operands outweighs the pass savings — same verdict as
    # full bf16 (docs/design.md round-4 roofline). mmw stays an alias so
    # the sites remain marked.
    mmw = mm

    # block mask for the merged second layer: rows [s|t] x cols [hs|ht]
    r4 = jax.lax.broadcasted_iota(jnp.int32, (4, 2 * hidden), 0)
    c4 = jax.lax.broadcasted_iota(jnp.int32, (4, 2 * hidden), 1)
    w2_mask = (
        ((r4 < 2) & (c4 < hidden)) | ((r4 >= 2) & (c4 >= hidden))
    ).astype(f32)

    for g in range(group):

        def W(name, i=None):
            ref = w[name]
            if group > 1:
                return ref[g] if i is None else ref[g, i]
            return ref[...] if i is None else ref[i]

        def A(name, val, i=None):
            if group > 1:
                acc(d[name], val, (g,) if i is None else (g, i))
            else:
                acc(d[name], val, i)

        x = x_ref[...]  # (2, T) — points shared across the group
        tgt = tgt_ref[g] if group > 1 else tgt_ref[...]  # (1, T)
        wpt = wpt_ref[g] if group > 1 else wpt_ref[...]  # (1, T)

        # ---- forward: translate + norm ----
        wt = W("wt")
        bt = W("bt")
        x1 = x * wt + bt
        pre_a = pre_a_ref[...]
        z = x1 * pre_a + pre_b_ref[...]

        # ---- forward: flow, saving inputs + activations for the bwd ----
        # (rematerialization traded back for VMEM: at the fused tile size
        # the whole activation set fits on-chip, so the bwd pass reuses
        # these instead of recomputing — ~2 fewer matmuls per coupling)
        z_saved = []
        h_saved = []
        st_saved = []
        for i in range(n_flows):
            z_saved.append(z)
            b = _mask_col(i)
            zm = z * b
            h = jnp.maximum(mm(W("w1", i), zm) + W("b1", i), 0.0)
            h_saved.append(h)  # (2*hidden, T)
            # merged second layer: block-diagonal (4, 2*hidden) -> rows
            # [s(2) | t(2)] in ONE matmul (the step is issue-bound; zeros
            # in the off-blocks are free, their grads are masked in bwd)
            st = mm(W("w2", i), h) + W("b2", i)  # (4, T)
            if use_tanh:
                st = jnp.tanh(st)
            st_saved.append(st)
            s, t = st[:2], st[2:]
            z = zm + (1.0 - b) * (z * jnp.exp(s) + t)
            z_saved.append(z)  # pre-ActNorm value
            z = z * jnp.exp(W("an_s", i)) + W("an_t", i)

        # ---- forward: inverse norm + ICNN ----
        # skip matmuls are concat-K fused: [wln | wsk] @ [h; xd] turns two
        # underfilled MXU issues (K=130 -> 2 tiles, plus K=2 -> 1 tile)
        # into one K=132 (2-tile) issue — ~10% fewer passes overall on a
        # pass-bound step (docs/design.md round-4 roofline).
        xd = z * post_a_ref[...] + post_b_ref[...]
        pre_acts = []
        h = mm(W("win"), xd) + W("bin")
        pre_acts.append(h)
        h = jnp.maximum(h, 0.0)
        acts = [h]
        icnn_w = W("win").shape[0]
        for i in range(n_layers):
            wcat = jnp.concatenate([W("wln", i), W("wsk", i)], axis=1)
            hx = jnp.concatenate([h, xd], axis=0)  # (icnn_w + 2, T)
            zl = mm(wcat, hx) + W("bln", i)
            pre_acts.append(zl)
            h = jnp.maximum(zl, 0.0)
            acts.append(h)
        wcat_out = jnp.concatenate([W("wout"), W("wosk")], axis=1)
        hx_last = jnp.concatenate([h, xd], axis=0)
        y = mm(wcat_out, hx_last) + W("bout")  # (1, T)

        # ---- loss + dL/dy ----
        if use_sigmoid:
            p = jax.nn.sigmoid(y)
            e = p - tgt
            loss_val = jnp.sum(wpt * e * e)
            gy = wpt * 2.0 * e * p * (1.0 - p)
        else:
            e = y - tgt
            loss_val = jnp.sum(wpt * e * e)
            gy = wpt * 2.0 * e
        if group > 1:
            acc(loss_ref, loss_val.reshape(1), (g,))
        else:
            acc(loss_ref, loss_val.reshape(1, 1))

        # ---- backward: ICNN (concat-K fused like the forward) ----
        g_out = mmw(gy, hx_last.T)  # (1, icnn_w + 2)
        A("wout", g_out[:, :icnn_w])
        A("bout", jnp.sum(gy, axis=1, keepdims=True))
        A("wosk", g_out[:, icnn_w:])
        d_hx = mm(wcat_out.T, gy)  # (icnn_w + 2, T)
        dh = d_hx[:icnn_w]
        dxd = d_hx[icnn_w:]
        for i in reversed(range(n_layers)):
            dz = dh * (pre_acts[i + 1] > 0.0)
            hx_i = jnp.concatenate([acts[i], xd], axis=0)
            g_cat = mmw(dz, hx_i.T)  # (icnn_w, icnn_w + 2)
            A("wln", g_cat[:, :icnn_w], i)
            A("bln", jnp.sum(dz, axis=1, keepdims=True), i)
            A("wsk", g_cat[:, icnn_w:], i)
            wcat_i = jnp.concatenate([W("wln", i), W("wsk", i)], axis=1)
            d_hx = mm(wcat_i.T, dz)
            dh = d_hx[:icnn_w]
            dxd = dxd + d_hx[icnn_w:]
        dz0 = dh * (pre_acts[0] > 0.0)
        A("win", mmw(dz0, xd.T))
        A("bin", jnp.sum(dz0, axis=1, keepdims=True))
        dxd = dxd + mm(W("win").T, dz0)

        # ---- backward: inverse norm, then the flow chain ----
        gz = dxd * post_a_ref[...]
        for i in reversed(range(n_flows)):
            z_pre_an = z_saved[2 * i + 1]
            z_in = z_saved[2 * i]
            es_an = jnp.exp(W("an_s", i))
            A("an_s", jnp.sum(gz * z_pre_an * es_an, axis=1, keepdims=True),
              i)
            A("an_t", jnp.sum(gz, axis=1, keepdims=True), i)
            gz = gz * es_an

            b = _mask_col(i)
            inv_b = 1.0 - b
            zm = z_in * b
            h = h_saved[i]  # post-relu (2*hidden, T); relu' == (h > 0)
            st = st_saved[i]  # post-tanh (4, T)
            s_act = st[:2]
            es = jnp.exp(s_act)

            ds = inv_b * gz * z_in * es
            dt = inv_b * gz
            d_st = jnp.concatenate([ds, dt], axis=0)  # (4, T)
            if use_tanh:
                d_st = d_st * (1.0 - st * st)
            # off-block grads are nonzero algebraically but the stored
            # weights there are exactly 0 and must stay 0 — mask them out
            A("w2", mmw(d_st, h.T) * w2_mask, i)
            A("b2", jnp.sum(d_st, axis=1, keepdims=True), i)
            dh_all = mm(W("w2", i).T, d_st) * (h > 0.0)
            A("w1", mmw(dh_all, zm.T), i)
            A("b1", jnp.sum(dh_all, axis=1, keepdims=True), i)
            dzm = mm(W("w1", i).T, dh_all)
            gz = b * gz + inv_b * gz * es + b * dzm

        # ---- backward: norm pre-affine + translation ----
        dx1 = gz * pre_a
        A("wt", jnp.sum(dx1 * x, axis=1, keepdims=True))
        A("bt", jnp.sum(dx1, axis=1, keepdims=True))


def _kernel_interleaved(n_flows: int, n_layers: int, hidden: int,
                        use_tanh: bool, use_sigmoid: bool, use_bf16: bool,
                        group: int,
                        x_ref, tgt_ref, wpt_ref,
                        pre_a_ref, pre_b_ref, post_a_ref, post_b_ref,
                        *refs):
    """Interleaved + rematerializing variant of ``_kernel`` for group > 1.

    Same math, different schedule and VMEM budget:

    - **Interleaved emission**: each op site loops over the group, so the
      G images' (independent) matmul chains alternate in program order.
      Mosaic does NOT reorder across the sequential per-image loop of
      ``_kernel`` (measured: group=2 at tile 1024 runs 0.68x of solo at
      tile 2048 — worse than linear), but it DOES pipeline explicitly
      alternating independent chains (micro: duo 0.63 vs solo 1.23
      us/matmul at these widths). The flagship step is dependency-stall
      bound (1.9x its zero-stall pass bound, docs/design.md round-4), so
      alternation attacks exactly the measured gap.
    - **Rematerialization** pays for the VMEM to keep the FULL tile for
      every group member: the flow's post-relu ``h`` (the big save:
      (2*hidden, T) x n_flows = 6 MB/image at T=2048) is recomputed in
      the bwd from the saved coupling inputs (+1 matmul per coupling,
      +~10%% passes), and the ICNN's post-relu ``acts`` are recomputed
      from the saved ``pre_acts`` (a free VPU relu). ``z``/``st``/
      ``pre_acts`` saves are small and stay.

    Net: ~4 MB/image of saves, so TWO images fit at T=2048 where
    ``_kernel`` needs T=1024 — and the alternating chains hide each
    other's MXU latency instead of paying the half-tile tax that made
    plain grouping a wash (0.97x) in the micro.
    """
    n_p = len(PACKED_FIELDS)
    w = {name: refs[k] for k, name in enumerate(PACKED_FIELDS)}
    loss_ref = refs[n_p]
    d = {name: refs[n_p + 1 + k] for k, name in enumerate(PACKED_FIELDS)}
    first = pl.program_id(0) == 0
    not_first = jnp.logical_not(first)

    f32 = jnp.float32
    cdt = jnp.bfloat16 if use_bf16 else jnp.float32

    def mm(a, b):
        return jnp.dot(a.astype(cdt), b.astype(cdt),
                       preferred_element_type=f32,
                       precision=jax.lax.Precision.DEFAULT)

    def W(g, name, i=None):
        ref = w[name]
        return ref[g] if i is None else ref[g, i]

    def A(g, name, val, i=None):
        ref = d[name]
        idx = (g,) if i is None else (g, i)

        @pl.when(first)
        def _w():
            ref[idx] = val

        @pl.when(not_first)
        def _a():
            ref[idx] = ref[idx] + val

    G = range(group)
    x = x_ref[...]  # (2, T) shared across the group
    pre_a = pre_a_ref[...]
    pre_b = pre_b_ref[...]
    post_a = post_a_ref[...]

    # ---- forward: translate + norm ----
    z = [x * W(g, "wt") + W(g, "bt") for g in G]
    z = [zi * pre_a + pre_b for zi in z]

    # ---- forward: flow (saving z and st only; h is rematerialized) ----
    z_saved = [[] for _ in G]
    st_saved = [[] for _ in G]
    for i in range(n_flows):
        b = _mask_col(i)
        zm = [None] * group
        h = [None] * group
        st = [None] * group
        for g in G:
            z_saved[g].append(z[g])
            zm[g] = z[g] * b
        for g in G:
            h[g] = jnp.maximum(mm(W(g, "w1", i), zm[g]) + W(g, "b1", i),
                               0.0)
        for g in G:
            st[g] = mm(W(g, "w2", i), h[g]) + W(g, "b2", i)
            if use_tanh:
                st[g] = jnp.tanh(st[g])
            st_saved[g].append(st[g])
        for g in G:
            s, t = st[g][:2], st[g][2:]
            z[g] = zm[g] + (1.0 - b) * (z[g] * jnp.exp(s) + t)
            z_saved[g].append(z[g])  # pre-ActNorm value
            z[g] = z[g] * jnp.exp(W(g, "an_s", i)) + W(g, "an_t", i)

    # ---- forward: inverse norm + ICNN (saving pre_acts only) ----
    xd = [z[g] * post_a + post_b_ref[...] for g in G]
    pre_acts = [[] for _ in G]
    h = [None] * group
    for g in G:
        ph = mm(W(g, "win"), xd[g]) + W(g, "bin")
        pre_acts[g].append(ph)
        h[g] = jnp.maximum(ph, 0.0)
    icnn_w = w["win"].shape[1]
    for i in range(n_layers):
        for g in G:
            wcat = jnp.concatenate([W(g, "wln", i), W(g, "wsk", i)], axis=1)
            hx = jnp.concatenate([h[g], xd[g]], axis=0)
            zl = mm(wcat, hx) + W(g, "bln", i)
            pre_acts[g].append(zl)
            h[g] = jnp.maximum(zl, 0.0)
    y = [None] * group
    for g in G:
        wcat_out = jnp.concatenate([W(g, "wout"), W(g, "wosk")], axis=1)
        hx_last = jnp.concatenate([h[g], xd[g]], axis=0)
        y[g] = mm(wcat_out, hx_last) + W(g, "bout")  # (1, T)

    # ---- loss + dL/dy ----
    gy = [None] * group
    for g in G:
        tgt = tgt_ref[g]
        wpt = wpt_ref[g]
        if use_sigmoid:
            p = jax.nn.sigmoid(y[g])
            e = p - tgt
            loss_val = jnp.sum(wpt * e * e)
            gy[g] = wpt * 2.0 * e * p * (1.0 - p)
        else:
            e = y[g] - tgt
            loss_val = jnp.sum(wpt * e * e)
            gy[g] = wpt * 2.0 * e
        idx = (g,)

        @pl.when(first)
        def _w(loss_val=loss_val, idx=idx):
            loss_ref[idx] = loss_val.reshape(1)

        @pl.when(not_first)
        def _a(loss_val=loss_val, idx=idx):
            loss_ref[idx] = loss_ref[idx] + loss_val.reshape(1)

    # ---- backward: ICNN (acts recomputed from saved pre_acts) ----
    dh = [None] * group
    dxd = [None] * group
    for g in G:
        hx_last = jnp.concatenate(
            [jnp.maximum(pre_acts[g][n_layers], 0.0), xd[g]], axis=0)
        g_out = mm(gy[g], hx_last.T)  # (1, icnn_w + 2)
        A(g, "wout", g_out[:, :icnn_w])
        A(g, "bout", jnp.sum(gy[g], axis=1, keepdims=True))
        A(g, "wosk", g_out[:, icnn_w:])
        wcat_out = jnp.concatenate([W(g, "wout"), W(g, "wosk")], axis=1)
        d_hx = mm(wcat_out.T, gy[g])
        dh[g] = d_hx[:icnn_w]
        dxd[g] = d_hx[icnn_w:]
    for i in reversed(range(n_layers)):
        for g in G:
            dz = dh[g] * (pre_acts[g][i + 1] > 0.0)
            hx_i = jnp.concatenate(
                [jnp.maximum(pre_acts[g][i], 0.0), xd[g]], axis=0)
            g_cat = mm(dz, hx_i.T)
            A(g, "wln", g_cat[:, :icnn_w], i)
            A(g, "bln", jnp.sum(dz, axis=1, keepdims=True), i)
            A(g, "wsk", g_cat[:, icnn_w:], i)
            wcat_i = jnp.concatenate([W(g, "wln", i), W(g, "wsk", i)],
                                     axis=1)
            d_hx = mm(wcat_i.T, dz)
            dh[g] = d_hx[:icnn_w]
            dxd[g] = dxd[g] + d_hx[icnn_w:]
    gz = [None] * group
    for g in G:
        dz0 = dh[g] * (pre_acts[g][0] > 0.0)
        A(g, "win", mm(dz0, xd[g].T))
        A(g, "bin", jnp.sum(dz0, axis=1, keepdims=True))
        dxd[g] = dxd[g] + mm(W(g, "win").T, dz0)
        gz[g] = dxd[g] * post_a

    # ---- backward: flow (h rematerialized from the saved z) ----
    r4 = jax.lax.broadcasted_iota(jnp.int32, (4, 2 * hidden), 0)
    c4 = jax.lax.broadcasted_iota(jnp.int32, (4, 2 * hidden), 1)
    w2_mask = (
        ((r4 < 2) & (c4 < hidden)) | ((r4 >= 2) & (c4 >= hidden))
    ).astype(f32)
    for i in reversed(range(n_flows)):
        b = _mask_col(i)
        inv_b = 1.0 - b
        zm = [None] * group
        h = [None] * group
        d_st = [None] * group
        for g in G:
            z_pre_an = z_saved[g][2 * i + 1]
            es_an = jnp.exp(W(g, "an_s", i))
            A(g, "an_s",
              jnp.sum(gz[g] * z_pre_an * es_an, axis=1, keepdims=True), i)
            A(g, "an_t", jnp.sum(gz[g], axis=1, keepdims=True), i)
            gz[g] = gz[g] * es_an
            zm[g] = z_saved[g][2 * i] * b
        for g in G:  # REMAT: recompute post-relu h (+1 matmul/coupling)
            h[g] = jnp.maximum(mm(W(g, "w1", i), zm[g]) + W(g, "b1", i),
                               0.0)
        for g in G:
            z_in = z_saved[g][2 * i]
            st = st_saved[g][i]
            es = jnp.exp(st[:2])
            ds = inv_b * gz[g] * z_in * es
            dt = inv_b * gz[g]
            dsdt = jnp.concatenate([ds, dt], axis=0)
            if use_tanh:
                dsdt = dsdt * (1.0 - st * st)
            d_st[g] = dsdt
        dh_all = [None] * group
        for g in G:
            A(g, "w2", mm(d_st[g], h[g].T) * w2_mask, i)
            A(g, "b2", jnp.sum(d_st[g], axis=1, keepdims=True), i)
            dh_all[g] = mm(W(g, "w2", i).T, d_st[g]) * (h[g] > 0.0)
        for g in G:
            A(g, "w1", mm(dh_all[g], zm[g].T), i)
            A(g, "b1", jnp.sum(dh_all[g], axis=1, keepdims=True), i)
            dzm = mm(W(g, "w1", i).T, dh_all[g])
            st = st_saved[g][i]
            es = jnp.exp(st[:2])
            gz[g] = b * gz[g] + inv_b * gz[g] * es + b * dzm

    # ---- backward: norm pre-affine + translation ----
    for g in G:
        dx1 = gz[g] * pre_a
        A(g, "wt", jnp.sum(dx1 * x, axis=1, keepdims=True))
        A(g, "bt", jnp.sum(dx1, axis=1, keepdims=True))


def make_flagship_loss_grad(model, use_sigmoid: bool = True,
                            tile_n: Any = None, interpret: bool = False,
                            use_bf16: bool = False, group: int = 1,
                            interleave: bool = False):
    """Build ``f(packed, x, target, point_weights) -> (loss, packed_grads)``
    — the fused value_and_grad of the flagship objective.

    x: (N, 2) points; target/point_weights: (N, 1). All f32.
    ``use_bf16``: matmul inputs cast to bf16 (f32 accumulation) — 2x MXU
    K-packing on the ICNN's K=130 dots; master params stay f32.
    ``group`` > 1: process a GROUP of images' fits per kernel program —
    packed leaves carry a leading group axis, target/point_weights are
    (G, N, 1), points stay shared; returns per-image losses (G,) and
    grouped grads. Amortizes the fixed per-program cost.
    ``tile_n=None`` auto-sizes the tile to Mosaic's scoped-VMEM stack
    (:func:`auto_tile_n`) — wide models (e.g. the width-130 flow of the
    default factory config) need tile 1024 where the bench 32/12 config
    runs the full 2048.
    ``interleave`` (group > 1 only): emit the group members' independent
    op chains ALTERNATING per site with flow-``h``/ICNN-``acts``
    rematerialized (``_kernel_interleaved``) — pipelines the chains on
    the MXU instead of running them back-to-back, and the remat frees
    the VMEM to keep the full tile per member.
    """
    if not flagship_supported(model):
        raise ValueError("model not in the fused flagship family")
    if interleave and group < 2:
        raise ValueError("interleave requires group >= 2")
    if tile_n is None:
        tile_n = auto_tile_n(model, group=group, interleave=interleave)
    flow = model.flow_net
    n_flows = flow.n_flows
    hidden = flow.hidden_units
    n_layers = model.convex_net.n_hidden_layers
    use_tanh = flow.output_fn == "tanh"
    pre_a, pre_b, post_a, post_b = _norm_constants(model)

    kern = functools.partial(
        _kernel_interleaved if interleave else _kernel,
        n_flows, n_layers, hidden, use_tanh, use_sigmoid, use_bf16,
        group,
    )

    def f(packed, x, target, point_weights):
        n = x.shape[0]
        if n == 0:
            # a 0-point input would launch a 0-size grid: the kernel
            # body (incl. the first-tile zero-init) never runs and the
            # output buffers come back UNINITIALIZED — fail loudly
            raise ValueError("flagship kernel needs at least one point")
        pad = (-n) % tile_n
        x_t = jnp.pad(x, ((0, pad), (0, 0))).T  # (2, Np)
        if group > 1:
            # (G, N, 1) -> (G, 1, Np)
            tgt_t = jnp.swapaxes(
                jnp.pad(target, ((0, 0), (0, pad), (0, 0))), 1, 2
            )
            wpt_t = jnp.swapaxes(
                jnp.pad(point_weights, ((0, 0), (0, pad), (0, 0))), 1, 2
            )
            data_specs = [
                pl.BlockSpec((2, tile_n), lambda i: (0, i)),
                pl.BlockSpec((group, 1, tile_n), lambda i: (0, 0, i)),
                pl.BlockSpec((group, 1, tile_n), lambda i: (0, 0, i)),
            ]
            loss_shape = (group, 1)
            loss_spec = pl.BlockSpec((group, 1), lambda i: (0, 0))
        else:
            tgt_t = jnp.pad(target, ((0, pad), (0, 0))).T  # (1, Np)
            wpt_t = jnp.pad(point_weights, ((0, pad), (0, 0))).T
            data_specs = [
                pl.BlockSpec((2, tile_n), lambda i: (0, i)),
                pl.BlockSpec((1, tile_n), lambda i: (0, i)),
                pl.BlockSpec((1, tile_n), lambda i: (0, i)),
            ]
            loss_shape = (1, 1)
            loss_spec = pl.BlockSpec((1, 1), lambda i: (0, 0))
        grid = (x_t.shape[1] // tile_n,)

        consts = [
            pl.BlockSpec((2, 1), lambda i: (0, 0)) for _ in range(4)
        ]
        weights = [packed[name] for name in PACKED_FIELDS]
        w_specs = [
            pl.BlockSpec(wv.shape, lambda i, nd=wv.ndim: (0,) * nd)
            for wv in weights
        ]
        out_shapes = [jax.ShapeDtypeStruct(loss_shape, jnp.float32)] + [
            jax.ShapeDtypeStruct(wv.shape, jnp.float32) for wv in weights
        ]
        out_specs = [loss_spec] + [
            pl.BlockSpec(wv.shape, lambda i, nd=wv.ndim: (0,) * nd)
            for wv in weights
        ]
        outs = pl.pallas_call(
            kern,
            out_shape=tuple(out_shapes),
            grid=grid,
            in_specs=data_specs + consts + w_specs,
            out_specs=tuple(out_specs),
            interpret=interpret,
        )(
            x_t, tgt_t, wpt_t,
            jnp.asarray(pre_a), jnp.asarray(pre_b),
            jnp.asarray(post_a), jnp.asarray(post_b),
            *weights,
        )
        loss = outs[0][:, 0] if group > 1 else outs[0][0, 0]
        grads = {
            name: outs[1 + k] for k, name in enumerate(PACKED_FIELDS)
        }
        return loss, grads

    return f


# --- packed-state helpers for the fit engine -------------------------------


def packed_weight_decay(packed: dict, flow_weight_decay: float) -> dict:
    """Per-buffer weight decay: flow buffers get ``flow_weight_decay``
    (the reference's optimizer param groups,
    `awesome/model/path_connected_net.py:913-918`), everything else 0."""
    flow_names = {"w1", "b1", "w2", "b2", "an_s", "an_t"}
    return {
        name: (flow_weight_decay if name in flow_names else 0.0)
        for name in packed
    }


def packed_enforce_convexity(packed: dict) -> dict:
    """Clip the ICNN hidden-to-hidden weights (wln, wout) to >= 0 — the
    convexity projection on the packed layout (clip AFTER the optimizer
    step, `awesome/model/path_connected_net.py:950-952`)."""
    return dict(
        packed,
        wln=jnp.maximum(packed["wln"], 0.0),
        wout=jnp.maximum(packed["wout"], 0.0),
    )
