"""Fused MULTI-LAYER Pallas LSTM recurrence (forward + custom-VJP backward).

Extends fewshot/ops/lstm_pallas.py (single layer) by advancing ALL layers
inside one grid step: grid = (batch_tiles, T), and program (bi, t) runs the
cell update for layers 0..L-1 at time t back-to-back while every layer's
(h, c) lives in one VMEM scratch.  Compared with running L separate
kernels this

  * halves (L=2) the number of sequential grid steps — the recurrence's
    per-step pipeline overhead is the dominant cost at song-scale T; and
  * deletes the inter-layer HBM round trip: layer l's output feeds layer
    l+1 in-register, so the bulk `ys_1 @ Wx_2` projection (one [T,B,H]
    read + [T,B,4H] write + re-read per step) disappears entirely.  The
    l >= 1 input projections become per-step [Bt,H]x[H,4H] MXU matmuls
    inside the kernel — more serial MXU work, but it overlaps the VPU
    gate math of the neighbouring layers in the pipeline.

The layer-0 input projection x @ Wx_0 (the only one whose input is not
produced inside the kernel) stays OUTSIDE as one big MXU matmul, exactly
like the single-layer kernel — it also carries the dWx_0/dx grads for
free.

Backward: reverse-time BPTT over all layers per grid step, top layer
first; d(input_{l+1}) = dz_{l+1} @ Wx_{l+1}^T flows to layer l within the
same program, so inter-layer activation grads never touch HBM either.
Gate activations are saved by the forward (the saved-gates trade measured
faster in round 2); c_prev streams through a shifted index_map.  Weight
grads (dWh_l, dWx_l for l >= 1) fall out of bulk MXU contractions over
the saved dzx afterwards; db accumulates in-kernel.

Reference anchor: BASELINE.json:5 names the fused Pallas scan cell as the
hot op; the reference itself (SURVEY.md §4.5) runs `dynamic_rnn` per
layer on CPU.  Constraint: hidden_dim % 128 == 0 and every layer beyond
the first must map H -> H (true for the stacked-LSTM architecture).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fewshot.ops.lstm_pallas import _INTERPRET, FORGET_BIAS


def _fused_batch_tile(b: int, hidden: int, n_layers: int, itemsize: int,
                      stream_h: int) -> int:
    """Largest divisor of b (<=256, multiple of 8) fitting the VMEM budget.

    The whole footprint shares Mosaic's ~16MB scoped budget: the resident
    weights ((2L-1) matrices of [H, 4H] at the compute dtype), the
    double-buffered per-step streams (`stream_h` H-widths per row at the
    stream dtype — the caller passes its pass's actual count), the f32
    state scratch (4*L*H/row) and the per-layer f32 z/dz temporaries
    (~8H/row).  bt floors at 8 (one f32 sublane tile)."""
    weight_bytes = (2 * n_layers - 1) * hidden * 4 * hidden * itemsize
    budget = 14 * 2 ** 20 - weight_bytes
    per_row = (hidden * stream_h * 2 * itemsize        # streams, dbl-buffered
               + hidden * n_layers * 4 * 4             # f32 h/c scratch
               + hidden * 8 * 4)                       # z/dz temporaries
    for cand in range(min(b, 256), 0, -1):
        if b % cand and cand != b:
            continue
        if cand % 8 and cand != b:
            continue
        if cand * per_row > budget and cand > 8:
            continue
        return cand
    return b


def _stream_widths(n_layers: int, save_gates: bool) -> tuple[int, int]:
    """(fwd, bwd) per-row stream widths in H units for the two passes."""
    fwd = 4 + (6 if save_gates else 4) * n_layers   # zx + L*(ys+cs[+gates])
    bwd = 10 * n_layers + 1                         # gates+2cs+dzx per L +dys
    return fwd, bwd


def _gate_slices(z, hidden):
    si = jax.nn.sigmoid(z[:, :hidden])
    tj = jnp.tanh(z[:, hidden:2 * hidden])
    sf = jax.nn.sigmoid(z[:, 2 * hidden:3 * hidden] + FORGET_BIAS)
    so = jax.nn.sigmoid(z[:, 3 * hidden:])
    return si, tj, sf, so


def _fwd_kernel(zx_ref, wx_ref, wh_ref, b_ref, mask_ref, h0_ref, c0_ref,
                ys_ref, cs_ref, hT_ref, cT_ref, h_sc, c_sc,
                gates_ref=None):
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    n_layers, _, hidden = h_sc.shape

    @pl.when(t == 0)
    def _():
        h_sc[:] = h0_ref[:]
        c_sc[:] = c0_ref[:]

    m = mask_ref[0]
    inp = None
    for l in range(n_layers):
        h, c = h_sc[l], c_sc[l]
        if l == 0:
            z = zx_ref[0].astype(jnp.float32)
        else:
            z = jnp.dot(inp.astype(wx_ref.dtype), wx_ref[l - 1],
                        preferred_element_type=jnp.float32)
        z = z + jnp.dot(h.astype(wh_ref.dtype), wh_ref[l],
                        preferred_element_type=jnp.float32) + b_ref[l]
        si, tj, sf, so = _gate_slices(z, hidden)
        new_c = sf * c + si * tj
        new_h = so * jnp.tanh(new_c)
        if gates_ref is not None:
            gates_ref[l, 0] = jnp.concatenate([si, tj, sf, so],
                                              axis=-1).astype(gates_ref.dtype)
        # The next layer consumes the MASKED output — identical to the
        # unfused stack, where layer l+1 reads ys_l (held h on PAD steps).
        hm = jnp.where(m > 0, new_h, h)
        cm = jnp.where(m > 0, new_c, c)
        h_sc[l] = hm
        c_sc[l] = cm
        ys_ref[l, 0] = hm.astype(ys_ref.dtype)
        cs_ref[l, 0] = cm.astype(cs_ref.dtype)
        inp = hm

    @pl.when(t == n_t - 1)
    def _():
        hT_ref[:] = h_sc[:]
        cT_ref[:] = c_sc[:]


def _fwd_call(zx, wx_rest, wh, b, mask, h0, c0, save_gates: bool = False):
    t_, b_, four_h = zx.shape
    hidden = four_h // 4
    n_layers = wh.shape[0]
    f32 = jnp.float32
    st = zx.dtype
    bt = _fused_batch_tile(b_, hidden, n_layers, jnp.dtype(st).itemsize,
                           _stream_widths(n_layers, save_gates)[0])
    kw = dict(memory_space=pltpu.VMEM)
    step3 = lambda bi, t: (t, bi, 0)                  # noqa: E731
    lstep4 = lambda bi, t: (0, t, bi, 0)              # noqa: E731
    ltile3 = lambda bi, t: (0, bi, 0)                 # noqa: E731
    const3 = lambda bi, t: (0, 0, 0)                  # noqa: E731
    out_specs = [
        pl.BlockSpec((n_layers, 1, bt, hidden), lstep4, **kw),   # ys
        pl.BlockSpec((n_layers, 1, bt, hidden), lstep4, **kw),   # cs
        pl.BlockSpec((n_layers, bt, hidden), ltile3, **kw),      # hT
        pl.BlockSpec((n_layers, bt, hidden), ltile3, **kw),      # cT
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_layers, t_, b_, hidden), st),
        jax.ShapeDtypeStruct((n_layers, t_, b_, hidden), st),
        jax.ShapeDtypeStruct((n_layers, b_, hidden), f32),
        jax.ShapeDtypeStruct((n_layers, b_, hidden), f32),
    ]
    kernel = _fwd_kernel
    if save_gates:
        out_specs.append(
            pl.BlockSpec((n_layers, 1, bt, four_h), lstep4, **kw))
        out_shape.append(
            jax.ShapeDtypeStruct((n_layers, t_, b_, four_h), st))

        def kernel(zx_ref, wx_ref, wh_ref, b_ref, mask_ref, h0_ref,  # noqa
                   c0_ref, ys_ref, cs_ref, hT_ref, cT_ref, gates_ref,
                   h_sc, c_sc):
            _fwd_kernel(zx_ref, wx_ref, wh_ref, b_ref, mask_ref, h0_ref,
                        c0_ref, ys_ref, cs_ref, hT_ref, cT_ref, h_sc, c_sc,
                        gates_ref=gates_ref)
    out = pl.pallas_call(
        kernel,
        grid=(b_ // bt, t_),
        in_specs=[
            pl.BlockSpec((1, bt, four_h), step3, **kw),              # zx
            pl.BlockSpec((max(n_layers - 1, 1), hidden, four_h),
                         const3, **kw),                              # wx_rest
            pl.BlockSpec((n_layers, hidden, four_h), const3, **kw),  # wh
            pl.BlockSpec((n_layers, 1, four_h), const3, **kw),       # b
            pl.BlockSpec((1, bt, 1), step3, **kw),                   # mask
            pl.BlockSpec((n_layers, bt, hidden), ltile3, **kw),      # h0
            pl.BlockSpec((n_layers, bt, hidden), ltile3, **kw),      # c0
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n_layers, bt, hidden), f32),
            pltpu.VMEM((n_layers, bt, hidden), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t_ * b_ * hidden * four_h * (2 * n_layers - 1),
            bytes_accessed=2 * t_ * b_ * hidden * (4 + 6 * n_layers),
            transcendentals=5 * n_layers * t_ * b_ * hidden,
        ),
        interpret=_INTERPRET,
    )(zx, wx_rest, wh, b[:, None], mask, h0, c0)
    return out  # ys, cs, hT, cT[, gates]


def _bwd_kernel(gates_ref, wx_ref, wh_ref, mask_ref, cprev_ref, cs_ref,
                c0_ref, dys_ref, dhT_ref, dcT_ref,
                dzx_ref, dh0_ref, dc0_ref, db_ref,
                dh_sc, dc_sc):
    """Program (bi, p) handles t = T-1-p, all layers, TOP layer first.

    dys (the external cotangent) lands only on the top layer; lower
    layers receive their activation grads in-register from the layer
    above (dz_{l+1} @ Wx_{l+1}^T) — the inter-layer streams that the
    unfused backward pays HBM for.  Masked-step semantics match the
    unfused stack exactly: dz = 0 on PAD steps and the incoming dh/dc
    carry straight through via the (1 - mf) terms."""
    p = pl.program_id(1)
    n_t = pl.num_programs(1)
    n_layers, _, hidden = dh_sc.shape

    @pl.when(p == 0)
    def _():
        dh_sc[:] = dhT_ref[:]
        dc_sc[:] = dcT_ref[:]
        db_ref[:] = jnp.zeros_like(db_ref)

    is_t0 = p == n_t - 1
    mf = (mask_ref[0] > 0).astype(jnp.float32)
    dh_upper = None
    for l in reversed(range(n_layers)):
        ext = dys_ref[0].astype(jnp.float32) if l == n_layers - 1 \
            else dh_upper
        dh = ext + dh_sc[l]
        dc = dc_sc[l]
        g = gates_ref[l, 0].astype(jnp.float32)
        si = g[:, :hidden]
        tj = g[:, hidden:2 * hidden]
        sf = g[:, 2 * hidden:3 * hidden]
        so = g[:, 3 * hidden:]
        tc = jnp.tanh(cs_ref[l, 0].astype(jnp.float32))
        c_prev = jnp.where(is_t0, c0_ref[l],
                           cprev_ref[l, 0].astype(jnp.float32))

        d_new_h = mf * dh
        d_new_c = d_new_h * so * (1.0 - tc * tc) + mf * dc
        di = d_new_c * tj * si * (1.0 - si)
        dj = d_new_c * si * (1.0 - tj * tj)
        df = d_new_c * c_prev * sf * (1.0 - sf)
        do = d_new_h * tc * so * (1.0 - so)
        dz = jnp.concatenate([di, dj, df, do], axis=-1)    # [Bt, 4H]

        dzx_ref[l, 0] = dz.astype(dzx_ref.dtype)
        bt, four_h = dz.shape
        if bt % 8 == 0:
            db_ref[0, l] = db_ref[0, l] + jnp.sum(
                dz.reshape(bt // 8, 8, four_h), axis=0)
        else:
            db_ref[0, l, 0:1] = db_ref[0, l, 0:1] + jnp.sum(
                dz, axis=0, keepdims=True)

        if l > 0:
            dh_upper = jax.lax.dot_general(
                dz.astype(wx_ref.dtype), wx_ref[l - 1],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        dh_sc[l] = jax.lax.dot_general(
            dz.astype(wh_ref.dtype), wh_ref[l], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + (1.0 - mf) * dh
        dc_sc[l] = d_new_c * sf + (1.0 - mf) * dc

    @pl.when(p == n_t - 1)
    def _():
        dh0_ref[:] = dh_sc[:]
        dc0_ref[:] = dc_sc[:]


def _bwd_call(gates, wx_rest, wh, mask, cs, c0, dys, dhT, dcT):
    n_layers, t_, b_, four_h = gates.shape
    hidden = four_h // 4
    f32 = jnp.float32
    st = gates.dtype
    bt = _fused_batch_tile(b_, hidden, n_layers, jnp.dtype(st).itemsize,
                           _stream_widths(n_layers, True)[1])
    kw = dict(memory_space=pltpu.VMEM)
    rev3 = lambda bi, p: (t_ - 1 - p, bi, 0)              # noqa: E731
    lrev4 = lambda bi, p: (0, t_ - 1 - p, bi, 0)          # noqa: E731
    lrevm1 = lambda bi, p: (0, jnp.maximum(t_ - 2 - p, 0), bi, 0)  # noqa: E731
    ltile3 = lambda bi, p: (0, bi, 0)                     # noqa: E731
    const3 = lambda bi, p: (0, 0, 0)                      # noqa: E731
    out = pl.pallas_call(
        _bwd_kernel,
        grid=(b_ // bt, t_),
        in_specs=[
            pl.BlockSpec((n_layers, 1, bt, four_h), lrev4, **kw),    # gates
            pl.BlockSpec((max(n_layers - 1, 1), hidden, four_h),
                         const3, **kw),                              # wx_rest
            pl.BlockSpec((n_layers, hidden, four_h), const3, **kw),  # wh
            pl.BlockSpec((1, bt, 1), rev3, **kw),                    # mask
            pl.BlockSpec((n_layers, 1, bt, hidden), lrevm1, **kw),   # c_prev
            pl.BlockSpec((n_layers, 1, bt, hidden), lrev4, **kw),    # c_t
            pl.BlockSpec((n_layers, bt, hidden), ltile3, **kw),      # c0
            pl.BlockSpec((1, bt, hidden), rev3, **kw),               # dys
            pl.BlockSpec((n_layers, bt, hidden), ltile3, **kw),      # dhT
            pl.BlockSpec((n_layers, bt, hidden), ltile3, **kw),      # dcT
        ],
        out_specs=[
            pl.BlockSpec((n_layers, 1, bt, four_h), lrev4, **kw),    # dzx
            pl.BlockSpec((n_layers, bt, hidden), ltile3, **kw),      # dh0
            pl.BlockSpec((n_layers, bt, hidden), ltile3, **kw),      # dc0
            pl.BlockSpec((1, n_layers, 8, four_h),
                         lambda bi, p: (bi, 0, 0, 0), **kw),         # db
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_layers, t_, b_, four_h), st),
            jax.ShapeDtypeStruct((n_layers, b_, hidden), f32),
            jax.ShapeDtypeStruct((n_layers, b_, hidden), f32),
            jax.ShapeDtypeStruct((b_ // bt, n_layers, 8, four_h), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_layers, bt, hidden), f32),
            pltpu.VMEM((n_layers, bt, hidden), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t_ * b_ * hidden * four_h * (2 * n_layers - 1),
            bytes_accessed=2 * t_ * b_ * hidden * (10 * n_layers + 1),
            transcendentals=n_layers * t_ * b_ * hidden,
        ),
        interpret=_INTERPRET,
    )(gates, wx_rest, wh, mask, cs, cs, c0, dys, dhT, dcT)
    return out  # dzx [L,T,B,4H], dh0, dc0, db_tiles


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------

@jax.custom_vjp
def lstm_stack_pallas(zx, wx_rest, wh, b, mask, h0, c0):
    """Fused multi-layer recurrence.

    zx [T,B,4H]: layer-0 input projection (x @ Wx_0), no bias.
    wx_rest [L-1,H,4H], wh [L,H,4H] at the compute dtype; b [L,4H] f32.
    mask [T,B,1] f32 (1 = real step); h0/c0 [L,B,H] f32.
    Returns (ys_top [T,B,H], hT [L,B,H], cT [L,B,H])."""
    ys, _cs, hT, cT = _fwd_call(zx, wx_rest, wh, b, mask, h0, c0)
    return ys[-1], hT, cT


def _vjp_fwd(zx, wx_rest, wh, b, mask, h0, c0):
    # Re-check TRAIN-mode eligibility here rather than trusting the caller:
    # stack_fused_supported(eval_mode=True) admits shapes whose save-gates
    # forward/backward would run at VMEM-forced tiny tiles (and can Mosaic-
    # OOM) — the eval_mode contract is "will not be differentiated", and
    # this is where a broken promise would otherwise surface as an opaque
    # compiler error (advisor finding r2).
    from fewshot.ops.lstm_pallas import _batch_tile
    n_layers, hidden = wh.shape[0], wh.shape[1]
    b_ = zx.shape[1]
    itemsize = jnp.dtype(wh.dtype).itemsize
    fw, bw = _stream_widths(n_layers, True)
    per_layer = _batch_tile(b_, hidden, itemsize)
    if (_fused_batch_tile(b_, hidden, n_layers, itemsize, fw) < per_layer
            or _fused_batch_tile(b_, hidden, n_layers, itemsize, bw)
            < per_layer):
        raise ValueError(
            "lstm_stack_pallas: differentiating a shape that is only "
            "eligible for the fused stack in eval_mode (forward-only "
            "footprint) — the save-gates train footprint forces degraded "
            "tiles here.  Use the per-layer kernels for training at this "
            "shape (models/lstm.py routes there when "
            "stack_fused_supported(..., eval_mode=False) is False).")
    ys, cs, hT, cT, gates = _fwd_call(zx, wx_rest, wh, b, mask, h0, c0,
                                      save_gates=True)
    return (ys[-1], hT, cT), (wx_rest, wh, mask, h0, c0, ys, cs, gates)


def _vjp_bwd(res, grads):
    wx_rest, wh, mask, h0, c0, ys, cs, gates = res
    dys_top, dhT, dcT = grads
    dzx, dh0, dc0, db_tiles = _bwd_call(gates, wx_rest, wh, mask, cs, c0,
                                        dys_top, dhT, dcT)
    # Bulk MXU contractions over (T, B) for the weight grads (same trade
    # as the single-layer kernel: cheaper than accumulating in the
    # sequential kernel, and the VMEM accumulators would cap H).
    # h_prev_l[t] = ys_l[t-1] with h_prev_l[0] = h0_l:
    dwh = jnp.einsum("ltbh,ltbg->lhg", ys[:, :-1], dzx[:, 1:],
                     preferred_element_type=jnp.float32)
    dwh = dwh + jnp.einsum("lbh,lbg->lhg", h0.astype(ys.dtype), dzx[:, 0],
                           preferred_element_type=jnp.float32)
    # input_{l}[t] = ys_{l-1}[t] for l >= 1 (a LAYER shift, not a time
    # shift), so dWx_l contracts layer l-1's outputs with layer l's dz:
    if wx_rest.shape[0] and ys.shape[0] > 1:
        dwx = jnp.einsum("ltbh,ltbg->lhg", ys[:-1], dzx[1:],
                         preferred_element_type=jnp.float32)
    else:
        dwx = jnp.zeros_like(wx_rest, shape=wx_rest.shape)
    db = jnp.sum(db_tiles, axis=(0, 2))
    return (dzx[0], dwx.astype(wx_rest.dtype), dwh.astype(wh.dtype), db,
            jnp.zeros_like(mask), dh0, dc0)


lstm_stack_pallas.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# models/lstm.py adapter: whole-stack forward
# ---------------------------------------------------------------------------

def lstm_stack_fused(params, x, mask, state, compute_dtype, zx0=None):
    """Run the WHOLE layer stack in one fused kernel pair.

    Same contract as looping models.lstm._layer_scan over layers: returns
    (top-layer ys [B,T,H], [(h,c)] per layer).  Caller guarantees
    hidden % 128 == 0, >= 2 layers, uniform H, and the VMEM weight
    budget (models/lstm.py:lstm_forward).  zx0: optional precomputed
    layer-0 input projection (x may then be None)."""
    b_, t_, _ = (zx0 if x is None else x).shape
    hidden = params[0]["wh"].shape[0]
    cdt = compute_dtype
    stream_dt = jnp.bfloat16 if cdt == jnp.bfloat16 else jnp.float32
    zx = zx0 if zx0 is not None else jnp.dot(
        x.astype(cdt), params[0]["wx"].astype(cdt),
        preferred_element_type=jnp.float32)
    zx_t = jnp.swapaxes(zx, 0, 1).astype(stream_dt)          # [T,B,4H]
    if mask is None:
        mask_t = jnp.ones((t_, b_, 1), jnp.float32)
    else:
        mask_t = jnp.swapaxes(mask, 0, 1)[..., None].astype(jnp.float32)
    wx_rest = jnp.stack([p["wx"] for p in params[1:]]).astype(cdt) \
        if len(params) > 1 else jnp.zeros((1, hidden, 4 * hidden), cdt)
    wh = jnp.stack([p["wh"] for p in params]).astype(cdt)
    b = jnp.stack([p["b"] for p in params])
    h0 = jnp.stack([h for h, _ in state]).astype(jnp.float32)
    c0 = jnp.stack([c for _, c in state]).astype(jnp.float32)
    ys_top, hT, cT = lstm_stack_pallas(zx_t, wx_rest, wh, b, mask_t, h0, c0)
    ys = jnp.swapaxes(ys_top, 0, 1).astype(jnp.float32)
    return ys, [(hT[i], cT[i]) for i in range(len(params))]


def stack_fused_supported(params, compute_dtype, batch_rows: int = 0,
                          eval_mode: bool = False) -> bool:
    """Static eligibility check for the fused multi-layer path.

    Besides the shape/VMEM-weight constraints, when `batch_rows` is given
    the fused path must sustain the SAME batch tile as the per-layer
    kernel in BOTH passes: the fused win is halved sequential grid steps,
    and a VMEM-forced tile split (e.g. H=512 L=2 bf16: 80 vs 160 rows)
    restores the old step count at worse MXU row utilization — measured
    net-slower on-chip (scripts/tpu_checks.py stack_bench, 2026-08-16).
    With eval_mode (caller will not differentiate) only the forward-only
    footprint counts — no gates stream — which admits H=512/L=2."""
    if len(params) < 2:
        return False
    hidden = params[0]["wh"].shape[0]
    if hidden % 128:
        return False
    for p in params[1:]:
        if p["wx"].shape[0] != hidden or p["wh"].shape[0] != hidden:
            return False
    itemsize = 2 if compute_dtype == jnp.bfloat16 else 4
    n = len(params)
    weight_bytes = (2 * n - 1) * hidden * 4 * hidden * itemsize
    if weight_bytes > 8 * 2 ** 20:
        return False
    if batch_rows:
        from fewshot.ops.lstm_pallas import _batch_tile
        per_layer = _batch_tile(batch_rows, hidden, itemsize)
        if eval_mode:
            fw = _stream_widths(n, False)[0]
            return (_fused_batch_tile(batch_rows, hidden, n, itemsize, fw)
                    >= per_layer)
        fw, bw = _stream_widths(n, True)
        if (_fused_batch_tile(batch_rows, hidden, n, itemsize, fw)
                < per_layer
                or _fused_batch_tile(batch_rows, hidden, n, itemsize, bw)
                < per_layer):
            return False
    return True
