"""Fused Pallas LSTM recurrence (forward + custom-VJP backward).

The hot op of the framework (BASELINE.json:5 "fused Pallas scan cell").
Factoring (SURVEY.md §8 hard-part #3): the input projection x @ Wx for ALL
timesteps is one large MXU matmul done OUTSIDE the kernel by XLA (it also
carries the dWx/dx gradients for free); only the inherently sequential part
— per-step h @ Wh + gate nonlinearities + masked state update — lives in the
kernel.

Kernel structure: grid = (batch_tiles, T).  TPU grids run sequentially with
the LAST dimension innermost, so for each batch tile the T steps run in
order while (h, c) live in VMEM scratch that persists across grid steps; Wh
stays VMEM-resident (constant BlockSpec index) and the per-step zx/mask/ys
blocks stream HBM<->VMEM via the automatic double-buffered pipeline.  Batch
tiling keeps per-block VMEM use bounded (a [T,B,4H] residency blew the 16MB
VMEM budget at meta-batch scale), while the recurrence still issues exactly
one [Bt,H]x[H,4H] MXU matmul per step and never touches HBM for state.

Backward: recompute-gates BPTT as a second Pallas kernel running time in
reverse (index_map t -> T-1-p).  Residuals are the forward's (h, c)
sequences; gate activations are recomputed from them (one extra matmul per
step) instead of being materialized — the flash-attention trade.  dWh/db are
NOT accumulated in-kernel: they fall out of one bulk MXU contraction over
the saved dzx afterwards, shedding a per-step matmul and the 4MB
accumulator residency (which is what caps the supported hidden size).

Constraint: hidden_dim % 128 == 0 (lane-aligned gate slicing).  The scan
cell (models/lstm.py) is the fallback for other shapes.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FORGET_BIAS = 1.0

# CPU-debug escape hatch: FEWSHOT_PALLAS_INTERPRET=1 runs both kernels in
# Pallas interpret mode (pure XLA, any backend) — used by the off-TPU parity
# test; on-chip parity lives in scripts/tpu_checks.py.
_INTERPRET = bool(os.environ.get("FEWSHOT_PALLAS_INTERPRET"))

# Experiment knob (ROADMAP r4 #4): FEWSHOT_LSTM_GATES_INT8=1 stores the
# saved gate activations int8 instead of bf16.  The BPTT backward streams
# gates(4H)+cs(2H)+dys(H)+dzx(4H) per row-step and sits near the HBM
# bandwidth floor at the flagship shape (benchmarks/step_profile.json), so
# halving the gate stream trims ~18% of its bytes.  Gates are affine-coded
# to [-1, 1] (sigmoids s -> 2s-1, tanh j as-is) at q = round(g*127):
# dequant error <= 1/254 absolute per gate, a ~0.4% multiplicative noise
# on the backward deltas — acceptable for Adam but convergence-gated
# (benchmarks/gates_int8.json records parity + convergence + throughput).
_GATES_INT8 = bool(os.environ.get("FEWSHOT_LSTM_GATES_INT8"))


def _batch_tile(b: int, hidden: int = 0, itemsize: int = 4) -> int:
    """Largest divisor of b (<= 256) whose per-tile VMEM footprint fits.

    Bigger tiles fill MXU sublanes better AND halve grid/DMA count (B=160
    as one [160, H] tile beats two 80-row tiles that each waste 48 of the
    128 sublanes).  Footprint per tile: the double-buffered per-step
    streams (zx + gates + ys + cs ~= 10H values/row at the stream dtype)
    plus f32 state scratch/carries; Wh's residency is charged separately
    by lstm_layer_pallas's budget check."""
    budget = 8 * 2 ** 20
    for cand in range(min(b, 256), 0, -1):
        if b % cand and cand != b:
            continue
        if cand % 8 and cand != b:
            continue
        if hidden and cand * hidden * (10 * 2 * itemsize + 6 * 4) > budget:
            continue
        return cand
    return b


def _cell_math(z, c, hidden):
    i = z[:, :hidden]
    j = z[:, hidden:2 * hidden]
    f = z[:, 2 * hidden:3 * hidden]
    o = z[:, 3 * hidden:]
    new_c = jax.nn.sigmoid(f + FORGET_BIAS) * c + \
        jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
    return new_h, new_c


def _tiles(b: int, t: int, hidden: int, itemsize: int,
           streams_h: int = 10) -> tuple[int, int]:
    """(batch_tile, time_chunk): one program handles a [u, bt, ...] brick.

    Per-program overhead (Mosaic loop bookkeeping + DMA orchestration) is
    a real cost at song-scale T, so after maximizing the batch tile (MXU
    rows come first) the picker widens the TIME axis: u consecutive steps
    per program, largest divisor of T in 1..8 (u | T keeps every block
    exact — no padding, no masked tails; song-scale T is 95/96/104/192/
    255/256 in practice, all with a divisor in 4..8).  The u-scaled
    double-buffered streams (`streams_h` H-widths per row-step), the f32
    scratch/temporaries and the resident Wh share Mosaic's ~16MB scoped
    VMEM.  FEWSHOT_LSTM_TILES="bt,u" overrides for experiments."""
    override = os.environ.get("FEWSHOT_LSTM_TILES")
    if override:
        bt, u = (int(x) for x in override.split(","))
        return bt, u
    budget = 15 * 2 ** 20 - 4 * hidden * hidden * itemsize      # minus Wh
    bt = _batch_tile(b, hidden, itemsize)

    def fits(u):
        per_row = hidden * (streams_h * 2 * itemsize * u + 6 * 4 + 8 * 4)
        return bt * per_row <= budget
    u = 1
    for cand in range(min(8, t), 0, -1):
        if t % cand == 0 and fits(cand):
            u = cand
            break
    return bt, u


def _fwd_kernel(zx_ref, wh_ref, b_ref, mask_ref, h0_ref, c0_ref,
                ys_ref, cs_ref, hT_ref, cT_ref, h_sc, c_sc,
                gates_ref=None):
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    u = zx_ref.shape[0]

    @pl.when(t == 0)
    def _():
        h_sc[:] = h0_ref[:]
        c_sc[:] = c0_ref[:]

    h, c = h_sc[:], c_sc[:]
    hidden = h.shape[-1]
    for i in range(u):
        # streams may be bf16 (see _fwd_call); state/gate math stay f32
        z = zx_ref[i].astype(jnp.float32) + \
            jnp.dot(h.astype(wh_ref.dtype), wh_ref[:],
                    preferred_element_type=jnp.float32) + b_ref[:]
        si = jax.nn.sigmoid(z[:, :hidden])
        tj = jnp.tanh(z[:, hidden:2 * hidden])
        sf = jax.nn.sigmoid(z[:, 2 * hidden:3 * hidden] + FORGET_BIAS)
        so = jax.nn.sigmoid(z[:, 3 * hidden:])
        new_c = sf * c + si * tj
        new_h = so * jnp.tanh(new_c)
        if gates_ref is not None:
            # train mode: save gate ACTIVATIONS so the backward kernel
            # skips the z-recompute matmul (its serial MXU work halves)
            if gates_ref.dtype == jnp.int8:
                # affine-code every gate to [-1, 1] (sigmoids s -> 2s-1;
                # tanh j is already there), q = round(g * 127)
                coded = jnp.concatenate(
                    [2.0 * si - 1.0, tj, 2.0 * sf - 1.0, 2.0 * so - 1.0],
                    axis=-1)
                gates_ref[i] = jnp.round(coded * 127.0).astype(jnp.int8)
            else:
                gates_ref[i] = jnp.concatenate(
                    [si, tj, sf, so], axis=-1).astype(gates_ref.dtype)
        m = mask_ref[i]
        h = jnp.where(m > 0, new_h, h)
        c = jnp.where(m > 0, new_c, c)
        ys_ref[i] = h.astype(ys_ref.dtype)
        cs_ref[i] = c.astype(cs_ref.dtype)
    h_sc[:] = h
    c_sc[:] = c

    @pl.when(t == n_t - 1)
    def _():
        hT_ref[:] = h
        cT_ref[:] = c


def _fwd_call(zx, wh, b, mask, h0, c0, save_gates: bool = False):
    t_, b_, four_h = zx.shape
    hidden = four_h // 4
    f32 = jnp.float32
    st = zx.dtype                 # stream dtype: bf16 halves HBM traffic
    bt, u = _tiles(b_, t_, hidden, jnp.dtype(st).itemsize)
    kw = dict(memory_space=pltpu.VMEM)
    step3 = lambda bi, t: (t, bi, 0)     # noqa: E731
    tile2 = lambda bi, t: (bi, 0)        # noqa: E731
    const2 = lambda bi, t: (0, 0)        # noqa: E731
    out_specs = [
        pl.BlockSpec((u, bt, hidden), step3, **kw),    # ys
        pl.BlockSpec((u, bt, hidden), step3, **kw),    # cs
        pl.BlockSpec((bt, hidden), tile2, **kw),       # hT
        pl.BlockSpec((bt, hidden), tile2, **kw),       # cT
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t_, b_, hidden), st),
        jax.ShapeDtypeStruct((t_, b_, hidden), st),
        jax.ShapeDtypeStruct((b_, hidden), f32),
        jax.ShapeDtypeStruct((b_, hidden), f32),
    ]
    kernel = _fwd_kernel
    if save_gates:
        # int8 experiment: Mosaic's int8 layout wants >=32 sublanes per
        # tile; bt is a multiple of 8 by construction, so gate the coded
        # path on the stricter alignment and fall back to the stream dtype
        gt = (jnp.int8 if _GATES_INT8 and bt % 32 == 0 else st)
        out_specs.append(pl.BlockSpec((u, bt, four_h), step3, **kw))
        out_shape.append(jax.ShapeDtypeStruct((t_, b_, four_h), gt))

        def kernel(zx_ref, wh_ref, b_ref, mask_ref, h0_ref, c0_ref,  # noqa
                   ys_ref, cs_ref, hT_ref, cT_ref, gates_ref,
                   h_sc, c_sc):
            _fwd_kernel(zx_ref, wh_ref, b_ref, mask_ref, h0_ref, c0_ref,
                        ys_ref, cs_ref, hT_ref, cT_ref, h_sc, c_sc,
                        gates_ref=gates_ref)
    out = pl.pallas_call(
        kernel,
        grid=(b_ // bt, t_ // u),
        in_specs=[
            pl.BlockSpec((u, bt, four_h), step3, **kw),    # zx
            pl.BlockSpec((hidden, four_h), const2, **kw),  # wh
            pl.BlockSpec((1, four_h), const2, **kw),       # b
            pl.BlockSpec((u, bt, 1), step3, **kw),         # mask
            pl.BlockSpec((bt, hidden), tile2, **kw),       # h0
            pl.BlockSpec((bt, hidden), tile2, **kw),       # c0
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bt, hidden), f32),
            pltpu.VMEM((bt, hidden), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t_ * b_ * hidden * four_h,
            bytes_accessed=4 * (t_ * b_ * (four_h + 2 * hidden)
                                + hidden * four_h),
            transcendentals=4 * t_ * b_ * hidden,
        ),
        interpret=_INTERPRET,
    )(zx, wh, b[None], mask, h0, c0)
    return out  # ys, cs, hT, cT[, gates]


def _bwd_kernel(gates_ref, wh_ref, mask_ref, cprev_ref, cs_ref,
                c0_ref, dys_ref, dhT_ref, dcT_ref,
                dzx_ref, dh0_ref, dc0_ref, db_ref,
                dh_sc, dc_sc):
    """Reverse-time brick: program (bi, p) handles time chunk C-1-p for
    tile bi, stepping its u timesteps in reverse in-register.

    The kernel produces dzx, the initial-state grads, and a per-tile db
    (the [1, 4H] row-sum accumulates in a VMEM-resident output block —
    XLA's standalone sum over dzx re-read the whole [T, B, 4H] tensor
    from HBM); dWh still falls out of one bulk MXU contraction over the
    saved dzx afterwards (_vjp_bwd), shedding a per-step matmul and the
    4MB accumulator residency that capped the supported hidden size.

    Gate ACTIVATIONS arrive saved from the forward (gates_ref), so the
    only matmul in the serial loop is dz @ Wh^T — the z-recompute matmul
    the round-1 kernel paid per step is gone.  c_prev within a chunk is
    cs[i-1] already in VMEM; across chunks it streams the PREVIOUS chunk
    through a shifted index_map (clamped at 0; the global t=0 step
    selects c0 instead), and tanh(new_c) is rebuilt from cs[t] — valid
    because masked steps force dz to 0 anyway."""
    p = pl.program_id(1)
    n_p = pl.num_programs(1)
    hidden = dh_sc.shape[-1]
    u = gates_ref.shape[0]

    @pl.when(p == 0)
    def _():
        dh_sc[:] = dhT_ref[:]
        dc_sc[:] = dcT_ref[:]
        db_ref[:] = jnp.zeros_like(db_ref)

    first_chunk = p == n_p - 1   # reverse grid: last program = chunk 0
    dh_c = dh_sc[:]
    dc_c = dc_sc[:]
    db_acc = None
    for i in reversed(range(u)):
        if i > 0:
            c_prev = cs_ref[i - 1].astype(jnp.float32)
        else:
            c_prev = jnp.where(first_chunk, c0_ref[:],
                               cprev_ref[u - 1].astype(jnp.float32))

        g = gates_ref[i].astype(jnp.float32)
        if gates_ref.dtype == jnp.int8:
            # dequant the affine [-1, 1] code (see _fwd_kernel)
            g = g * (1.0 / 127.0)
            si = (g[:, :hidden] + 1.0) * 0.5
            tj = g[:, hidden:2 * hidden]
            sf = (g[:, 2 * hidden:3 * hidden] + 1.0) * 0.5
            so = (g[:, 3 * hidden:] + 1.0) * 0.5
        else:
            si = g[:, :hidden]
            tj = g[:, hidden:2 * hidden]
            sf = g[:, 2 * hidden:3 * hidden]
            so = g[:, 3 * hidden:]
        tc = jnp.tanh(cs_ref[i].astype(jnp.float32))

        dh = dys_ref[i].astype(jnp.float32) + dh_c
        dc = dc_c
        mf = (mask_ref[i] > 0).astype(jnp.float32)
        d_new_h = mf * dh
        d_new_c = d_new_h * so * (1.0 - tc * tc) + mf * dc

        di = d_new_c * tj * si * (1.0 - si)
        dj = d_new_c * si * (1.0 - tj * tj)
        df = d_new_c * c_prev * sf * (1.0 - sf)
        do = d_new_h * tc * so * (1.0 - so)
        dz = jnp.concatenate([di, dj, df, do], axis=-1)   # [Bt, 4H]

        dzx_ref[i] = dz.astype(dzx_ref.dtype)
        db_acc = dz if db_acc is None else db_acc + dz

        dh_c = jax.lax.dot_general(
            dz.astype(wh_ref.dtype), wh_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + (1.0 - mf) * dh
        dc_c = d_new_c * sf + (1.0 - mf) * dc
    dh_sc[:] = dh_c
    dc_sc[:] = dc_c
    # db partial sums: keep 8 sublane rows live (min f32 tile); rows are
    # summed outside.  bt % 8 == 0 in practice (_batch_tile prefers it).
    bt, four_h = db_acc.shape
    if bt % 8 == 0:
        db_ref[0] = db_ref[0] + jnp.sum(
            db_acc.reshape(bt // 8, 8, four_h), axis=0)
    else:
        db_ref[0, 0:1] = db_ref[0, 0:1] + jnp.sum(db_acc, axis=0,
                                                  keepdims=True)

    @pl.when(p == n_p - 1)
    def _():
        dh0_ref[:] = dh_c
        dc0_ref[:] = dc_c


def _bwd_call(gates, wh, mask, cs, c0, dys, dhT, dcT):
    t_, b_, four_h = gates.shape
    hidden = four_h // 4
    f32 = jnp.float32
    st = dys.dtype                # NOT gates.dtype: gates may be int8
    bt, u = _tiles(b_, t_, hidden, jnp.dtype(st).itemsize)
    n_c = t_ // u
    kw = dict(memory_space=pltpu.VMEM)
    rev3 = lambda bi, p: (n_c - 1 - p, bi, 0)   # noqa: E731
    # cross-chunk c_prev: the PREVIOUS time chunk, clamped at 0 (the
    # chunk-0 program ignores it for its i=0 step and reads c0 instead)
    revm1 = lambda bi, p: (jnp.maximum(n_c - 2 - p, 0), bi, 0)  # noqa: E731
    tile2 = lambda bi, p: (bi, 0)              # noqa: E731
    const2 = lambda bi, p: (0, 0)              # noqa: E731
    out = pl.pallas_call(
        _bwd_kernel,
        grid=(b_ // bt, n_c),
        in_specs=[
            pl.BlockSpec((u, bt, four_h), rev3, **kw),     # gates
            pl.BlockSpec((hidden, four_h), const2, **kw),  # wh
            pl.BlockSpec((u, bt, 1), rev3, **kw),          # mask
            pl.BlockSpec((u, bt, hidden), revm1, **kw),    # cs -> prev chunk
            pl.BlockSpec((u, bt, hidden), rev3, **kw),     # cs -> this chunk
            pl.BlockSpec((bt, hidden), tile2, **kw),       # c0
            pl.BlockSpec((u, bt, hidden), rev3, **kw),     # dys
            pl.BlockSpec((bt, hidden), tile2, **kw),       # dhT
            pl.BlockSpec((bt, hidden), tile2, **kw),       # dcT
        ],
        out_specs=[
            pl.BlockSpec((u, bt, four_h), rev3, **kw),     # dzx
            pl.BlockSpec((bt, hidden), tile2, **kw),       # dh0
            pl.BlockSpec((bt, hidden), tile2, **kw),       # dc0
            pl.BlockSpec((1, 8, four_h), lambda bi, p: (bi, 0, 0),
                         **kw),                            # db (per tile)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_, b_, four_h), st),
            jax.ShapeDtypeStruct((b_, hidden), f32),
            jax.ShapeDtypeStruct((b_, hidden), f32),
            jax.ShapeDtypeStruct((b_ // bt, 8, four_h), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, hidden), f32),
            pltpu.VMEM((bt, hidden), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t_ * b_ * hidden * four_h,
            bytes_accessed=4 * t_ * b_ * (2 * four_h + 4 * hidden),
            transcendentals=t_ * b_ * hidden,
        ),
        interpret=_INTERPRET,
    )(gates, wh, mask, cs, cs, c0, dys, dhT, dcT)
    return out  # dzx, dh0, dc0, db_tiles


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------

@jax.custom_vjp
def lstm_scan_pallas(zx, wh, b, mask, h0, c0):
    """Fused recurrence.  zx [T,B,4H] fp32, mask [T,B,1] fp32 (1=real step).

    Returns (ys [T,B,H], hT [B,H], cT [B,H])."""
    ys, _cs, hT, cT = _fwd_call(zx, wh, b, mask, h0, c0)
    return ys, hT, cT


def _vjp_fwd(zx, wh, b, mask, h0, c0):
    ys, cs, hT, cT, gates = _fwd_call(zx, wh, b, mask, h0, c0,
                                      save_gates=True)
    return (ys, hT, cT), (wh, mask, h0, c0, ys, cs, gates)


def _vjp_bwd(res, grads):
    wh, mask, h0, c0, ys, cs, gates = res
    dys, dhT, dcT = grads
    dzx, dh0, dc0, db_tiles = _bwd_call(gates, wh, mask, cs, c0, dys, dhT,
                                        dcT)
    # Weight grads as ONE bulk MXU contraction over (T, B) — cheaper than
    # accumulating inside the sequential kernel and frees 4MB of VMEM.
    # h_prev[t] = ys[t-1] with h_prev[0] = h0; ys[:-1] / dzx[1:] are
    # contiguous prefix/suffix views, so no copies are materialized.
    # db accumulated in-kernel (one [1, 4H] VMEM row per batch tile) —
    # a standalone XLA sum would re-read the whole dzx from HBM.
    dwh = jnp.einsum("tbh,tbg->hg", ys[:-1], dzx[1:],
                     preferred_element_type=jnp.float32)
    dwh = dwh + jnp.einsum("bh,bg->hg", h0.astype(ys.dtype), dzx[0],
                           preferred_element_type=jnp.float32)
    db = jnp.sum(db_tiles, axis=(0, 1))
    return (dzx, dwh.astype(wh.dtype), db, jnp.zeros_like(mask),
            dh0, dc0)


lstm_scan_pallas.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# models/lstm.py layer adapter
# ---------------------------------------------------------------------------

def lstm_layer_pallas(layer, x, mask, h0c0, compute_dtype, zx=None):
    """Drop-in replacement for models.lstm._layer_scan (same signature).

    zx: optional precomputed input projection [B, T, 4H] (the embedding-
    folded fast path, models/lm.py); x is ignored when given."""
    b_, t_, _ = (zx if zx is not None else x).shape
    hidden = layer["wh"].shape[0]
    if hidden % 128:
        raise ValueError(
            f"cell='pallas' requires hidden_dim % 128 == 0, got {hidden}")
    # Wh must stay VMEM-resident across the scan (4*H*H elements at the
    # compute dtype).  Past the budget, fall back to the lax.scan cell
    # (XLA spills gracefully).  bf16 compute doubles the supported H.
    itemsize = 2 if compute_dtype == jnp.bfloat16 else 4
    if hidden * 4 * hidden * itemsize > 11 * 2 ** 20:
        import warnings
        warnings.warn(
            f"cell='pallas' VMEM budget exceeded at hidden_dim={hidden}; "
            f"falling back to the lax.scan cell for this layer",
            stacklevel=2)
        from fewshot.models.lstm import _layer_scan
        return _layer_scan(layer, x, mask, h0c0, compute_dtype, zx=zx)
    stream_dt = (jnp.bfloat16 if compute_dtype == jnp.bfloat16
                 else jnp.float32)
    if zx is None:
        zx = jnp.dot(x.astype(compute_dtype),
                     layer["wx"].astype(compute_dtype),
                     preferred_element_type=jnp.float32)   # [B, T, 4H]
    zx_t = jnp.swapaxes(zx, 0, 1).astype(stream_dt)        # [T, B, 4H]
    if mask is None:
        mask_t = jnp.ones((t_, b_, 1), jnp.float32)
    else:
        mask_t = jnp.swapaxes(mask, 0, 1)[..., None].astype(jnp.float32)
    h0, c0 = h0c0
    wh = layer["wh"].astype(compute_dtype)
    ys, hT, cT = lstm_scan_pallas(zx_t, wh, layer["b"], mask_t,
                                  h0.astype(jnp.float32),
                                  c0.astype(jnp.float32))
    return jnp.swapaxes(ys, 0, 1).astype(jnp.float32), (hT, cT)
