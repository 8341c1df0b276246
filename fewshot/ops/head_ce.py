"""Fused head+CE Pallas kernel: per-row (logsumexp, target-logit) without
materializing the [rows, V] logits in HBM.

Why (benchmarks/step_profile_v5000.json): at vocab scale the LM head's
logits stop fitting the "XLA fuses it" story — the train step writes
[B*Q*(T-1), V] = [15200, 5000] logits (fp32, ~300MB) to HBM, the CE
log-softmax makes 2-3 more full passes, and the backward materializes
softmax AND dlogits again.  The CE itself only needs TWO scalars per row:
lse = logsumexp(logits_r) and the logit at the target token.  This kernel
computes exactly those, streaming row tiles while the whole [D, V] weight
stays VMEM-resident (D = the head's inner dim — E for the tied two-matmul
head, H untied; a few MB in bf16), so the logits exist only as a VMEM tile.

Backward is the flash-attention trade: recompute the logits tile, form
p = exp(logits + b - lse), dlogits = dlse*p + dtgt*onehot(target) in VMEM,
and contract in-kernel into dh2 (per row tile) plus accumulated dW/db
(VMEM-resident f32 accumulators living in the revisited output blocks).
Nothing [rows, V]-shaped ever touches HBM in either direction.

Both the plain CE (ce = lse - tgt) and the cache-head mixture
(lm_t = tgt - lse; models/lm.py cache_token_nll) consume the pair, so one
kernel serves both training paths.  Sampling still needs full logits
(models/lm.py head_logits) and is untouched.

Two VMEM plans, picked per shape by _plan:
- resident (V up to ~10k at D=256 bf16): the whole [D, Vp] weight (plus
  its f32 grad accumulator in train) stays VMEM-resident; one logits
  recompute in backward.
- vocab-tiled (V>>5000, r4): the weight streams through VMEM in [D, vt]
  tiles; the forward merges per-tile (max, sumexp, target-logit) online
  softmax-style in scratch, and the backward runs two transposed-grid
  sweeps (dh2 with vtiles inner, dw/db with row tiles inner) so every
  accumulator lives in VMEM across its inner dim.  Two logits recomputes
  instead of one, but still nothing [rows, V]-shaped in HBM — the dense
  fallback at V=20000 would write ~1.2GB of f32 logits per direction.

Reference note: the reference scores CE via dense softmax on CPU
(SURVEY.md §4.5); this kernel is the TPU-native formulation of the same
masked query-NLL, not a behavioral change — parity with the explicit
logits path is pinned by tests/test_head_ce.py to float tolerance.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# CPU-debug escape hatch, same contract as lstm_pallas/_INTERPRET.
_INTERPRET = bool(os.environ.get("FEWSHOT_PALLAS_INTERPRET"))
# Test hooks: force the vocab-tiled plan even where the resident plan
# holds, and/or pin its vocab tile (so small-shape parity tests exercise
# the multi-tile online-softmax path).
_FORCE_TILED = bool(os.environ.get("FEWSHOT_HEAD_CE_FORCE_TILED"))
_VT_OVERRIDE = int(os.environ.get("FEWSHOT_HEAD_CE_VT", "0"))

_NEG = -1e30          # pad-column bias: excluded from lse by construction
_VMEM_BUDGET = 14 * 2 ** 20


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _row_tile(rp: int, d: int, vp: int, itemsize: int, train: bool) -> int:
    """Largest row tile (<=512, multiple of 8, divides rp) fitting VMEM.

    Resident: w [D,Vp] (+ in train: the dw/db f32 accumulator blocks);
    per-tile: the f32 logits tile, with p/dlogits temporaries in train
    charged as two more V-wide rows, plus the small h2/dh2 tiles."""
    resident = d * vp * itemsize + (d * vp * 4 + vp * 4 if train else 0)
    budget = _VMEM_BUDGET - resident
    if budget <= 0:
        return 0
    per_row = vp * 4 * (3 if train else 1) + d * 2 * itemsize
    for cand in range(min(rp, 512), 7, -8):
        if rp % cand == 0 and cand * per_row <= budget:
            return cand
    return 0


def _tiled_tiles(d: int, itemsize: int) -> tuple[int, int]:
    """(row_tile, vocab_tile) for the vocab-tiled plan, or (0, 0).

    Row tile first (descending): every extra row in the tile amortizes a
    full stream of the [D, V] weight through VMEM, so rt is the lever
    that sets HBM traffic; vt then takes what budget remains (it only
    sets grid overhead).  The estimate is the worst of the three tiled
    kernels: double-buffered w/h2 tiles, the f32 logits tile plus its
    train-mode p/dlogits temporaries, the dh2 f32 row accumulator
    (j-inner kernel) or the resident f32 dw/db blocks (i-inner kernel)."""
    vts = [_VT_OVERRIDE] if _VT_OVERRIDE else [2048, 1024, 512, 256, 128]
    for rt in (512, 256, 128, 64, 32, 16, 8):
        for vt in vts:
            shared = 2 * d * vt * itemsize + 2 * rt * d * itemsize
            est = max(
                shared + 2 * rt * vt * 4,                          # fwd
                shared + 3 * rt * vt * 4 + rt * d * 4,             # dh2
                shared + 3 * rt * vt * 4 + d * vt * 4 + vt * 4,    # dw/db
            )
            if est <= _VMEM_BUDGET:
                return rt, vt
    return 0, 0


def _plan(r: int, d: int, v: int, itemsize: int,
          train: bool) -> tuple[str, int, int, int] | None:
    """(mode, row_tile, v_padded, vocab_tile) or None.

    Prefers the weight-resident plan (one logits recompute in backward,
    w read once); falls back to the vocab-tiled plan when [D, Vp] (plus
    its f32 grad accumulator in train) no longer fits VMEM — the V>>5000
    regime where the dense path would round-trip [rows, V] logits
    through HBM several times per step."""
    vp = _round_up(v, 128)
    if not _FORCE_TILED:
        rt = _row_tile(_round_up(r, 8), d, vp, itemsize, train=train)
        if rt >= 8:
            return ("resident", rt, vp, vp)
    rt, vt = _tiled_tiles(d, itemsize)
    if rt >= 8:
        return ("tiled", rt, _round_up(v, vt), vt)
    return None


def fused_head_nll_supported(d: int, v: int, dtype=jnp.bfloat16) -> bool:
    """True when either kernel plan holds for train-mode tiles: the
    weight-resident plan ([D, Vp] + f32 grad accumulator + one row tile
    in VMEM) or the vocab-tiled fallback; D lane-aligned either way."""
    if d % 128:
        return False
    return _plan(512, d, v, jnp.dtype(dtype).itemsize, train=True) is not None


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(h2_ref, w_ref, b_ref, tgt_ref, lse_ref, tl_ref):
    logits = jnp.dot(h2_ref[:], w_ref[:],
                     preferred_element_type=jnp.float32) + b_ref[:]
    m = jnp.max(logits, axis=1, keepdims=True)
    lse = m[:, 0] + jnp.log(jnp.sum(jnp.exp(logits - m), axis=1))
    cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    tl = jnp.sum(jnp.where(cols == tgt_ref[:], logits, 0.0), axis=1)
    lse_ref[:] = lse[:, None]
    tl_ref[:] = tl[:, None]


def _bwd_kernel(h2_ref, w_ref, b_ref, tgt_ref, lse_ref, dlse_ref, dtl_ref,
                dh2_ref, dw_ref, db_ref):
    i = pl.program_id(0)
    dt = h2_ref.dtype
    logits = jnp.dot(h2_ref[:], w_ref[:],
                     preferred_element_type=jnp.float32) + b_ref[:]
    p = jnp.exp(logits - lse_ref[:])
    cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    hot = (cols == tgt_ref[:]).astype(jnp.float32)
    dlogits = dlse_ref[:] * p + dtl_ref[:] * hot
    dlg = dlogits.astype(dt)
    dh2_ref[:] = jax.lax.dot_general(
        dlg, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)

    # dw/db accumulate across the sequential row-tile grid in their
    # (constant-index, hence VMEM-resident) output blocks.
    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dw_ref[:] += jax.lax.dot_general(
        h2_ref[:], dlg, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(dlogits, axis=0, keepdims=True)


# ---------------------------------------------------------------------------
# vocab-tiled kernels (V>>5000: the [D, V] weight no longer fits VMEM)
#
# Forward: grid (rows, vtiles), vtile innermost; per-row running
# (max, sumexp, target-logit) live in VMEM scratch with rows on the
# LANES ([1, rt] — a [rt, 1] layout would pad to 128 lanes), merged
# online-softmax style exactly like ops/prefix_attention.py's KV sweep.
# Backward splits into two kernels so each accumulator sits in a block
# whose index is constant along ITS inner grid dim: dh2 accumulates in
# f32 scratch across vtiles (j inner), dw/db accumulate in their
# resident output blocks across row tiles (i inner, grid transposed).
# Each recomputes the logits tile — two recomputes total vs the
# resident plan's one, the flash trade again.
# ---------------------------------------------------------------------------

def _fwd_kernel_tiled(h2_ref, w_ref, b_ref, tgt_ref, lse_ref, tl_ref,
                      m_sc, s_sc, t_sc):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    vt = w_ref.shape[1]

    @pl.when(j == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, _NEG)
        s_sc[:] = jnp.zeros_like(s_sc)
        t_sc[:] = jnp.zeros_like(t_sc)

    logits = jnp.dot(h2_ref[:], w_ref[:],
                     preferred_element_type=jnp.float32) + b_ref[:]
    cols = j * vt + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    m_prev = m_sc[0]                                   # [rt]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1))
    s_sc[0] = (s_sc[0] * jnp.exp(m_prev - m_new)
               + jnp.sum(jnp.exp(logits - m_new[:, None]), axis=1))
    m_sc[0] = m_new
    t_sc[0] += jnp.sum(jnp.where(cols == tgt_ref[:], logits, 0.0), axis=1)

    @pl.when(j == nj - 1)
    def _():
        lse_ref[:] = (m_sc[0] + jnp.log(s_sc[0]))[:, None]
        tl_ref[:] = t_sc[0][:, None]


def _bwd_dh2_kernel_tiled(h2_ref, w_ref, b_ref, tgt_ref, lse_ref, dlse_ref,
                          dtl_ref, dh2_ref, acc_sc):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    vt = w_ref.shape[1]
    dt = h2_ref.dtype

    @pl.when(j == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)

    logits = jnp.dot(h2_ref[:], w_ref[:],
                     preferred_element_type=jnp.float32) + b_ref[:]
    p = jnp.exp(logits - lse_ref[:])
    cols = j * vt + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    hot = (cols == tgt_ref[:]).astype(jnp.float32)
    dlg = (dlse_ref[:] * p + dtl_ref[:] * hot).astype(dt)
    acc_sc[:] += jax.lax.dot_general(
        dlg, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        dh2_ref[:] = acc_sc[:].astype(dt)


def _bwd_dwdb_kernel_tiled(h2_ref, w_ref, b_ref, tgt_ref, lse_ref, dlse_ref,
                           dtl_ref, dw_ref, db_ref):
    # grid (vtiles, rows) — rows INNERMOST, so the (0, j)-indexed dw/db
    # blocks stay VMEM-resident while every row tile accumulates into them
    j = pl.program_id(0)
    i = pl.program_id(1)
    vt = w_ref.shape[1]
    dt = h2_ref.dtype

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    logits = jnp.dot(h2_ref[:], w_ref[:],
                     preferred_element_type=jnp.float32) + b_ref[:]
    p = jnp.exp(logits - lse_ref[:])
    cols = j * vt + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    hot = (cols == tgt_ref[:]).astype(jnp.float32)
    dlogits = dlse_ref[:] * p + dtl_ref[:] * hot
    dw_ref[:] += jax.lax.dot_general(
        h2_ref[:], dlogits.astype(dt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(dlogits, axis=0, keepdims=True)


# ---------------------------------------------------------------------------
# padded pallas_call wrappers
# ---------------------------------------------------------------------------

def _pad_args(h2, w, b, targets, train):
    r, d = h2.shape
    v = w.shape[1]
    # fwd and bwd pick tiles independently (outputs are sliced back to r
    # either way): the forward has no dw/db accumulator residency, so its
    # resident-plan row tile can be ~5x larger — fewer grid steps, fuller
    # MXU rows.  Tiled-plan tiles are row-major the other way (see _plan).
    mode, rt, vp, vt = _plan(r, d, v, h2.dtype.itemsize, train)
    rp = _round_up(r, rt)
    if rp != r:
        h2 = jnp.pad(h2, ((0, rp - r), (0, 0)))
        targets = jnp.pad(targets, (0, rp - r))
    if vp != v:
        # zero weight + _NEG bias on pad columns: their logits are ~-1e30,
        # so they vanish from lse and can never be a target.
        w = jnp.pad(w, ((0, 0), (0, vp - v)))
        b = jnp.pad(b, (0, vp - v), constant_values=_NEG)
    return h2, w, b, targets, r, rt, rp, vp, mode, vt


def _fwd_call(h2, w, b, targets):
    h2, w, b, targets, r, rt, rp, vp, mode, vt = _pad_args(
        h2, w, b, targets, train=False)
    d = h2.shape[1]
    if mode == "resident":
        grid = (rp // rt,)
        kernel = _fwd_kernel
        in_specs = [
            pl.BlockSpec((rt, d), lambda i: (i, 0)),
            pl.BlockSpec((d, vp), lambda i: (0, 0)),
            pl.BlockSpec((1, vp), lambda i: (0, 0)),
            pl.BlockSpec((rt, 1), lambda i: (i, 0)),
        ]
        out_specs = [
            pl.BlockSpec((rt, 1), lambda i: (i, 0)),
            pl.BlockSpec((rt, 1), lambda i: (i, 0)),
        ]
        scratch = []
    else:
        grid = (rp // rt, vp // vt)
        kernel = _fwd_kernel_tiled
        in_specs = [
            pl.BlockSpec((rt, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, vt), lambda i, j: (0, j)),
            pl.BlockSpec((1, vt), lambda i, j: (0, j)),
            pl.BlockSpec((rt, 1), lambda i, j: (i, 0)),
        ]
        out_specs = [
            pl.BlockSpec((rt, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((rt, 1), lambda i, j: (i, 0)),
        ]
        from jax.experimental.pallas import tpu as pltpu
        scratch = [pltpu.VMEM((1, rt), jnp.float32)] * 3
    lse, tl = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((rp, 1), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=_INTERPRET,
    )(h2, w.astype(h2.dtype), b.astype(jnp.float32)[None, :],
      targets.astype(jnp.int32)[:, None])
    return lse[:r, 0], tl[:r, 0]


def _bwd_call(h2, w, b, targets, lse, dlse, dtl):
    h2p, wp, bp, tgts, r, rt, rp, vp, mode, vt = _pad_args(
        h2, w, b, targets, train=True)
    d = h2.shape[1]
    v = w.shape[1]
    if rp != r:
        pad = ((0, rp - r),)
        # lse pads to +1e30 so pad rows see p = exp(logits - 1e30) = 0
        # exactly (a 0 pad could overflow exp(b) to inf and then 0*inf=NaN
        # under the zero cotangents below)
        lse = jnp.pad(lse, pad, constant_values=-_NEG)
        # zero cotangents on pad rows: they contribute nothing to dw/db
        dlse = jnp.pad(dlse, pad)
        dtl = jnp.pad(dtl, pad)
    args = (h2p, wp.astype(h2.dtype), bp.astype(jnp.float32)[None, :],
            tgts.astype(jnp.int32)[:, None], lse[:, None], dlse[:, None],
            dtl[:, None])
    if mode == "resident":
        grid = (rp // rt,)
        dh2, dw, db = pl.pallas_call(
            _bwd_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((rt, d), lambda i: (i, 0)),
                pl.BlockSpec((d, vp), lambda i: (0, 0)),
                pl.BlockSpec((1, vp), lambda i: (0, 0)),
                pl.BlockSpec((rt, 1), lambda i: (i, 0)),
                pl.BlockSpec((rt, 1), lambda i: (i, 0)),
                pl.BlockSpec((rt, 1), lambda i: (i, 0)),
                pl.BlockSpec((rt, 1), lambda i: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((rt, d), lambda i: (i, 0)),
                pl.BlockSpec((d, vp), lambda i: (0, 0)),
                pl.BlockSpec((1, vp), lambda i: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((rp, d), h2.dtype),
                jax.ShapeDtypeStruct((d, vp), jnp.float32),
                jax.ShapeDtypeStruct((1, vp), jnp.float32),
            ],
            interpret=_INTERPRET,
        )(*args)
        return dh2[:r], dw[:, :v], db[0, :v]

    # vocab-tiled plan: two sweeps over the same recomputed logits tiles,
    # grids transposed so each accumulator's inner dim is sequential-local
    from jax.experimental.pallas import tpu as pltpu
    row_specs = [
        pl.BlockSpec((rt, d), lambda i, j: (i, 0)),
        pl.BlockSpec((d, vt), lambda i, j: (0, j)),
        pl.BlockSpec((1, vt), lambda i, j: (0, j)),
        pl.BlockSpec((rt, 1), lambda i, j: (i, 0)),
        pl.BlockSpec((rt, 1), lambda i, j: (i, 0)),
        pl.BlockSpec((rt, 1), lambda i, j: (i, 0)),
        pl.BlockSpec((rt, 1), lambda i, j: (i, 0)),
    ]
    dh2 = pl.pallas_call(
        _bwd_dh2_kernel_tiled,
        grid=(rp // rt, vp // vt),
        in_specs=row_specs,
        out_specs=pl.BlockSpec((rt, d), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rp, d), h2.dtype),
        scratch_shapes=[pltpu.VMEM((rt, d), jnp.float32)],
        interpret=_INTERPRET,
    )(*args)
    col_specs = [
        pl.BlockSpec((rt, d), lambda j, i: (i, 0)),
        pl.BlockSpec((d, vt), lambda j, i: (0, j)),
        pl.BlockSpec((1, vt), lambda j, i: (0, j)),
        pl.BlockSpec((rt, 1), lambda j, i: (i, 0)),
        pl.BlockSpec((rt, 1), lambda j, i: (i, 0)),
        pl.BlockSpec((rt, 1), lambda j, i: (i, 0)),
        pl.BlockSpec((rt, 1), lambda j, i: (i, 0)),
    ]
    dw, db = pl.pallas_call(
        _bwd_dwdb_kernel_tiled,
        grid=(vp // vt, rp // rt),
        in_specs=col_specs,
        out_specs=[
            pl.BlockSpec((d, vt), lambda j, i: (0, j)),
            pl.BlockSpec((1, vt), lambda j, i: (0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, vp), jnp.float32),
            jax.ShapeDtypeStruct((1, vp), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(*args)
    return dh2[:r], dw[:, :v], db[0, :v]


# ---------------------------------------------------------------------------
# custom-VJP surface
# ---------------------------------------------------------------------------

@jax.custom_vjp
def head_lse_tgt(h2: jax.Array, w: jax.Array, b: jax.Array,
                 targets: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(lse [R], target_logit [R]) of logits = h2 @ w + b, fused.

    h2 [R, D] (bf16/f32), w [D, V], b [V] f32, targets [R] int32 in
    [0, V).  CE per row is `lse - target_logit`; the cache mixture's LM
    branch is `target_logit - lse`."""
    return _fwd_call(h2, w, b, targets)


def _vjp_fwd(h2, w, b, targets):
    lse, tl = _fwd_call(h2, w, b, targets)
    return (lse, tl), (h2, w, b, targets, lse)


def _vjp_bwd(res, grads):
    h2, w, b, targets, lse = res
    dlse, dtl = grads
    dh2, dw, db = _bwd_call(h2, w, b, targets, lse, dlse, dtl)
    return (dh2, dw.astype(w.dtype), db.astype(b.dtype),
            np.zeros(targets.shape, dtype=jax.dtypes.float0))


head_lse_tgt.defvjp(_vjp_fwd, _vjp_bwd)
