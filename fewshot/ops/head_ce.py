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


def fused_head_nll_supported(d: int, v: int, dtype=jnp.bfloat16) -> bool:
    """True when the kernel's VMEM plan holds: the [D, Vp] weight plus its
    f32 grad accumulator plus one row tile must fit; D lane-aligned."""
    if d % 128:
        return False
    vp = _round_up(v, 128)
    itemsize = jnp.dtype(dtype).itemsize
    return _row_tile(512, d, vp, itemsize, train=True) >= 8


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
# padded pallas_call wrappers
# ---------------------------------------------------------------------------

def _pad_args(h2, w, b, targets, train):
    r, d = h2.shape
    v = w.shape[1]
    vp = _round_up(v, 128)
    # fwd and bwd pick tiles independently (outputs are sliced back to r
    # either way): the forward has no dw/db accumulator residency, so its
    # row tile can be ~5x larger — fewer grid steps, fuller MXU rows.
    rt = _row_tile(_round_up(r, 8), d, vp, h2.dtype.itemsize, train=train)
    rp = _round_up(r, rt)
    if rp != r:
        h2 = jnp.pad(h2, ((0, rp - r), (0, 0)))
        targets = jnp.pad(targets, (0, rp - r))
    if vp != v:
        # zero weight + _NEG bias on pad columns: their logits are ~-1e30,
        # so they vanish from lse and can never be a target.
        w = jnp.pad(w, ((0, 0), (0, vp - v)))
        b = jnp.pad(b, (0, vp - v), constant_values=_NEG)
    return h2, w, b, targets, r, rt, rp, vp


def _fwd_call(h2, w, b, targets):
    h2, w, b, targets, r, rt, rp, vp = _pad_args(h2, w, b, targets,
                                                 train=False)
    d = h2.shape[1]
    grid = (rp // rt,)
    lse, tl = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rt, d), lambda i: (i, 0)),
            pl.BlockSpec((d, vp), lambda i: (0, 0)),
            pl.BlockSpec((1, vp), lambda i: (0, 0)),
            pl.BlockSpec((rt, 1), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rt, 1), lambda i: (i, 0)),
            pl.BlockSpec((rt, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((rp, 1), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(h2, w.astype(h2.dtype), b.astype(jnp.float32)[None, :],
      targets.astype(jnp.int32)[:, None])
    return lse[:r, 0], tl[:r, 0]


def _bwd_call(h2, w, b, targets, lse, dlse, dtl):
    h2p, wp, bp, tgts, r, rt, rp, vp = _pad_args(h2, w, b, targets,
                                                 train=True)
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
    )(h2p, wp.astype(h2.dtype), bp.astype(jnp.float32)[None, :],
      tgts.astype(jnp.int32)[:, None], lse[:, None], dlse[:, None],
      dtl[:, None])
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
