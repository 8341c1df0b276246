"""Fused episodic prefix attention (Pallas, forward + custom-VJP backward).

The episodic transformer's hot pattern (BASELINE.json:10): each of the Q
query songs of an episode attends to the episode's support PREFIX (full,
key-masked) ++ ITSELF (causal, key-masked).  The XLA reference path
(models/transformer.py einsums) materializes [B, Q, h, Lq, P+Lq] fp32
scores+probs per layer — the transformer tier's HBM hog (VERDICT r1 #3);
at K=20, L=512 (P > 10k) it simply does not fit.

Kernel shape (v2 — head-folded, branch-merged):

  * **Heads ride the block, not the grid.**  Blocks are [1, nh, rows, hd]
    and all matmuls are nh-batched `dot_general`s — one grid step does a
    whole head group, so grid overhead and DMA count drop nh-fold vs the
    v1 kernels (ROADMAP r2 limitation #5) and each DMA is nh x larger.
  * **One online-softmax sweep over (prefix ++ self).**  The innermost
    grid dim walks the prefix KV blocks first, then the query song's own
    KV blocks (causal); `@pl.when(t < np)` selects the branch in-kernel.
    Clamped index maps park the inactive input on its last-fetched block
    (Pallas skips the re-DMA when the block index is unchanged), so the
    merge costs no extra bandwidth — and it DELETES the v1 lse-stitch
    combine pass, which round-tripped two fp32 partial outputs per layer
    per direction through HBM.
  * The prefix K/V blocks are indexed with bq // Q in the BlockSpec
    index_map — the episode's prefix is stored ONCE and shared by its Q
    query songs, never replicated in HBM.

Backward: the flash backward of each branch is fed the GLOBAL
(lse, delta=rowsum(dout*out)) — probabilities p = exp(s - lse) are already
globally normalized, so per-branch dq/dk/dv sum exactly.  dq uses the same
merged sweep; dk/dv runs once per branch (their output batch spaces differ:
prefix grads sum over the episode's Q songs, self grads do not).

Scores only ever exist as a [nh, rows, bkv] VMEM tile; running (m, l) ride
in scratch across the innermost KV grid dimension (TPU grids are
sequential, so output blocks with a constant index accumulate in VMEM and
flush once).  All matmul operands are cast to the streams' dtype (bf16
under compute_dtype=bfloat16) with fp32 MXU accumulation; softmax math is
fp32.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
_INTERPRET = bool(os.environ.get("FEWSHOT_PALLAS_INTERPRET"))


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _block(n: int, cap: int = 512) -> int:
    """Largest 128-multiple block <= cap that divides n (n is a 128-mult)."""
    for d in range(cap, 127, -128):
        if n % d == 0:
            return d
    return 128


_VMEM_BUDGET = 14 * 2 ** 20


def _fit_blocks(lp: int, kp: int, nh: int, hd: int, sb: int,
                nq_st: int, nq_f32: int, nkv_st: int, nkv_f32: int
                ) -> tuple[int, int]:
    """(blq, bkv) whose VMEM footprint fits Mosaic's 16MB scoped budget.

    Two head-folding costs the naive `_block` picker missed (found the
    hard way: pp=1024 shapes OOM'd at 18-20MB):
      * Mosaic tiles the LAST dim to 128 lanes, so hd=32 blocks occupy
        4x their logical bytes (double-buffered, charged 2x);
      * kernel temporaries (s, p, dp...) are [nh, blq, bkv] f32 on the
        VMEM stack — nh-fold bigger than the v1 per-head kernels'; ~3
        live at once.
    n*_st / n*_f32 count the stream-dtype and f32 buffers keyed to each
    block size."""
    ph = _ceil_to(hd, 128)

    def est(blq, bkv):
        bufs = 2 * nh * ph * (blq * (nq_st * sb + nq_f32 * 4)
                              + bkv * (nkv_st * sb + nkv_f32 * 4))
        temps = 3 * nh * blq * bkv * 4
        return bufs + temps

    blq, bkv = _block(lp), _block(kp)
    while est(blq, bkv) > _VMEM_BUDGET and max(blq, bkv) > 128:
        if bkv >= blq and bkv > 128:
            bkv = _block(kp, bkv - 128)
        else:
            blq = _block(lp, blq - 128)
    if est(blq, bkv) > _VMEM_BUDGET:
        import warnings
        warnings.warn(
            f"prefix-attention blocks floor at (blq={blq}, bkv={bkv}) but "
            f"the estimated VMEM footprint ({est(blq, bkv) >> 20}MB) still "
            f"exceeds the {_VMEM_BUDGET >> 20}MB budget (nh={nh}, hd={hd}) "
            f"— Mosaic may fail with a scoped-vmem OOM; reduce num_heads "
            f"or head_dim, or disable prefix_flash", stacklevel=3)
    return blq, bkv


def _scores(q, k_ref, mask_ref, scale, row0, col0, blq, bkv):
    """Masked (optionally causal) score tile [nh, blq, bkv], fp32.

    row0/col0: global offsets of the tile's first row/column; col0=None
    skips the causal comparison (the cross-prefix branch)."""
    s = _bdot(q, k_ref[0], 2, 2) * scale
    s = jnp.where(mask_ref[0] > 0, s, NEG)
    if col0 is not None:
        sh = (blq, bkv)
        rows = row0 + jax.lax.broadcasted_iota(jnp.int32, sh, 0)
        cols = col0 + jax.lax.broadcasted_iota(jnp.int32, sh, 1)
        s = jnp.where(cols <= rows, s, NEG)
    return s


def _bdot(a, b, contract_a, contract_b):
    """nh-batched matmul: a [nh, m, ca], b [nh, n, cb] -> [nh, m, n] fp32."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# merged-sweep glue shared by the forward and dq kernels
# ---------------------------------------------------------------------------

class _Sweep:
    """Grid + BlockSpecs for one online-softmax sweep (prefix ++ self).

    ONE source of truth for the clamped index maps: the inactive input
    parks on its last-fetched block (prefix clamps at np_-1 during the
    self phase, self clamps at 0 during the prefix phase), so Pallas
    skips the redundant DMA and the merge costs no bandwidth."""

    def __init__(self, qq, pk, *, div, nq_st, nq_f32, nkv_st):
        bq_, nh, lp, hd = qq.shape
        self.has_prefix = pk is not None
        pp = pk.shape[2] if self.has_prefix else 0
        sb = jnp.dtype(qq.dtype).itemsize
        blq, bkv = _fit_blocks(
            lp, math.gcd(pp, lp) if self.has_prefix else lp, nh, hd, sb,
            nq_st=nq_st, nq_f32=nq_f32, nkv_st=nkv_st, nkv_f32=0)
        self.bq, self.nh, self.lp, self.hd = bq_, nh, lp, hd
        self.blq, self.bkv = blq, bkv
        np_, ns_ = pp // bkv, lp // bkv
        self.np_ = np_
        self.grid = (bq_, lp // blq, np_ + ns_)
        kw = dict(memory_space=pltpu.VMEM)
        self.kw = kw
        qmap = lambda b, i, t: (b, 0, i, 0)                        # noqa: E731
        skmap = lambda b, i, t: (b, 0, jnp.clip(t - np_, 0, ns_ - 1), 0)  # noqa: E731,E501
        smmap = lambda b, i, t: (b, 0, jnp.clip(t - np_, 0, ns_ - 1))  # noqa: E731,E501
        pkmap = lambda b, i, t: (b // div, 0, jnp.minimum(t, np_ - 1), 0)  # noqa: E731,E501
        pmmap = lambda b, i, t: (b // div, 0, jnp.minimum(t, np_ - 1))  # noqa: E731,E501
        self.qspec = pl.BlockSpec((1, nh, blq, hd), qmap, **kw)
        self.lspec = pl.BlockSpec((1, nh, blq),
                                  lambda b, i, t: (b, 0, i), **kw)
        self.pkspec = pl.BlockSpec((1, nh, bkv, hd), pkmap, **kw)
        self.pmspec = pl.BlockSpec((1, 1, bkv), pmmap, **kw)
        self.skspec = pl.BlockSpec((1, nh, bkv, hd), skmap, **kw)
        self.smspec = pl.BlockSpec((1, 1, bkv), smmap, **kw)

    def kv_specs_args(self, pk, pv, pmask, sk, sv, smask):
        if self.has_prefix:
            return ([self.pkspec, self.pkspec, self.pmspec,
                     self.skspec, self.skspec, self.smspec],
                    [pk, pv, pmask, sk, sv, smask])
        return ([self.skspec, self.skspec, self.smspec], [sk, sv, smask])


def _per_branch(has_prefix, np_, t, update):
    """Run `update(prefix: bool)` for the branch grid step t belongs to.

    The self branch is always causal; the prefix branch never is."""
    if has_prefix:
        @pl.when(t < np_)
        def _():
            update(prefix=True)

        @pl.when(t >= np_)
        def _():
            update(prefix=False)
    else:
        update(prefix=False)


# ---------------------------------------------------------------------------
# forward kernel: one online-softmax sweep over (prefix blocks ++ self blocks)
# ---------------------------------------------------------------------------

def _fwd_kernel(*refs, scale, np_, blq, bkv, has_prefix):
    if has_prefix:
        (q_ref, pk_ref, pv_ref, pm_ref, sk_ref, sv_ref, sm_ref,
         out_ref, lse_ref, m_sc, l_sc) = refs
    else:
        (q_ref, sk_ref, sv_ref, sm_ref,
         out_ref, lse_ref, m_sc, l_sc) = refs
    t = pl.program_id(2)
    n_t = pl.num_programs(2)
    i = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, NEG)
        l_sc[:] = jnp.zeros_like(l_sc)
        out_ref[0] = jnp.zeros_like(out_ref[0])

    def update(prefix: bool):
        k_ref, v_ref, mask_ref = ((pk_ref, pv_ref, pm_ref) if prefix
                                  else (sk_ref, sv_ref, sm_ref))
        col0 = None if prefix else (t - np_) * bkv
        s = _scores(q_ref[0], k_ref, mask_ref, scale, i * blq, col0,
                    blq, bkv)
        # running (m, l) live as [nh, blq] (blq on the LANES — a trailing
        # singleton dim would be padded to 128 lanes and cost real VMEM)
        m_prev = m_sc[:]                               # [nh, blq]
        l_prev = l_sc[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[..., None])
        l_sc[:] = alpha * l_prev + jnp.sum(p, axis=-1)
        m_sc[:] = m_new
        pv = _bdot(p.astype(v_ref.dtype), v_ref[0], 2, 1)   # [nh, blq, hd]
        out_ref[0] = out_ref[0] * alpha[..., None] + pv

    _per_branch(has_prefix, np_, t, update)

    @pl.when(t == n_t - 1)
    def _():
        l = l_sc[:]                                    # [nh, blq]
        out_ref[0] = out_ref[0] / jnp.where(l == 0.0, 1.0, l)[..., None]
        lse_ref[0] = m_sc[:] + jnp.log(jnp.maximum(l, 1e-30))


def _fwd_call(qq, sk, sv, smask, pk=None, pv=None, pmask=None, *,
              scale, div=1):
    """qq/sk/sv [BQ,nh,Lp,hd] (self stream); pk/pv [BK,nh,Pp,hd] or None.

    smask [BQ,1,Lp] f32, pmask [BK,1,Pp] f32.  BK = BQ // div; each group
    of `div` consecutive q-batch rows shares the prefix k/v/mask.
    Returns (out [BQ,nh,Lp,hd] f32, lse [BQ,nh,Lp] f32)."""
    sw = _Sweep(qq, pk, div=div, nq_st=1, nq_f32=1,
                nkv_st=4 if pk is not None else 2)
    kv_specs, kv_args = sw.kv_specs_args(pk, pv, pmask, sk, sv, smask)
    kernel = functools.partial(_fwd_kernel, scale=scale, np_=sw.np_,
                               blq=sw.blq, bkv=sw.bkv,
                               has_prefix=sw.has_prefix)
    pp = pk.shape[2] if pk is not None else 0
    kp_eff = pp // max(div, 1) + sw.lp
    out, lse = pl.pallas_call(
        kernel,
        grid=sw.grid,
        in_specs=[sw.qspec] + kv_specs,
        out_specs=[sw.qspec, sw.lspec],
        out_shape=[
            jax.ShapeDtypeStruct((sw.bq, sw.nh, sw.lp, sw.hd), jnp.float32),
            jax.ShapeDtypeStruct((sw.bq, sw.nh, sw.lp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((sw.nh, sw.blq), jnp.float32),
            pltpu.VMEM((sw.nh, sw.blq), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * sw.bq * sw.nh * sw.lp * (pp + sw.lp) * sw.hd,
            bytes_accessed=4 * sw.bq * sw.nh * (sw.lp + kp_eff) * sw.hd * 2,
            transcendentals=sw.bq * sw.nh * sw.lp * (pp + sw.lp),
        ),
        interpret=_INTERPRET,
    )(qq, *kv_args)
    return out, lse


# ---------------------------------------------------------------------------
# backward kernels (fed the GLOBAL lse/delta)
# ---------------------------------------------------------------------------

def _dq_kernel(*refs, scale, np_, blq, bkv, has_prefix):
    if has_prefix:
        (q_ref, pk_ref, pv_ref, pm_ref, sk_ref, sv_ref, sm_ref,
         g_ref, lse_ref, delta_ref, dq_ref) = refs
    else:
        (q_ref, sk_ref, sv_ref, sm_ref,
         g_ref, lse_ref, delta_ref, dq_ref) = refs
    t = pl.program_id(2)
    i = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    def update(prefix: bool):
        k_ref, v_ref, mask_ref = ((pk_ref, pv_ref, pm_ref) if prefix
                                  else (sk_ref, sv_ref, sm_ref))
        col0 = None if prefix else (t - np_) * bkv
        s = _scores(q_ref[0], k_ref, mask_ref, scale, i * blq, col0,
                    blq, bkv)
        p = jnp.exp(s - lse_ref[0][..., None])         # global probs
        g = g_ref[0]
        dp = _bdot(g, v_ref[0], 2, 2)                  # [nh, blq, bkv]
        ds = p * (dp - delta_ref[0][..., None]) * scale
        k = k_ref[0]
        dq_ref[0] = dq_ref[0] + _bdot(ds.astype(k.dtype), k, 2, 1)

    _per_branch(has_prefix, np_, t, update)


def _dq_call(qq, sk, sv, smask, pk, pv, pmask, g, lse, delta, *,
             scale, div=1):
    sw = _Sweep(qq, pk, div=div, nq_st=2, nq_f32=1,
                nkv_st=4 if pk is not None else 2)
    kv_specs, kv_args = sw.kv_specs_args(pk, pv, pmask, sk, sv, smask)
    kernel = functools.partial(_dq_kernel, scale=scale, np_=sw.np_,
                               blq=sw.blq, bkv=sw.bkv,
                               has_prefix=sw.has_prefix)
    return pl.pallas_call(
        kernel,
        grid=sw.grid,
        in_specs=[sw.qspec] + kv_specs + [sw.qspec, sw.lspec, sw.lspec],
        out_specs=sw.qspec,
        out_shape=jax.ShapeDtypeStruct((sw.bq, sw.nh, sw.lp, sw.hd),
                                       jnp.float32),
        interpret=_INTERPRET,
    )(qq, *kv_args, g, lse, delta)


def _dkv_kernel(q_ref, k_ref, v_ref, kmask_ref, g_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, scale, causal, blq, bkv, n_lq):
    s_id = pl.program_id(2)
    kvb = pl.program_id(1)

    @pl.when(s_id == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0]
    col0 = kvb * bkv if causal else None
    s = _scores(q, k_ref, kmask_ref, scale, (s_id % n_lq) * blq, col0,
                blq, bkv)
    p = jnp.exp(s - lse_ref[0][..., None])
    g = g_ref[0]
    dv_ref[0] = dv_ref[0] + _bdot(p.astype(g.dtype), g, 1, 1)
    dp = _bdot(g, v_ref[0], 2, 2)
    ds = p * (dp - delta_ref[0][..., None]) * scale
    dk_ref[0] = dk_ref[0] + _bdot(ds.astype(q.dtype), q, 1, 1)


def _dkv_call(q, k, v, kmask, g, lse, delta, *, scale, causal, div):
    """dk/dv for one branch; accumulates over the div*n_lq query-row blocks
    that attend to each KV block (for the prefix branch that spans all Q
    query songs of the episode — the prefix grads sum across the group)."""
    bq_, nh, lp, hd = q.shape
    bk_ = k.shape[0]
    kp = k.shape[2]
    sb = jnp.dtype(q.dtype).itemsize
    blq, bkv = _fit_blocks(lp, kp, nh, hd, sb, nq_st=2, nq_f32=0,
                           nkv_st=2, nkv_f32=2)
    n_lq = lp // blq
    kw = dict(memory_space=pltpu.VMEM)
    grid = (bk_, kp // bkv, div * n_lq)
    qmap = lambda b, t, s: (b * div + s // n_lq, 0, s % n_lq, 0)  # noqa: E731,E501
    lmap = lambda b, t, s: (b * div + s // n_lq, 0, s % n_lq)  # noqa: E731
    kmap = lambda b, t, s: (b, 0, t, 0)               # noqa: E731
    mmap = lambda b, t, s: (b, 0, t)                  # noqa: E731
    omap = lambda b, t, s: (b, 0, t, 0)               # noqa: E731
    kernel = functools.partial(_dkv_kernel, scale=scale, causal=causal,
                               blq=blq, bkv=bkv, n_lq=n_lq)
    dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, nh, blq, hd), qmap, **kw),
            pl.BlockSpec((1, nh, bkv, hd), kmap, **kw),
            pl.BlockSpec((1, nh, bkv, hd), kmap, **kw),
            pl.BlockSpec((1, 1, bkv), mmap, **kw),
            pl.BlockSpec((1, nh, blq, hd), qmap, **kw),
            pl.BlockSpec((1, nh, blq), lmap, **kw),
            pl.BlockSpec((1, nh, blq), lmap, **kw),
        ],
        out_specs=[
            pl.BlockSpec((1, nh, bkv, hd), omap, **kw),
            pl.BlockSpec((1, nh, bkv, hd), omap, **kw),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bk_, nh, kp, hd), jnp.float32),
            jax.ShapeDtypeStruct((bk_, nh, kp, hd), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(q, k, v, kmask, g, lse, delta)
    return dk, dv


# ---------------------------------------------------------------------------
# resident plan: full context in VMEM, single-pass softmax, fused backward
# ---------------------------------------------------------------------------
#
# At the episodic shapes that dominate training (Lq ~ 100, P = K*L ~ 500,
# nh*hd = E ~ 256) the streaming flash plan above is VPU- and grid-bound,
# not MXU-bound: the r4 trace audit (benchmarks/step_profile_v5000_tfm.json,
# ROADMAP.md round-5 candidate #1) measured the kernel pairs at ~15% of MXU
# peak — the online-softmax bookkeeping (running m/l updates + output
# rescaling per KV block) and ~800 tiny grid steps cost more than the
# matmuls.  But at these shapes the WHOLE context row fits in VMEM, so none
# of that machinery is needed:
#
#   * Grid is (episode, row-block) — 32x5 steps at the flagship shape vs
#     800 — with the full (prefix ++ song) KV resident per step; the
#     softmax is ONE pass (one max, one exp, one sum), no rescaling.
#   * The backward is FUSED: one kernel computes scores and probs ONCE and
#     emits dq, d(self k/v), AND d(prefix k/v) from the shared tiles.  The
#     streaming plan runs three kernels (dq, dkv-prefix, dkv-self), each
#     recomputing scores/probs — the fusion deletes ~2 of the 10 matmul
#     groups and half the exp/mask VPU work.
#   * Prefix K/V blocks have a constant index within an episode, so they
#     park in VMEM across the episode's row blocks (no re-DMA); the
#     prefix dk/dv outputs likewise accumulate in VMEM across the
#     episode's sequential grid steps and flush once per episode.
#
# Plan selection is by VMEM footprint (`_res_plan`): resident when the
# context fits (the training regime), streaming otherwise (K=20/L=512,
# P > 10k — where the streaming kernel's measured 2.6x win over einsum
# lives).  FEWSHOT_PREFIX_PLAN=resident|stream|auto overrides for A/B.
# Layout: q/k/v/g ride as [B, nh, Q, Lp, hd] (heads outer, so all matmuls
# are nh-batched dot_generals); prefix K/V as [B, nh, Pp, hd].


def _res_plan(nh: int, lp: int, pp: int, hd: int, sb: int) -> int | None:
    """Largest row-block size blr (a 128-multiple dividing lp) whose
    worst-case (backward) VMEM footprint fits the budget; None = resident
    plan unsupported at this shape (fall back to streaming)."""
    ph = _ceil_to(hd, 128)

    def est(blr):
        io = (2 * nh * blr * ph * sb        # q, g row blocks
              + 2 * nh * lp * ph * sb       # self k, v (full song, parked)
              + 2 * nh * pp * ph * sb       # prefix k, v (parked)
              + nh * blr * ph * 4           # dq out
              + 2 * nh * lp * ph * 4        # d(self k/v) accumulators
              + 2 * nh * pp * ph * 4)       # d(prefix k/v) accumulators
        temps = 3 * nh * blr * (pp + lp) * 4
        return 2 * io + temps               # 2x: double-buffering charge

    for blr in range(lp, 0, -128):
        if lp % blr == 0 and est(blr) <= _VMEM_BUDGET:
            return blr
    return None


def _res_scores(q, k, mask, scale, row0, lp):
    """Masked score block [nh, blr, n_cols] fp32; row0=None skips causal."""
    s = _bdot(q, k, 2, 2) * scale
    s = jnp.where(mask[None, None, :] > 0, s, NEG)
    if row0 is not None:
        blr = q.shape[1]
        rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (blr, lp), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (blr, lp), 1)
        s = jnp.where((cols <= rows)[None], s, NEG)
    return s


def _res_fwd_kernel(*refs, scale, blr, lp, rpb, has_prefix):
    if has_prefix:
        (q_ref, sk_ref, sv_ref, sm_ref, pk_ref, pv_ref, pm_ref,
         out_ref, lse_ref) = refs
    else:
        q_ref, sk_ref, sv_ref, sm_ref, out_ref, lse_ref = refs
    r = pl.program_id(1)
    row0 = (r % rpb) * blr
    q = q_ref[0, :, 0]                                   # [nh, blr, hd]
    sk, sv = sk_ref[0, :, 0], sv_ref[0, :, 0]            # [nh, lp, hd]
    s_s = _res_scores(q, sk, sm_ref[0, 0, 0], scale, row0, lp)
    m = jnp.max(s_s, axis=-1)                            # [nh, blr]
    if has_prefix:
        s_p = _res_scores(q, pk_ref[0], pm_ref[0, 0], scale, None, lp)
        m = jnp.maximum(m, jnp.max(s_p, axis=-1))
    p_s = jnp.exp(s_s - m[..., None])
    l = jnp.sum(p_s, axis=-1)
    acc = _bdot(p_s.astype(sv.dtype), sv, 2, 1)          # [nh, blr, hd]
    if has_prefix:
        p_p = jnp.exp(s_p - m[..., None])
        l = l + jnp.sum(p_p, axis=-1)
        acc = acc + _bdot(p_p.astype(pv_ref.dtype), pv_ref[0], 2, 1)
    out_ref[0, :, 0] = acc / jnp.where(l == 0.0, 1.0, l)[..., None]
    lse_ref[0] = m + jnp.log(jnp.maximum(l, 1e-30))


def _res_bwd_kernel(*refs, scale, blr, lp, rpb, has_prefix):
    if has_prefix:
        (q_ref, sk_ref, sv_ref, sm_ref, pk_ref, pv_ref, pm_ref,
         g_ref, lse_ref, delta_ref,
         dq_ref, dsk_ref, dsv_ref, dpk_ref, dpv_ref) = refs
    else:
        (q_ref, sk_ref, sv_ref, sm_ref, g_ref, lse_ref, delta_ref,
         dq_ref, dsk_ref, dsv_ref) = refs
    r = pl.program_id(1)
    row0 = (r % rpb) * blr
    q, g = q_ref[0, :, 0], g_ref[0, :, 0]                # [nh, blr, hd]
    sk, sv = sk_ref[0, :, 0], sv_ref[0, :, 0]
    lse = lse_ref[0]                                     # [nh, blr]
    delta = delta_ref[0]

    @pl.when(r % rpb == 0)       # song's first row block: reset accumulators
    def _():
        dsk_ref[0] = jnp.zeros_like(dsk_ref[0])
        dsv_ref[0] = jnp.zeros_like(dsv_ref[0])

    # self branch: probs from the SAVED global lse — no softmax passes
    s = _res_scores(q, sk, sm_ref[0, 0, 0], scale, row0, lp)
    p = jnp.exp(s - lse[..., None])                      # [nh, blr, lp]
    dsv_ref[0, :, 0] += _bdot(p.astype(g.dtype), g, 1, 1)
    dp = _bdot(g, sv, 2, 2)
    ds = p * (dp - delta[..., None]) * scale
    dq = _bdot(ds.astype(sk.dtype), sk, 2, 1)            # [nh, blr, hd]
    dsk_ref[0, :, 0] += _bdot(ds.astype(q.dtype), q, 1, 1)

    if has_prefix:
        @pl.when(r == 0)         # episode's first step: reset prefix accs
        def _():
            dpk_ref[0] = jnp.zeros_like(dpk_ref[0])
            dpv_ref[0] = jnp.zeros_like(dpv_ref[0])
        s_p = _res_scores(q, pk_ref[0], pm_ref[0, 0], scale, None, lp)
        p_p = jnp.exp(s_p - lse[..., None])
        dpv_ref[0] += _bdot(p_p.astype(g.dtype), g, 1, 1)
        dp_p = _bdot(g, pv_ref[0], 2, 2)
        ds_p = p_p * (dp_p - delta[..., None]) * scale
        dq = dq + _bdot(ds_p.astype(pk_ref.dtype), pk_ref[0], 2, 1)
        dpk_ref[0] += _bdot(ds_p.astype(q.dtype), q, 1, 1)

    dq_ref[0, :, 0] = dq


def _res_specs(b, nh, q_, lp, hd, blr, pk):
    """Block specs honoring the Mosaic constraint that a block's last two
    dims be (8k, 128k)-divisible OR equal to the array dims: smask rides
    as [B, Q, 1, Lp] (trailing (1, Lp) == array dims) and lse/delta as
    [B, nh, Q*Lp] (trailing (nh, blr): nh == array dim, blr 128-mult)."""
    rpb = lp // blr
    kw = dict(memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((1, nh, 1, blr, hd),
                         lambda bb, r: (bb, 0, r // rpb, r % rpb, 0), **kw)
    sspec = pl.BlockSpec((1, nh, 1, lp, hd),
                         lambda bb, r: (bb, 0, r // rpb, 0, 0), **kw)
    smspec = pl.BlockSpec((1, 1, 1, lp),
                          lambda bb, r: (bb, r // rpb, 0, 0), **kw)
    lspec = pl.BlockSpec((1, nh, blr), lambda bb, r: (bb, 0, r), **kw)
    pspec = pmspec = None
    if pk is not None:
        pp = pk.shape[2]
        pspec = pl.BlockSpec((1, nh, pp, hd),
                             lambda bb, r: (bb, 0, 0, 0), **kw)
        pmspec = pl.BlockSpec((1, 1, pp), lambda bb, r: (bb, 0, 0), **kw)
    return rpb, qspec, sspec, smspec, lspec, pspec, pmspec


def _res_fwd_call(qq, sk, sv, smask, pk, pv, pmask, *, scale, blr):
    """qq/sk/sv [B,nh,Q,Lp,hd]; pk/pv [B,nh,Pp,hd] or None; smask [B,Q,Lp]
    f32; pmask [B,1,Pp] f32.  Returns (out, lse) fp32."""
    b, nh, q_, lp, hd = qq.shape
    rpb, qspec, sspec, smspec, lspec, pspec, pmspec = _res_specs(
        b, nh, q_, lp, hd, blr, pk)
    specs = [qspec, sspec, sspec, smspec]
    args = [qq, sk, sv, smask[:, :, None]]
    if pk is not None:
        specs += [pspec, pspec, pmspec]
        args += [pk, pv, pmask]
    pp = pk.shape[2] if pk is not None else 0
    kernel = functools.partial(_res_fwd_kernel, scale=scale, blr=blr,
                               lp=lp, rpb=rpb, has_prefix=pk is not None)
    return pl.pallas_call(
        kernel,
        grid=(b, q_ * rpb),
        in_specs=specs,
        out_specs=[qspec, lspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, nh, q_, lp, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, nh, q_ * lp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nh * q_ * lp * (pp + lp) * hd,
            bytes_accessed=2 * b * nh * (3 * q_ * lp + 2 * pp) * hd * 2,
            transcendentals=b * nh * q_ * lp * (pp + lp),
        ),
        interpret=_INTERPRET,
    )(*args)


def _res_bwd_call(qq, sk, sv, smask, pk, pv, pmask, g, lse, delta, *,
                  scale, blr):
    b, nh, q_, lp, hd = qq.shape
    rpb, qspec, sspec, smspec, lspec, pspec, pmspec = _res_specs(
        b, nh, q_, lp, hd, blr, pk)
    specs = [qspec, sspec, sspec, smspec]
    args = [qq, sk, sv, smask[:, :, None]]
    if pk is not None:
        specs += [pspec, pspec, pmspec]
        args += [pk, pv, pmask]
    specs += [qspec, lspec, lspec]
    args += [g, lse, delta]
    out_specs = [qspec, sspec, sspec]
    out_shape = [
        jax.ShapeDtypeStruct((b, nh, q_, lp, hd), jnp.float32),
        jax.ShapeDtypeStruct((b, nh, q_, lp, hd), jnp.float32),
        jax.ShapeDtypeStruct((b, nh, q_, lp, hd), jnp.float32),
    ]
    if pk is not None:
        pp = pk.shape[2]
        out_specs += [pspec, pspec]
        out_shape += [
            jax.ShapeDtypeStruct((b, nh, pp, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, nh, pp, hd), jnp.float32),
        ]
    kernel = functools.partial(_res_bwd_kernel, scale=scale, blr=blr,
                               lp=lp, rpb=rpb, has_prefix=pk is not None)
    return pl.pallas_call(
        kernel,
        grid=(b, q_ * rpb),
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_INTERPRET,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _res_prefix_flash(qq, qk, qv, pk, pv, qmask, pmask, scale, blr):
    out, _ = _res_prefix_flash_fwd(qq, qk, qv, pk, pv, qmask, pmask,
                                   scale, blr)
    return out


def _res_prefix_flash_fwd(qq, qk, qv, pk, pv, qmask, pmask, scale, blr):
    out, lse = _res_fwd_call(qq, qk, qv, qmask, pk, pv, pmask,
                             scale=scale, blr=blr)
    return out, (qq, qk, qv, pk, pv, qmask, pmask, out, lse)


def _res_prefix_flash_bwd(scale, blr, res, g):
    qq, qk, qv, pk, pv, qmask, pmask, out, lse = res
    b, nh, q_, lp, _ = qq.shape
    g = g.astype(jnp.float32)
    delta = jnp.sum(g * out, axis=-1).reshape(b, nh, q_ * lp)
    gc = g.astype(qq.dtype)
    dq, dqk, dqv, dpk, dpv = _res_bwd_call(
        qq, qk, qv, qmask, pk, pv, pmask, gc, lse, delta,
        scale=scale, blr=blr)
    dt = qq.dtype
    return (dq.astype(dt), dqk.astype(dt), dqv.astype(dt),
            dpk.astype(pk.dtype), dpv.astype(pv.dtype), None, None)


_res_prefix_flash.defvjp(_res_prefix_flash_fwd, _res_prefix_flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _res_causal_flash(q, k, v, kmask, scale, blr):
    out, _ = _res_causal_flash_fwd(q, k, v, kmask, scale, blr)
    return out


def _res_causal_flash_fwd(q, k, v, kmask, scale, blr):
    out, lse = _res_fwd_call(q, k, v, kmask, None, None, None,
                             scale=scale, blr=blr)
    return out, (q, k, v, kmask, out, lse)


def _res_causal_flash_bwd(scale, blr, res, g):
    q, k, v, kmask, out, lse = res
    b, nh, q_, lp, _ = q.shape
    g = g.astype(jnp.float32)
    delta = jnp.sum(g * out, axis=-1).reshape(b, nh, q_ * lp)
    gc = g.astype(q.dtype)
    dq, dk, dv = _res_bwd_call(q, k, v, kmask, None, None, None,
                               gc, lse, delta, scale=scale, blr=blr)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


_res_causal_flash.defvjp(_res_causal_flash_fwd, _res_causal_flash_bwd)


# ---------------------------------------------------------------------------
# token-major resident plan: zero-relayout kernel I/O, heads as lane slices
# ---------------------------------------------------------------------------
#
# The 5-D resident plan above wants [B, nh, Q, Lp, hd] operands, but the
# model's QKV matmuls produce [B, Q, Lq, E] — so XLA inserts a minor-dim
# relayout copy per tensor per layer-stream-direction to feed the kernels
# (r5 trace: the "data formatting" HLO bucket is ~19% of transformer step
# device time, with these copies the biggest identifiable slice).  When
# hd % 128 == 0 the copies are pure waste: a head's lanes are a 128-aligned
# contiguous lane range of E = nh*hd, so the kernel can consume the
# matmul-native [B, Q, Lp, E] layout directly and slice heads INSIDE the
# kernel (static lane slices are free on TPU — no relayout, no strided
# access).  Same math, same grid, same VMEM footprint as the 5-D plan
# (E = nh*hd bytes per row either way); the per-head matmuls are the same
# [blr, hd] x [hd, cols] shapes the nh-batched dot_general lowered to.
# hd % 128 != 0 falls back to the 5-D resident plan.


def _dot2(a, b, ca, cb):
    """2-D matmul, fp32 accumulate: contract a's dim ca with b's dim cb."""
    return jax.lax.dot_general(a, b, (((ca,), (cb,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _tm_scores(q, k, mask, scale, row0, lp):
    """Masked score block [n_rows, n_cols] fp32; row0=None skips causal."""
    s = _dot2(q, k, 1, 1) * scale
    s = jnp.where(mask[None, :] > 0, s, NEG)
    if row0 is not None:
        blr = q.shape[0]
        rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (blr, lp), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (blr, lp), 1)
        s = jnp.where(cols <= rows, s, NEG)
    return s


def _tm_fwd_kernel(*refs, scale, blr, lp, rpb, nh, hd, has_prefix):
    if has_prefix:
        (q_ref, sk_ref, sv_ref, sm_ref, pk_ref, pv_ref, pm_ref,
         out_ref, lse_ref) = refs
    else:
        q_ref, sk_ref, sv_ref, sm_ref, out_ref, lse_ref = refs
    r = pl.program_id(1)
    row0 = (r % rpb) * blr
    sm = sm_ref[0, 0, 0]
    for h in range(nh):
        sl = slice(h * hd, (h + 1) * hd)
        q = q_ref[0, 0, :, sl]                           # [blr, hd]
        s_s = _tm_scores(q, sk_ref[0, 0, :, sl], sm, scale, row0, lp)
        m = jnp.max(s_s, axis=-1)                        # [blr]
        if has_prefix:
            s_p = _tm_scores(q, pk_ref[0, :, sl], pm_ref[0, 0], scale,
                             None, lp)
            m = jnp.maximum(m, jnp.max(s_p, axis=-1))
        p_s = jnp.exp(s_s - m[:, None])
        l = jnp.sum(p_s, axis=-1)
        acc = _dot2(p_s.astype(sv_ref.dtype), sv_ref[0, 0, :, sl], 1, 0)
        if has_prefix:
            p_p = jnp.exp(s_p - m[:, None])
            l = l + jnp.sum(p_p, axis=-1)
            acc = acc + _dot2(p_p.astype(pv_ref.dtype), pv_ref[0, :, sl],
                              1, 0)
        out_ref[0, 0, :, sl] = acc / jnp.where(l == 0.0, 1.0, l)[:, None]
        lse_ref[0, h] = m + jnp.log(jnp.maximum(l, 1e-30))


def _tm_bwd_kernel(*refs, scale, blr, lp, rpb, nh, hd, has_prefix):
    if has_prefix:
        (q_ref, sk_ref, sv_ref, sm_ref, pk_ref, pv_ref, pm_ref,
         g_ref, lse_ref, delta_ref,
         dq_ref, dsk_ref, dsv_ref, dpk_ref, dpv_ref) = refs
    else:
        (q_ref, sk_ref, sv_ref, sm_ref, g_ref, lse_ref, delta_ref,
         dq_ref, dsk_ref, dsv_ref) = refs
    r = pl.program_id(1)
    row0 = (r % rpb) * blr
    sm = sm_ref[0, 0, 0]

    @pl.when(r % rpb == 0)       # song's first row block: reset accumulators
    def _():
        dsk_ref[0] = jnp.zeros_like(dsk_ref[0])
        dsv_ref[0] = jnp.zeros_like(dsv_ref[0])
    if has_prefix:
        @pl.when(r == 0)         # episode's first step: reset prefix accs
        def _():
            dpk_ref[0] = jnp.zeros_like(dpk_ref[0])
            dpv_ref[0] = jnp.zeros_like(dpv_ref[0])

    for h in range(nh):
        sl = slice(h * hd, (h + 1) * hd)
        q, g = q_ref[0, 0, :, sl], g_ref[0, 0, :, sl]    # [blr, hd]
        sk, sv = sk_ref[0, 0, :, sl], sv_ref[0, 0, :, sl]
        lse = lse_ref[0, h]                              # [blr]
        delta = delta_ref[0, h]

        # self branch: probs from the SAVED global lse — no softmax passes
        s = _tm_scores(q, sk, sm, scale, row0, lp)
        p = jnp.exp(s - lse[:, None])                    # [blr, lp]
        dsv_ref[0, 0, :, sl] += _dot2(p.astype(g.dtype), g, 0, 0)
        dp = _dot2(g, sv, 1, 1)                          # [blr, lp]
        ds = p * (dp - delta[:, None]) * scale
        dq = _dot2(ds.astype(sk.dtype), sk, 1, 0)        # [blr, hd]
        dsk_ref[0, 0, :, sl] += _dot2(ds.astype(q.dtype), q, 0, 0)

        if has_prefix:
            pk = pk_ref[0, :, sl]
            s_p = _tm_scores(q, pk, pm_ref[0, 0], scale, None, lp)
            p_p = jnp.exp(s_p - lse[:, None])
            dpv_ref[0, :, sl] += _dot2(p_p.astype(g.dtype), g, 0, 0)
            dp_p = _dot2(g, pv_ref[0, :, sl], 1, 1)
            ds_p = p_p * (dp_p - delta[:, None]) * scale
            dq = dq + _dot2(ds_p.astype(pk.dtype), pk, 1, 0)
            dpk_ref[0, :, sl] += _dot2(ds_p.astype(q.dtype), q, 0, 0)

        dq_ref[0, 0, :, sl] = dq


def _tm_specs(b, nh, q_, lp, e, blr, pk):
    """Token-major block specs: q/k/v/g/out ride [B, Q, Lp, E], prefix K/V
    [B, Pp, E], masks and lse exactly as in the 5-D plan."""
    rpb = lp // blr
    kw = dict(memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((1, 1, blr, e),
                         lambda bb, r: (bb, r // rpb, r % rpb, 0), **kw)
    sspec = pl.BlockSpec((1, 1, lp, e),
                         lambda bb, r: (bb, r // rpb, 0, 0), **kw)
    smspec = pl.BlockSpec((1, 1, 1, lp),
                          lambda bb, r: (bb, r // rpb, 0, 0), **kw)
    lspec = pl.BlockSpec((1, nh, blr), lambda bb, r: (bb, 0, r), **kw)
    pspec = pmspec = None
    if pk is not None:
        pp = pk.shape[1]
        pspec = pl.BlockSpec((1, pp, e), lambda bb, r: (bb, 0, 0), **kw)
        pmspec = pl.BlockSpec((1, 1, pp), lambda bb, r: (bb, 0, 0), **kw)
    return rpb, qspec, sspec, smspec, lspec, pspec, pmspec


def _tm_fwd_call(qq, sk, sv, smask, pk, pv, pmask, *, scale, blr, nh):
    """qq/sk/sv [B,Q,Lp,E]; pk/pv [B,Pp,E] or None; smask [B,Q,Lp] f32;
    pmask [B,1,Pp] f32.  Returns (out [B,Q,Lp,E] fp32, lse [B,nh,Q*Lp])."""
    b, q_, lp, e = qq.shape
    hd = e // nh
    rpb, qspec, sspec, smspec, lspec, pspec, pmspec = _tm_specs(
        b, nh, q_, lp, e, blr, pk)
    specs = [qspec, sspec, sspec, smspec]
    args = [qq, sk, sv, smask[:, :, None]]
    if pk is not None:
        specs += [pspec, pspec, pmspec]
        args += [pk, pv, pmask]
    pp = pk.shape[1] if pk is not None else 0
    kernel = functools.partial(_tm_fwd_kernel, scale=scale, blr=blr,
                               lp=lp, rpb=rpb, nh=nh, hd=hd,
                               has_prefix=pk is not None)
    return pl.pallas_call(
        kernel,
        grid=(b, q_ * rpb),
        in_specs=specs,
        out_specs=[qspec, lspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, q_, lp, e), jnp.float32),
            jax.ShapeDtypeStruct((b, nh, q_ * lp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * q_ * lp * (pp + lp) * e,
            bytes_accessed=2 * b * (3 * q_ * lp + 2 * pp) * e * 2,
            transcendentals=b * nh * q_ * lp * (pp + lp),
        ),
        interpret=_INTERPRET,
    )(*args)


def _tm_bwd_call(qq, sk, sv, smask, pk, pv, pmask, g, lse, delta, *,
                 scale, blr, nh):
    b, q_, lp, e = qq.shape
    hd = e // nh
    rpb, qspec, sspec, smspec, lspec, pspec, pmspec = _tm_specs(
        b, nh, q_, lp, e, blr, pk)
    specs = [qspec, sspec, sspec, smspec]
    args = [qq, sk, sv, smask[:, :, None]]
    if pk is not None:
        specs += [pspec, pspec, pmspec]
        args += [pk, pv, pmask]
    specs += [qspec, lspec, lspec]
    args += [g, lse, delta]
    out_specs = [qspec, sspec, sspec]
    out_shape = [
        jax.ShapeDtypeStruct((b, q_, lp, e), jnp.float32),
        jax.ShapeDtypeStruct((b, q_, lp, e), jnp.float32),
        jax.ShapeDtypeStruct((b, q_, lp, e), jnp.float32),
    ]
    if pk is not None:
        pp = pk.shape[1]
        out_specs += [pspec, pspec]
        out_shape += [
            jax.ShapeDtypeStruct((b, pp, e), jnp.float32),
            jax.ShapeDtypeStruct((b, pp, e), jnp.float32),
        ]
    kernel = functools.partial(_tm_bwd_kernel, scale=scale, blr=blr,
                               lp=lp, rpb=rpb, nh=nh, hd=hd,
                               has_prefix=pk is not None)
    return pl.pallas_call(
        kernel,
        grid=(b, q_ * rpb),
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_INTERPRET,
    )(*args)


def _tm_delta(g, out, nh):
    """Per-head delta = rowsum(dout * out): [B,Q,Lp,E] -> [B, nh, Q*Lp]."""
    b, q_, lp, e = g.shape
    d = (g * out).reshape(b, q_, lp, nh, e // nh).sum(-1)    # [B,Q,Lp,nh]
    return jnp.moveaxis(d, 3, 1).reshape(b, nh, q_ * lp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _tm_prefix_flash(qq, qk, qv, pk, pv, qmask, pmask, scale, blr, nh):
    out, _ = _tm_prefix_flash_fwd(qq, qk, qv, pk, pv, qmask, pmask,
                                  scale, blr, nh)
    return out


def _tm_prefix_flash_fwd(qq, qk, qv, pk, pv, qmask, pmask, scale, blr, nh):
    out, lse = _tm_fwd_call(qq, qk, qv, qmask, pk, pv, pmask,
                            scale=scale, blr=blr, nh=nh)
    return out, (qq, qk, qv, pk, pv, qmask, pmask, out, lse)


def _tm_prefix_flash_bwd(scale, blr, nh, res, g):
    qq, qk, qv, pk, pv, qmask, pmask, out, lse = res
    g = g.astype(jnp.float32)
    delta = _tm_delta(g, out, nh)
    gc = g.astype(qq.dtype)
    dq, dqk, dqv, dpk, dpv = _tm_bwd_call(
        qq, qk, qv, qmask, pk, pv, pmask, gc, lse, delta,
        scale=scale, blr=blr, nh=nh)
    dt = qq.dtype
    return (dq.astype(dt), dqk.astype(dt), dqv.astype(dt),
            dpk.astype(pk.dtype), dpv.astype(pv.dtype), None, None)


_tm_prefix_flash.defvjp(_tm_prefix_flash_fwd, _tm_prefix_flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _tm_causal_flash(q, k, v, kmask, scale, blr, nh):
    out, _ = _tm_causal_flash_fwd(q, k, v, kmask, scale, blr, nh)
    return out


def _tm_causal_flash_fwd(q, k, v, kmask, scale, blr, nh):
    out, lse = _tm_fwd_call(q, k, v, kmask, None, None, None,
                            scale=scale, blr=blr, nh=nh)
    return out, (q, k, v, kmask, out, lse)


def _tm_causal_flash_bwd(scale, blr, nh, res, g):
    q, k, v, kmask, out, lse = res
    g = g.astype(jnp.float32)
    delta = _tm_delta(g, out, nh)
    gc = g.astype(q.dtype)
    dq, dk, dv = _tm_bwd_call(q, k, v, kmask, None, None, None,
                              gc, lse, delta, scale=scale, blr=blr, nh=nh)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


_tm_causal_flash.defvjp(_tm_causal_flash_fwd, _tm_causal_flash_bwd)


def _tm_eligible(hd: int) -> bool:
    """Token-major needs 128-aligned lane slices per head; the env knob
    FEWSHOT_PREFIX_RES_LAYOUT=heads|tokens forces a layout for A/B."""
    mode = os.environ.get("FEWSHOT_PREFIX_RES_LAYOUT", "auto")
    if mode == "heads":
        return False
    if mode == "tokens":
        if hd % 128:
            raise ValueError(
                f"FEWSHOT_PREFIX_RES_LAYOUT=tokens requires hd % 128 == 0 "
                f"(got hd={hd})")
        return True
    return hd % 128 == 0


def _plan_choice(nh: int, lp: int, pp: int, hd: int, sb: int) -> int | None:
    """Resolve the plan: returns blr for resident, None for streaming."""
    mode = os.environ.get("FEWSHOT_PREFIX_PLAN", "auto")
    if mode == "stream":
        return None
    forced = os.environ.get("FEWSHOT_PREFIX_RES_BLR")   # test hook: rpb > 1
    if forced:
        blr = int(forced)
        if lp % blr:
            raise ValueError(f"FEWSHOT_PREFIX_RES_BLR={blr} does not "
                             f"divide lp={lp}")
        return blr
    blr = _res_plan(nh, lp, pp, hd, sb)
    if blr is None and mode == "resident":
        raise ValueError(
            f"FEWSHOT_PREFIX_PLAN=resident but the shape (nh={nh}, lp={lp}, "
            f"pp={pp}, hd={hd}) does not fit the resident plan's VMEM budget")
    return blr


# ---------------------------------------------------------------------------
# custom-VJP wrapper: cross (shared prefix) ++ self (causal), one sweep
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _prefix_flash(qq, qk, qv, pk, pv, qmask, pmask, scale, div):
    out, _ = _prefix_flash_fwd(qq, qk, qv, pk, pv, qmask, pmask, scale, div)
    return out


def _prefix_flash_fwd(qq, qk, qv, pk, pv, qmask, pmask, scale, div):
    out, lse = _fwd_call(qq, qk, qv, qmask, pk, pv, pmask, scale=scale,
                         div=div)
    return out, (qq, qk, qv, pk, pv, qmask, pmask, out, lse)


def _prefix_flash_bwd(scale, div, res, g):
    qq, qk, qv, pk, pv, qmask, pmask, out, lse = res
    g = g.astype(jnp.float32)
    delta = jnp.sum(g * out, axis=-1)                    # [BQ, nh, Lp]
    gc = g.astype(qq.dtype)
    dq = _dq_call(qq, qk, qv, qmask, pk, pv, pmask, gc, lse, delta,
                  scale=scale, div=div)
    dpk, dpv = _dkv_call(qq, pk, pv, pmask, gc, lse, delta, scale=scale,
                         causal=False, div=div)
    dqk, dqv = _dkv_call(qq, qk, qv, qmask, gc, lse, delta, scale=scale,
                         causal=True, div=1)
    dt = qq.dtype
    return (dq.astype(dt), dqk.astype(dt), dqv.astype(dt),
            dpk.astype(pk.dtype), dpv.astype(pv.dtype), None, None)


_prefix_flash.defvjp(_prefix_flash_fwd, _prefix_flash_bwd)


# ---------------------------------------------------------------------------
# single-branch causal flash (the prefix stream's own self-attention)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _causal_flash(q, k, v, kmask, scale):
    out, _ = _causal_flash_fwd(q, k, v, kmask, scale)
    return out


def _causal_flash_fwd(q, k, v, kmask, scale):
    out, lse = _fwd_call(q, k, v, kmask, scale=scale)
    return out, (q, k, v, kmask, out, lse)


def _causal_flash_bwd(scale, res, g):
    q, k, v, kmask, out, lse = res
    g32 = g.astype(jnp.float32)
    delta = jnp.sum(g32 * out, axis=-1)                  # [B, nh, T]
    gc = g32.astype(q.dtype)
    dq = _dq_call(q, k, v, kmask, None, None, None, gc, lse, delta,
                  scale=scale)
    dk, dv = _dkv_call(q, k, v, kmask, gc, lse, delta, scale=scale,
                       causal=True, div=1)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


_causal_flash.defvjp(_causal_flash_fwd, _causal_flash_bwd)


def causal_self_attention_flash(q, k, v, mask) -> jax.Array:
    """Plain causal self-attention on the SAME kernels (single branch).

    q/k/v [B, T, nh, hd]; mask [B, T] bool (True = real) or None.
    Returns [B, T, nh*hd] fp32 — drop-in for ops.attention's einsum path,
    without the [B, h, T, T] score materialization (the prefix STREAM at
    P = K*L was the last big one left, e.g. 472MB/layer at config #4).
    Plan: resident single-pass kernel when the row fits VMEM (the training
    regime), streaming online-softmax otherwise."""
    b, t, nh, hd = q.shape
    scale = 1.0 / float(hd) ** 0.5
    tp = _ceil_to(t, 128)
    sb = jnp.dtype(q.dtype).itemsize

    m = (mask if mask is not None
         else jnp.ones((b, t), jnp.bool_)).astype(jnp.float32)
    m = jnp.pad(m, ((0, 0), (0, tp - t)))[:, None]

    blr = _plan_choice(nh, tp, 0, hd, sb)
    if blr is not None and _tm_eligible(hd):
        # token-major: consume the QKV matmul's native [B, T, E] layout,
        # heads are free 128-aligned lane slices inside the kernel
        def prep(x):    # [B,T,nh,hd] -> [B,1,Tp,E]
            x = x.reshape(b, 1, t, nh * hd)
            return jnp.pad(x, ((0, 0), (0, 0), (0, tp - t), (0, 0)))
        out = _tm_causal_flash(prep(q), prep(k), prep(v), m, scale, blr, nh)
        return out[:, 0, :t]                             # [B, T, E] fp32
    if blr is not None:
        def prep(x):    # [B,T,nh,hd] -> [B,nh,1,Tp,hd]
            x = jnp.moveaxis(x, 2, 1)[:, :, None]
            return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, tp - t), (0, 0)))
        out = _res_causal_flash(prep(q), prep(k), prep(v), m, scale, blr)
        out = jnp.moveaxis(out[:, :, 0], 1, 2)           # [B, Tp, nh, hd]
        return out[:, :t].reshape(b, t, nh * hd)

    def prep(x):
        x = jnp.moveaxis(x, 2, 1)
        return jnp.pad(x, ((0, 0), (0, 0), (0, tp - t), (0, 0)))

    out = _causal_flash(prep(q), prep(k), prep(v), m, scale)
    return jnp.moveaxis(out, 1, 2)[:, :t].reshape(b, t, nh * hd)


# ---------------------------------------------------------------------------
# public entry: shape/pad glue around the kernels
# ---------------------------------------------------------------------------

def prefix_attention(qq, qk, qv, pk, pv, query_mask, prefix_mask
                     ) -> jax.Array:
    """Episodic attention: query songs attend (shared prefix ++ self-causal).

    qq/qk/qv [B, Q, Lq, nh, hd]; pk/pv [B, P, nh, hd];
    query_mask [B, Q, Lq] bool (key-side), prefix_mask [B, P] bool.
    Returns [B, Q, Lq, nh*hd] fp32.  Exact (not approximate) — identical
    math to the einsum reference path, without ever materializing the
    [B, Q, h, Lq, P+Lq] score tensor.
    """
    b, q_, lq, nh, hd = qq.shape
    p = pk.shape[1]
    scale = 1.0 / float(hd) ** 0.5
    lp, pp = _ceil_to(lq, 128), _ceil_to(p, 128)
    sb = jnp.dtype(qq.dtype).itemsize

    def prep_p(x):      # [B,P,nh,hd] -> [B, nh, Pp, hd]
        x = jnp.moveaxis(x, 2, 1)
        return jnp.pad(x, ((0, 0), (0, 0), (0, pp - p), (0, 0)))

    pmask = jnp.pad(prefix_mask.astype(jnp.float32),
                    ((0, 0), (0, pp - p)))[:, None]

    blr = _plan_choice(nh, lp, pp, hd, sb)
    if blr is not None and _tm_eligible(hd):
        # token-major: zero-relayout — everything stays in the QKV matmul's
        # native [.., T, E] layout; heads are lane slices in the kernel
        def prep_qt(x):  # [B,Q,Lq,nh,hd] -> [B, Q, Lp, E]
            x = x.reshape(b, q_, lq, nh * hd)
            return jnp.pad(x, ((0, 0), (0, 0), (0, lp - lq), (0, 0)))
        def prep_pt(x):  # [B,P,nh,hd] -> [B, Pp, E]
            x = x.reshape(b, p, nh * hd)
            return jnp.pad(x, ((0, 0), (0, pp - p), (0, 0)))
        qmask5 = jnp.pad(query_mask.astype(jnp.float32),
                         ((0, 0), (0, 0), (0, lp - lq)))      # [B, Q, Lp]
        out = _tm_prefix_flash(prep_qt(qq), prep_qt(qk), prep_qt(qv),
                               prep_pt(pk), prep_pt(pv), qmask5, pmask,
                               scale, blr, nh)
        return out[:, :, :lq]                            # [B, Q, Lq, E] fp32
    if blr is not None:
        def prep_q5(x):  # [B,Q,Lq,nh,hd] -> [B, nh, Q, Lp, hd]
            x = jnp.moveaxis(x, 3, 1)
            return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, lp - lq),
                               (0, 0)))
        qmask5 = jnp.pad(query_mask.astype(jnp.float32),
                         ((0, 0), (0, 0), (0, lp - lq)))      # [B, Q, Lp]
        out = _res_prefix_flash(prep_q5(qq), prep_q5(qk), prep_q5(qv),
                                prep_p(pk), prep_p(pv), qmask5, pmask,
                                scale, blr)
        out = jnp.moveaxis(out, 1, 3)[:, :, :lq]         # [B, Q, Lq, nh, hd]
        return out.reshape(b, q_, lq, nh * hd)

    def prep_q(x):      # [B,Q,Lq,nh,hd] -> [B*Q, nh, Lp, hd]
        x = jnp.moveaxis(x.reshape(b * q_, lq, nh, hd), 2, 1)
        return jnp.pad(x, ((0, 0), (0, 0), (0, lp - lq), (0, 0)))

    qmask = jnp.pad(query_mask.reshape(b * q_, lq).astype(jnp.float32),
                    ((0, 0), (0, lp - lq)))[:, None]

    out = _prefix_flash(prep_q(qq), prep_q(qk), prep_q(qv),
                        prep_p(pk), prep_p(pv), qmask, pmask, scale, q_)
    out = jnp.moveaxis(out, 1, 2)[:, :lq]                # [B*Q, Lq, nh, hd]
    return out.reshape(b, q_, lq, nh * hd)


def prefix_attention_reference(qq, qk, qv, pk, pv, query_mask, prefix_mask
                               ) -> jax.Array:
    """XLA einsum reference (the materializing path) — used off-TPU and by
    the parity tests; numerics match models/transformer.py's original."""
    b, q_, lq, nh, hd = qq.shape
    scale = jnp.sqrt(jnp.float32(hd))
    causal = jnp.where(jnp.tril(jnp.ones((lq, lq), jnp.bool_)), 0.0,
                       NEG)[None, None, None]
    self_bias = causal + jnp.where(query_mask, 0.0,
                                   NEG)[:, :, None, None, :]
    cross_bias = jnp.where(prefix_mask, 0.0, NEG)[:, None, None, None, :]
    s_self = jnp.einsum("bqlhd,bqmhd->bqhlm", qq, qk,
                        preferred_element_type=jnp.float32)
    s_cross = jnp.einsum("bqlhd,bphd->bqhlp", qq, pk,
                         preferred_element_type=jnp.float32)
    s_self = s_self / scale + self_bias
    s_cross = s_cross / scale + cross_bias
    p = pk.shape[1]
    scores = jnp.concatenate([s_cross, s_self], axis=-1)
    probs = jax.nn.softmax(scores, axis=-1).astype(qv.dtype)
    a_cross = jnp.einsum("bqhlp,bphd->bqlhd", probs[..., :p], pv,
                         preferred_element_type=jnp.float32)
    a_self = jnp.einsum("bqhlm,bqmhd->bqlhd", probs[..., p:], qv,
                        preferred_element_type=jnp.float32)
    return (a_cross + a_self).reshape(b, q_, lq, nh * hd)


def fused_available(use_flash: bool) -> bool:
    """True when the fused kernels should run (TPU backend or interpret)."""
    return use_flash and (_INTERPRET
                          or jax.default_backend() in ("tpu", "axon"))


def episodic_attention(qq, qk, qv, pk, pv, query_mask, prefix_mask,
                       use_flash: bool) -> jax.Array:
    """Dispatch: fused kernel on TPU (default), einsum reference otherwise."""
    if fused_available(use_flash):
        return prefix_attention(qq, qk, qv, pk, pv, query_mask, prefix_mask)
    return prefix_attention_reference(qq, qk, qv, pk, pv, query_mask,
                                      prefix_mask)
