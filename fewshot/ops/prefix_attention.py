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
    P = K*L was the last big one left, e.g. 472MB/layer at config #4)."""
    b, t, nh, hd = q.shape
    scale = 1.0 / float(hd) ** 0.5
    tp = _ceil_to(t, 128)

    def prep(x):
        x = jnp.moveaxis(x, 2, 1)
        return jnp.pad(x, ((0, 0), (0, 0), (0, tp - t), (0, 0)))

    m = (mask if mask is not None
         else jnp.ones((b, t), jnp.bool_)).astype(jnp.float32)
    m = jnp.pad(m, ((0, 0), (0, tp - t)))[:, None]
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

    def prep_q(x):      # [B,Q,Lq,nh,hd] -> [B*Q, nh, Lp, hd]
        x = jnp.moveaxis(x.reshape(b * q_, lq, nh, hd), 2, 1)
        return jnp.pad(x, ((0, 0), (0, 0), (0, lp - lq), (0, 0)))

    def prep_p(x):      # [B,P,nh,hd] -> [B, nh, Pp, hd]
        x = jnp.moveaxis(x, 2, 1)
        return jnp.pad(x, ((0, 0), (0, 0), (0, pp - p), (0, 0)))

    qmask = jnp.pad(query_mask.reshape(b * q_, lq).astype(jnp.float32),
                    ((0, 0), (0, lp - lq)))[:, None]
    pmask = jnp.pad(prefix_mask.astype(jnp.float32),
                    ((0, 0), (0, pp - p)))[:, None]

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
