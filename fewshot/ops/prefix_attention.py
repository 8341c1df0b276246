"""Fused episodic prefix attention (Pallas, forward + custom-VJP backward).

The episodic transformer's hot pattern (BASELINE.json:10): each of the Q
query songs of an episode attends to the episode's support PREFIX (full,
key-masked) ++ ITSELF (causal, key-masked).  The XLA reference path
(models/transformer.py einsums) materializes [B, Q, h, Lq, P+Lq] fp32
scores+probs per layer — the transformer tier's HBM hog (VERDICT r1 #3);
at K=20, L=512 (P > 10k) it simply does not fit.

Flash factoring: attention over a concatenated KV range splits into two
independent online-softmax sweeps stitched by logsumexp:

    out = wc * out_cross + ws * out_self,   w* = exp(lse_* - lse_total)

and the backward of each branch is the standard flash backward fed the
GLOBAL (lse_total, delta=rowsum(dout*out_total)) — probabilities
p = exp(s - lse_total) are already globally normalized, so per-branch
dq/dk/dv sum exactly.  Three generic kernels (fwd, dq, dk/dv) therefore
serve both branches:

  * cross: causal=False, and the prefix K/V blocks are indexed with
    bq // Q in the BlockSpec index_map — the episode's prefix is stored
    ONCE and shared by its Q query songs, never replicated in HBM;
  * self: causal=True, div=1.

Scores only ever exist as a [blq, bkv] VMEM tile; running (m, l) ride in
scratch across the innermost KV grid dimension (TPU grids are sequential,
so output blocks with a constant index accumulate in VMEM and flush once).
All matmul operands are cast to the streams' dtype (bf16 under
compute_dtype=bfloat16) with fp32 MXU accumulation; softmax math is fp32.
"""

from __future__ import annotations

import functools
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


# ---------------------------------------------------------------------------
# forward kernel (one branch): online softmax over the KV grid dim
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, kmask_ref, out_ref, lse_ref,
                m_sc, l_sc, *, scale, causal, blq, bkv):
    t = pl.program_id(3)
    n_t = pl.num_programs(3)
    lqb = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, NEG)
        l_sc[:] = jnp.zeros_like(l_sc)
        out_ref[0, 0] = jnp.zeros_like(out_ref[0, 0])

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    kmask = kmask_ref[0] > 0                              # [1, bkv]
    s = jnp.where(kmask, s, NEG)
    if causal:
        rows = lqb * blq + jax.lax.broadcasted_iota(jnp.int32, (blq, bkv), 0)
        cols = t * bkv + jax.lax.broadcasted_iota(jnp.int32, (blq, bkv), 1)
        s = jnp.where(cols <= rows, s, NEG)

    m_prev = m_sc[:, 0:1]
    l_prev = l_sc[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    m_sc[:, 0:1] = m_new
    l_sc[:, 0:1] = l_new
    pv = jnp.dot(p.astype(v_ref.dtype), v_ref[0, 0],
                 preferred_element_type=jnp.float32)
    out_ref[0, 0] = out_ref[0, 0] * alpha + pv

    @pl.when(t == n_t - 1)
    def _():
        l = l_sc[:, 0:1]
        out_ref[0, 0] = out_ref[0, 0] / jnp.where(l == 0.0, 1.0, l)
        lse_ref[0, 0] = m_sc[:, 0:1] + jnp.log(jnp.maximum(l, 1e-30))


def _fwd_call(q, k, v, kmask, *, scale, causal, div):
    """q [BQ,nh,Lp,hd]; k/v [BK,nh,Kp,hd]; kmask [BK,1,Kp] f32.

    Returns (out [BQ,nh,Lp,hd] f32, lse [BQ,nh,Lp,1] f32).  BK = BQ // div;
    each group of `div` consecutive q-batch rows shares k/v/kmask."""
    bq_, nh, lp, hd = q.shape
    kp = k.shape[2]
    blq, bkv = _block(lp), _block(kp)
    kw = dict(memory_space=pltpu.VMEM)
    grid = (bq_, nh, lp // blq, kp // bkv)
    qmap = lambda b, h, i, t: (b, h, i, 0)            # noqa: E731
    kmap = lambda b, h, i, t: (b // div, h, t, 0)     # noqa: E731
    mmap = lambda b, h, i, t: (b // div, 0, t)        # noqa: E731
    omap = lambda b, h, i, t: (b, h, i, 0)            # noqa: E731
    kernel = functools.partial(_fwd_kernel, scale=scale, causal=causal,
                               blq=blq, bkv=bkv)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, blq, hd), qmap, **kw),
            pl.BlockSpec((1, 1, bkv, hd), kmap, **kw),
            pl.BlockSpec((1, 1, bkv, hd), kmap, **kw),
            pl.BlockSpec((1, 1, bkv), mmap, **kw),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, blq, hd), omap, **kw),
            pl.BlockSpec((1, 1, blq, 1), omap, **kw),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bq_, nh, lp, hd), jnp.float32),
            jax.ShapeDtypeStruct((bq_, nh, lp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((blq, 1), jnp.float32),
            pltpu.VMEM((blq, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bq_ * nh * lp * kp * hd,
            bytes_accessed=4 * bq_ * nh * (lp + kp // div) * hd * 2,
            transcendentals=bq_ * nh * lp * kp,
        ),
        interpret=_INTERPRET,
    )(q, k, v, kmask)
    return out, lse


# ---------------------------------------------------------------------------
# backward kernels (one branch each; fed the GLOBAL lse/delta)
# ---------------------------------------------------------------------------

def _dq_kernel(q_ref, k_ref, v_ref, kmask_ref, g_ref, lse_ref, delta_ref,
               dq_ref, *, scale, causal, blq, bkv):
    t = pl.program_id(3)
    lqb = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        dq_ref[0, 0] = jnp.zeros_like(dq_ref[0, 0])

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    kmask = kmask_ref[0] > 0                              # [1, bkv]
    s = jnp.where(kmask, s, NEG)
    if causal:
        rows = lqb * blq + jax.lax.broadcasted_iota(jnp.int32, (blq, bkv), 0)
        cols = t * bkv + jax.lax.broadcasted_iota(jnp.int32, (blq, bkv), 1)
        s = jnp.where(cols <= rows, s, NEG)
    p = jnp.exp(s - lse_ref[0, 0])                       # global probs
    g = g_ref[0, 0]
    dp = jax.lax.dot_general(g, v_ref[0, 0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0, 0]) * scale
    dq_ref[0, 0] = dq_ref[0, 0] + jnp.dot(
        ds.astype(k.dtype), k, preferred_element_type=jnp.float32)


def _dq_call(q, k, v, kmask, g, lse, delta, *, scale, causal, div):
    bq_, nh, lp, hd = q.shape
    kp = k.shape[2]
    blq, bkv = _block(lp), _block(kp)
    kw = dict(memory_space=pltpu.VMEM)
    grid = (bq_, nh, lp // blq, kp // bkv)
    qmap = lambda b, h, i, t: (b, h, i, 0)            # noqa: E731
    kmap = lambda b, h, i, t: (b // div, h, t, 0)     # noqa: E731
    mmap = lambda b, h, i, t: (b // div, 0, t)        # noqa: E731
    kernel = functools.partial(_dq_kernel, scale=scale, causal=causal,
                               blq=blq, bkv=bkv)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, blq, hd), qmap, **kw),
            pl.BlockSpec((1, 1, bkv, hd), kmap, **kw),
            pl.BlockSpec((1, 1, bkv, hd), kmap, **kw),
            pl.BlockSpec((1, 1, bkv), mmap, **kw),
            pl.BlockSpec((1, 1, blq, hd), qmap, **kw),
            pl.BlockSpec((1, 1, blq, 1), qmap, **kw),
            pl.BlockSpec((1, 1, blq, 1), qmap, **kw),
        ],
        out_specs=pl.BlockSpec((1, 1, blq, hd), qmap, **kw),
        out_shape=jax.ShapeDtypeStruct((bq_, nh, lp, hd), jnp.float32),
        scratch_shapes=[],
        interpret=_INTERPRET,
    )(q, k, v, kmask, g, lse, delta)


def _dkv_kernel(q_ref, k_ref, v_ref, kmask_ref, g_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, scale, causal, blq, bkv, n_lq):
    s_id = pl.program_id(3)
    kvb = pl.program_id(2)

    @pl.when(s_id == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    kmask = kmask_ref[0] > 0                              # [1, bkv]
    s = jnp.where(kmask, s, NEG)
    if causal:
        lqb = s_id % n_lq
        rows = lqb * blq + jax.lax.broadcasted_iota(jnp.int32, (blq, bkv), 0)
        cols = kvb * bkv + jax.lax.broadcasted_iota(jnp.int32, (blq, bkv), 1)
        s = jnp.where(cols <= rows, s, NEG)
    p = jnp.exp(s - lse_ref[0, 0])
    g = g_ref[0, 0]
    dv_ref[0, 0] = dv_ref[0, 0] + jax.lax.dot_general(
        p.astype(g.dtype), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(g, v_ref[0, 0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0, 0]) * scale
    dk_ref[0, 0] = dk_ref[0, 0] + jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _dkv_call(q, k, v, kmask, g, lse, delta, *, scale, causal, div):
    """dk/dv for one branch; accumulates over the div*n_lq query-row blocks
    that attend to each KV block (for the prefix branch that spans all Q
    query songs of the episode — the prefix grads sum across the group)."""
    bq_, nh, lp, hd = q.shape
    bk_ = k.shape[0]
    kp = k.shape[2]
    blq, bkv = _block(lp), _block(kp)
    n_lq = lp // blq
    kw = dict(memory_space=pltpu.VMEM)
    grid = (bk_, nh, kp // bkv, div * n_lq)
    qmap = lambda b, h, t, s: (b * div + s // n_lq, h, s % n_lq, 0)  # noqa: E731,E501
    kmap = lambda b, h, t, s: (b, h, t, 0)            # noqa: E731
    mmap = lambda b, h, t, s: (b, 0, t)               # noqa: E731
    omap = lambda b, h, t, s: (b, h, t, 0)            # noqa: E731
    kernel = functools.partial(_dkv_kernel, scale=scale, causal=causal,
                               blq=blq, bkv=bkv, n_lq=n_lq)
    dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, blq, hd), qmap, **kw),
            pl.BlockSpec((1, 1, bkv, hd), kmap, **kw),
            pl.BlockSpec((1, 1, bkv, hd), kmap, **kw),
            pl.BlockSpec((1, 1, bkv), mmap, **kw),
            pl.BlockSpec((1, 1, blq, hd), qmap, **kw),
            pl.BlockSpec((1, 1, blq, 1), qmap, **kw),
            pl.BlockSpec((1, 1, blq, 1), qmap, **kw),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bkv, hd), omap, **kw),
            pl.BlockSpec((1, 1, bkv, hd), omap, **kw),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bk_, nh, kp, hd), jnp.float32),
            jax.ShapeDtypeStruct((bk_, nh, kp, hd), jnp.float32),
        ],
        scratch_shapes=[],
        interpret=_INTERPRET,
    )(q, k, v, kmask, g, lse, delta)
    return dk, dv


# ---------------------------------------------------------------------------
# custom-VJP wrapper: cross (shared prefix) + self (causal), lse-stitched
# ---------------------------------------------------------------------------

def _combine(out_c, lse_c, out_s, lse_s):
    m = jnp.maximum(lse_c, lse_s)
    lse = m + jnp.log(jnp.exp(lse_c - m) + jnp.exp(lse_s - m))
    wc = jnp.exp(lse_c - lse)
    ws = jnp.exp(lse_s - lse)
    return wc * out_c + ws * out_s, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _prefix_flash(qq, qk, qv, pk, pv, qmask, pmask, scale, div):
    out, _ = _prefix_flash_fwd(qq, qk, qv, pk, pv, qmask, pmask, scale, div)
    return out


def _prefix_flash_fwd(qq, qk, qv, pk, pv, qmask, pmask, scale, div):
    out_c, lse_c = _fwd_call(qq, pk, pv, pmask, scale=scale, causal=False,
                             div=div)
    out_s, lse_s = _fwd_call(qq, qk, qv, qmask, scale=scale, causal=True,
                             div=1)
    out, lse = _combine(out_c, lse_c, out_s, lse_s)
    return out, (qq, qk, qv, pk, pv, qmask, pmask, out, lse)


def _prefix_flash_bwd(scale, div, res, g):
    qq, qk, qv, pk, pv, qmask, pmask, out, lse = res
    g = g.astype(jnp.float32)
    delta = jnp.sum(g * out, axis=-1, keepdims=True)     # [BQ,nh,Lp,1]
    gc = g.astype(qq.dtype)
    dq_c = _dq_call(qq, pk, pv, pmask, gc, lse, delta, scale=scale,
                    causal=False, div=div)
    dq_s = _dq_call(qq, qk, qv, qmask, gc, lse, delta, scale=scale,
                    causal=True, div=1)
    dpk, dpv = _dkv_call(qq, pk, pv, pmask, gc, lse, delta, scale=scale,
                         causal=False, div=div)
    dqk, dqv = _dkv_call(qq, qk, qv, qmask, gc, lse, delta, scale=scale,
                         causal=True, div=1)
    dt = qq.dtype
    return ((dq_c + dq_s).astype(dt), dqk.astype(dt), dqv.astype(dt),
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
    out, lse = _fwd_call(q, k, v, kmask, scale=scale, causal=True, div=1)
    return out, (q, k, v, kmask, out, lse)


def _causal_flash_bwd(scale, res, g):
    q, k, v, kmask, out, lse = res
    g32 = g.astype(jnp.float32)
    delta = jnp.sum(g32 * out, axis=-1, keepdims=True)
    gc = g32.astype(q.dtype)
    dq = _dq_call(q, k, v, kmask, gc, lse, delta, scale=scale, causal=True,
                  div=1)
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
