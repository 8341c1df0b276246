"""Causal self-attention dispatch: fused TPU flash kernel or XLA fallback.

The transformer's materialized score tensors are its HBM hog ([B, h, T, T]
fp32 per layer, ROADMAP.md).  On TPU this routes through JAX's shipped
Pallas flash-attention kernel (jax.experimental.pallas.ops.tpu), which
never materializes scores and has a fused custom-VJP backward.  Ragged
(padding) masks map onto flash segment ids: real tokens get segment 1, pads
segment 0, so pads and real tokens never attend across.  Sequence lengths
are padded to the kernel's block multiple and sliced back.

Off-TPU (the CPU test mesh) or when cfg.flash is off, the plain einsum path
runs — numerically the reference implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30
_BLOCK = 128


def _einsum_attention(q, k, v, mask):
    """Reference path.  q/k/v [B, T, nh, hd]; mask [B, T] bool or None."""
    b, t, nh, hd = q.shape
    causal = jnp.tril(jnp.ones((t, t), jnp.bool_))
    bias = jnp.where(causal, 0.0, NEG_INF)[None, None]
    if mask is not None:
        bias = bias + jnp.where(mask, 0.0, NEG_INF)[:, None, None, :]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(hd)) + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, t, nh * hd)


def _flash_attention(q, k, v, mask):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)
    b, t, nh, hd = q.shape
    pad = (-t) % _BLOCK
    tp = t + pad
    dt = q.dtype

    def to_flash(x):   # [B, T, nh, hd] -> [B, nh, Tp, hd]
        x = jnp.swapaxes(x, 1, 2)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x

    seg = (mask.astype(jnp.int32) if mask is not None
           else jnp.ones((b, t), jnp.int32))
    if pad:
        seg = jnp.pad(seg, ((0, 0), (0, pad)))  # pads get segment 0
    seg_ids = SegmentIds(q=seg, kv=seg)

    out = flash_attention(to_flash(q), to_flash(k), to_flash(v),
                          segment_ids=seg_ids, causal=True,
                          sm_scale=1.0 / float(hd) ** 0.5)
    out = jnp.swapaxes(out, 1, 2)[:, :t]        # [B, T, nh, hd]
    return out.reshape(b, t, nh * hd).astype(dt)


def causal_attention(q, k, v, mask, use_flash: bool) -> jax.Array:
    """q/k/v [B, T, nh, hd], mask [B, T] bool (True = real) or None.

    Returns [B, T, nh*hd].  use_flash routes to the fused kernel when the
    default backend is a TPU; callers pass cfg.flash.
    """
    if use_flash and jax.default_backend() in ("tpu", "axon"):
        return _flash_attention(q, k, v, mask)
    return _einsum_attention(q, k, v, mask)
