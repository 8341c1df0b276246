"""Transformer-decoder baseline (config #4, BASELINE.json:10), TPU-first.

Reference parity note: the reference repo has no transformer — this baseline
is mandated by the north star (BASELINE.json:10 "Transformer-decoder baseline
on MIDI episodes, vmapped meta-batch training"), so its design is free to be
idiomatic: pre-norm RMSNorm blocks, fused QKV projection, RoPE positions,
fp32 softmax, bf16 matmuls under `compute_dtype: bfloat16`.

Episodic conditioning: the K support songs form an attention PREFIX.  Its
per-layer hidden states are computed ONCE per episode (causal self-attention
over the prefix) and each of the Q query songs attends to (prefix ++ itself)
— a Q-fold saving over recomputing the support context per query song, which
is how a naive concat would run.

Incremental decoding for `sample` uses a static-shape KV cache
(`init_kv_cache` / `transformer_step`): one fused program per generated
token, zero host round-trips (SURVEY.md §4.3's per-token sess.run is the
anti-pattern this kills).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _dt(cfg):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def init_transformer_params(key: jax.Array, cfg) -> dict:
    e = cfg.embed_dim
    f = cfg.mlp_ratio * e
    glorot = jax.nn.initializers.glorot_uniform()
    layers = []
    for _ in range(cfg.num_layers):
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        layers.append({
            "ln1": jnp.ones((e,), jnp.float32),
            "wqkv": glorot(k1, (e, 3 * e), jnp.float32),
            "wo": glorot(k2, (e, e), jnp.float32),
            "ln2": jnp.ones((e,), jnp.float32),
            "w1": glorot(k3, (e, f), jnp.float32),
            "w2": glorot(k4, (f, e), jnp.float32),
        })
    return {"layers": layers, "ln_f": jnp.ones((e,), jnp.float32)}


def rmsnorm(x: jax.Array, scale: jax.Array) -> jax.Array:
    x32 = x.astype(jnp.float32)
    rms = jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + 1e-6)
    return (x32 * rms * scale).astype(x.dtype)


def rope(x: jax.Array, positions: jax.Array) -> jax.Array:
    """Rotary embedding, rotate-half convention.

    x [..., T, n_heads, head_dim], positions [..., T].  Pairs lane i with
    lane i + hd/2 (contiguous halves, the Llama/NeoX layout) instead of the
    even/odd interleave: on TPU the interleave lowers to strided
    [..., hd/2, 2] splits + minor-dim relayout copies on every q/k of every
    layer — the r5 trace audit measured the whole "data formatting" bucket
    at ~19% of transformer step time, with these copies a visible slice.
    Both conventions are exact RoPE (a fixed lane permutation apart);
    the pairing only has to match between q and k, which it does.
    """
    hd = x.shape[-1]
    freqs = 1.0 / (10000.0 ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    angles = positions[..., None].astype(jnp.float32) * freqs   # [..., T, hd/2]
    angles = angles[..., None, :]                               # heads axis
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    x1, x2 = x[..., : hd // 2], x[..., hd // 2:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _qkv(layer, x, positions, cfg):
    """x [B, T, E] -> q, k, v each [B, T, nh, hd] with RoPE applied to q, k."""
    dt = _dt(cfg)
    b, t, e = x.shape
    nh = cfg.num_heads
    hd = e // nh
    qkv = jnp.dot(rmsnorm(x, layer["ln1"]).astype(dt),
                  layer["wqkv"].astype(dt),
                  preferred_element_type=jnp.float32)
    q, k, v = jnp.split(qkv.astype(dt), 3, axis=-1)
    q = rope(q.reshape(b, t, nh, hd), positions)
    k = rope(k.reshape(b, t, nh, hd), positions)
    return q, k, v.reshape(b, t, nh, hd)


def _attend(q, k, v, bias):
    """q [B,Tq,nh,hd], k/v [B,Tk,nh,hd], bias [B,1,Tq,Tk] -> [B,Tq,nh*hd]."""
    b, tq, nh, hd = q.shape
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(hd)) + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, tq, nh * hd)


def _mlp(layer, x, cfg):
    dt = _dt(cfg)
    h = jnp.dot(rmsnorm(x, layer["ln2"]).astype(dt), layer["w1"].astype(dt),
                preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h)
    return jnp.dot(h.astype(dt), layer["w2"].astype(dt),
                   preferred_element_type=jnp.float32)


def transformer_forward(params: dict, x: jax.Array,
                        mask: jax.Array | None, cfg) -> jax.Array:
    """x [B, T, E] embeddings -> hidden [B, T, E] (pre-head)."""
    from fewshot.ops.attention import causal_attention
    b, t, e = x.shape
    dt = _dt(cfg)
    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    h = x.astype(dt)

    def block(h, layer):
        q, k, v = _qkv(layer, h, positions, cfg)
        attn = causal_attention(q, k, v, mask, cfg.flash)
        h = h + jnp.dot(attn.astype(dt), layer["wo"].astype(dt),
                        preferred_element_type=jnp.float32).astype(dt)
        return h + _mlp(layer, h, cfg).astype(dt)

    if cfg.remat:
        block = jax.checkpoint(block)
    for layer in params["layers"]:
        h = block(h, layer)
    return rmsnorm(h, params["ln_f"])


def transformer_prefix_forward(params: dict, prefix_x: jax.Array,
                               prefix_mask: jax.Array, query_x: jax.Array,
                               query_mask: jax.Array, cfg) -> jax.Array:
    """Episodic forward: prefix context computed once, shared by Q queries.

    prefix_x [B, P, E], prefix_mask [B, P] — the support concat.
    query_x  [B, Q, Lq, E], query_mask [B, Q, Lq] — query songs.
    Returns hidden [B, Q, Lq, E].
    """
    b, p, e = prefix_x.shape
    _, q_, lq, _ = query_x.shape
    dt = _dt(cfg)

    from fewshot.ops.attention import causal_attention
    from fewshot.ops.prefix_attention import (causal_self_attention_flash,
                                              episodic_attention,
                                              fused_available)
    pos_p = jnp.broadcast_to(jnp.arange(p), (b, p))
    # Query songs restart positions after the prefix.
    pos_q = jnp.broadcast_to(jnp.arange(lq) + p, (b, q_, lq))

    hp = prefix_x.astype(dt)
    hq = query_x.astype(dt)
    fused = fused_available(cfg.prefix_flash)

    def block(hp, hq, layer):
        # Prefix stream (causal self-attention) — once per episode.  At
        # P = K*L the einsum's [B, h, P, P] scores are the transformer
        # tier's LARGEST materialization (472MB/layer at config #4), so
        # this routes through the same fused kernels (single causal
        # branch) whenever the episodic kernel is on.
        pq, pk, pv = _qkv(layer, hp, pos_p, cfg)
        p_attn = (causal_self_attention_flash(pq, pk, pv, prefix_mask)
                  if fused
                  else causal_attention(pq, pk, pv, prefix_mask, cfg.flash))
        hp_next = hp + jnp.dot(p_attn.astype(dt), layer["wo"].astype(dt),
                               preferred_element_type=jnp.float32).astype(dt)
        hp_next = hp_next + _mlp(layer, hp_next, cfg).astype(dt)

        # Query stream: attends to prefix K/V (this layer's) ++ itself —
        # the fused kernel (ops/prefix_attention.py) shares the prefix K/V
        # across the episode's Q songs and never materializes the
        # [B, Q, h, Lq, P+Lq] score tensor the einsum reference builds.
        flat_q = hq.reshape(b * q_, lq, e)
        pos_flat = pos_q.reshape(b * q_, lq)
        qq, qk, qv = _qkv(layer, flat_q, pos_flat, cfg)
        nh, hd = cfg.num_heads, e // cfg.num_heads
        qq = qq.reshape(b, q_, lq, nh, hd)
        qk = qk.reshape(b, q_, lq, nh, hd)
        qv = qv.reshape(b, q_, lq, nh, hd)

        attn = episodic_attention(qq, qk, qv, pk, pv, query_mask,
                                  prefix_mask, cfg.prefix_flash)
        attn = attn.reshape(b, q_, lq, e)
        hq = hq + jnp.dot(attn.astype(dt), layer["wo"].astype(dt),
                          preferred_element_type=jnp.float32).astype(dt)
        hq = hq + _mlp(layer, hq, cfg).astype(dt)
        return hp_next, hq

    if cfg.remat:
        block = jax.checkpoint(block)
    for layer in params["layers"]:
        hp, hq = block(hp, hq, layer)
    return rmsnorm(hq, params["ln_f"])


# ---------------------------------------------------------------------------
# KV-cache incremental decoding (sampling path)
# ---------------------------------------------------------------------------

def init_kv_cache(cfg, batch: int, max_len: int) -> dict:
    nh = cfg.num_heads
    hd = cfg.embed_dim // nh
    dt = _dt(cfg)
    return {
        "k": jnp.zeros((cfg.num_layers, batch, max_len, nh, hd), dt),
        "v": jnp.zeros((cfg.num_layers, batch, max_len, nh, hd), dt),
        "valid": jnp.zeros((batch, max_len), jnp.bool_),
    }


def prefill(params: dict, x: jax.Array, mask: jax.Array | None, cache: dict,
            cfg) -> dict:
    """Fill the KV cache with a (support) prefix in ONE forward pass.

    x [B, P, E], mask [B, P]; writes K/V for positions [0, P) and marks the
    valid slots.  Decode then continues from idx = P via transformer_step.
    """
    from fewshot.ops.attention import causal_attention
    from fewshot.ops.prefix_attention import (causal_self_attention_flash,
                                              fused_available)
    b, p, e = x.shape
    dt = _dt(cfg)
    positions = jnp.broadcast_to(jnp.arange(p), (b, p))
    h = x.astype(dt)
    fused = fused_available(cfg.prefix_flash)
    ks, vs = [], []
    for layer in params["layers"]:
        q, k, v = _qkv(layer, h, positions, cfg)
        ks.append(k.astype(dt))
        vs.append(v.astype(dt))
        attn = (causal_self_attention_flash(q, k, v, mask) if fused
                else causal_attention(q, k, v, mask, cfg.flash))
        h = h + jnp.dot(attn.astype(dt), layer["wo"].astype(dt),
                        preferred_element_type=jnp.float32).astype(dt)
        h = h + _mlp(layer, h, cfg).astype(dt)
    new_k = jax.lax.dynamic_update_slice(
        cache["k"], jnp.stack(ks), (0, 0, 0, 0, 0))
    new_v = jax.lax.dynamic_update_slice(
        cache["v"], jnp.stack(vs), (0, 0, 0, 0, 0))
    valid = cache["valid"].at[:, :p].set(
        mask if mask is not None else jnp.ones((b, p), jnp.bool_))
    return {"k": new_k, "v": new_v, "valid": valid}


def transformer_step(params: dict, x_t: jax.Array, cache: dict,
                     idx: jax.Array, cfg) -> tuple[jax.Array, dict]:
    """One decode step.  x_t [B, E] at position idx; returns (hidden, cache).

    The cache holds K/V for positions < idx; `valid` masks pad slots so a
    support prefix with padding can be pre-filled with `prefill`.
    """
    b, e = x_t.shape
    nh, hd = cfg.num_heads, e // cfg.num_heads
    dt = _dt(cfg)
    h = x_t[:, None].astype(dt)                       # [B, 1, E]
    pos = jnp.full((b, 1), idx)
    valid = cache["valid"].at[:, idx].set(True)
    key_ok = valid & (jnp.arange(valid.shape[1]) <= idx)
    bias = jnp.where(key_ok, 0.0, NEG_INF)[:, None, None, :]

    new_k, new_v = [], []
    for li, layer in enumerate(params["layers"]):
        q, k, v = _qkv(layer, h, pos, cfg)
        ck = jax.lax.dynamic_update_slice(
            cache["k"][li], k.astype(dt), (0, idx, 0, 0))
        cv = jax.lax.dynamic_update_slice(
            cache["v"][li], v.astype(dt), (0, idx, 0, 0))
        new_k.append(ck)
        new_v.append(cv)
        attn = _attend(q, ck, cv, bias)
        h = h + jnp.dot(attn.astype(dt), layer["wo"].astype(dt),
                        preferred_element_type=jnp.float32).astype(dt)
        h = h + _mlp(layer, h, cfg).astype(dt)
    out = rmsnorm(h, params["ln_f"])[:, 0]
    return out, {"k": jnp.stack(new_k), "v": jnp.stack(new_v),
                 "valid": valid}
