"""Few-shot generation: support-primed ancestral/top-k sampling, on device.

Reference equivalent (SURVEY.md §4.3): the original primes the LSTM on the
support set then does ONE `sess.run` + host softmax + numpy choice PER TOKEN.
Here the whole continuation is a single `lax.scan` inside one jitted program
(BASELINE.json:5 "no host round-trips per token"): the carry holds the model
state (LSTM (h, c) or transformer KV cache), the current token, and the PRNG
key; temperature and top-k filtering run on the fp32 logits in-carry via
`jax.lax.top_k`.

Semantics (matching the reference's sampler):
  * temperature scales logits BEFORE top-k truncation;
  * top_k == 0 means full ancestral sampling;
  * generation starts from BOS after the support prime and stops emitting at
    EOS — positions after EOS are PAD so detokenizers can ignore them.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from fewshot.data.vocab import BOS, EOS, PAD
from fewshot.models import lm as lm_mod
from fewshot.models import lstm as lstm_mod
from fewshot.models import transformer as tfm_mod


def filtered_sample(key: jax.Array, logits: jax.Array, temperature,
                    top_k: int, top_p: float = 0.0) -> jax.Array:
    """Sample token ids [B] from logits [B, V].

    temperature may be a traced scalar OR a per-row [B] vector (the serving
    batcher mixes requests with different temperatures in one program);
    top_k/top_p are static.  top_k > 0 keeps the k best; top_p in (0, 1)
    additionally applies nucleus filtering (smallest set with cumulative
    probability >= top_p).  Both 0 => full ancestral sampling."""
    logits = logits.astype(jnp.float32)
    temperature = jnp.asarray(temperature, jnp.float32)
    if temperature.ndim == 1:
        temperature = temperature[:, None]
    logits = logits / jnp.maximum(temperature, 1e-6)
    if top_k > 0 and top_k < logits.shape[-1]:
        vals, _ = jax.lax.top_k(logits, top_k)
        logits = jnp.where(logits < vals[..., -1:], -jnp.inf, logits)
    if 0.0 < top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens up to (and including) the one crossing top_p
        keep = cum - probs < top_p
        cutoff = jnp.min(jnp.where(keep, sorted_logits, jnp.inf),
                         axis=-1, keepdims=True)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    if key.ndim == 2:     # per-row keys: draws independent of batch layout
        return jax.vmap(lambda kk, lg: jax.random.categorical(kk, lg))(
            key, logits)
    return jax.random.categorical(key, logits, axis=-1)


def _run_decode(one_step, init, xs, b: int, n_tokens: int,
                early_exit: bool) -> jax.Array:
    """Drive a per-token decode step to completion.

    early_exit=True: lax.while_loop that stops once EVERY row has emitted
    EOS — short completions at serving batch sizes stop paying the full
    n_tokens budget.  Unvisited positions keep their PAD init, so output
    is bit-identical to the full scan's.
    early_exit=False: lax.scan — XLA pipelines the fixed-trip loop better
    (~25% higher full-length throughput), right for offline batch
    sampling where rows rarely finish early.
    """

    def get_x(xs, i):
        return jax.tree.map(lambda a: a[i], xs)

    if not early_exit:
        def step(carry, x):
            carry = one_step(*carry, x)
            return carry, carry[1]

        _, toks = jax.lax.scan(step, init, xs)
        return jnp.swapaxes(toks, 0, 1)                 # [B, n]

    def cond(carry):
        _state, _tok, done, _phase, i, _toks = carry
        return (i < n_tokens) & ~jnp.all(done)

    def body(carry):
        state, tok, done, phase, i, toks = carry
        state, nxt, done, phase = one_step(state, tok, done, phase,
                                           get_x(xs, i))
        toks = jax.lax.dynamic_update_slice(toks, nxt[:, None], (0, i))
        return (state, nxt, done, phase, i + 1, toks)

    carry = jax.lax.while_loop(
        cond, body, (*init, jnp.int32(0),
                     jnp.full((b, n_tokens), PAD, jnp.int32)))
    return carry[-1]                                    # [B, n]


def _cache_ctx(params: dict, support: jax.Array, support_len: jax.Array,
               cfg):
    """None, or the cache-head context for the decode loop.

    Static cache: the [B, V] support posterior, fixed over the rollout.
    cfg.cache_dynamic: the posterior parts (phi, total, s, p_global); the
    decode loop carries its own emitted-token counts and recomputes the
    posterior each step — generation mirrors the continuous-cache NLL
    (lm.dynamic_cache_target_logp) the model trains under."""
    if not cfg.support_cache:
        return None
    v = params["out_b"].shape[0]
    if cfg.cache_dynamic:
        return ("dynamic",) + lm_mod.cache_posterior_parts(
            params, support, support_len, v)
    return ("static",
            lm_mod.support_log_cache(params, support, support_len, v))


def _dynamic_log_cache(ctx, c_pre, n_pre):
    _, phi, total, s, p_global = ctx
    return (jnp.log(phi + c_pre + s * p_global[None])
            - jnp.log(total + n_pre + s))


def _count_emitted(c_pre, n_pre, nxt):
    """Add the just-emitted token to the carried prefix counts (finished
    rows emit PAD, which must not count — PAD is a real row id)."""
    v = c_pre.shape[-1]
    live = (nxt != PAD).astype(jnp.float32)
    c_pre = c_pre + jax.nn.one_hot(nxt, v, dtype=jnp.float32) \
        * live[:, None]
    return c_pre, n_pre + live[:, None]


@partial(jax.jit, static_argnames=("cfg", "n_tokens", "early_exit"))
def sample_lstm(params: dict, support: jax.Array, support_len: jax.Array,
                key: jax.Array, cfg, n_tokens: int,
                token_masks: jax.Array | None = None,
                temperature: jax.Array | None = None,
                early_exit: bool = True) -> jax.Array:
    """LSTM few-shot continuation.  support [B, K, L] -> tokens [B, n].

    token_masks [P, V] (optional): per-phase legal-token masks cycled every
    emission — the MIDI event grammar (fewshot.data.midi.grammar_masks)."""
    b = support.shape[0]
    temp = (jnp.float32(cfg.temperature) if temperature is None
            else temperature)
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    # Per-ROW keys throughout: a row's draws depend only on its own key,
    # never on its position in the batch (the serving batcher coalesces
    # unrelated requests into one call).
    keys = key if key.ndim == 2 else jax.random.split(key, b)
    if cfg.support_mode in ("state", "mean_state"):
        state = lm_mod.support_state(params, support, support_len, cfg,
                                     eval_mode=True)
    else:
        state = lstm_mod.zero_state(b, cfg.hidden_dim, cfg.num_layers)

    # all per-step per-row keys in ONE batched threefry op (a per-step
    # vmapped split halved generation throughput)
    step_keys = jnp.swapaxes(
        jax.vmap(lambda k: jax.random.split(k, n_tokens))(keys), 0, 1)
    ctx = _cache_ctx(params, support, support_len, cfg)
    dynamic = ctx is not None and ctx[0] == "dynamic"

    def one_step(carry, tok, done, phase, sub):
        if dynamic:
            state, c_pre, n_pre = carry
        else:
            state = carry
        x = lm_mod.embed(params, tok)
        h, state = lstm_mod.lstm_step(params["lstm"], x, state, dt)
        logits = lm_mod.head_logits(params, h, cfg)
        if ctx is not None:
            # sample from the SAME mixture the NLL scores (cache head)
            log_cache = (_dynamic_log_cache(ctx, c_pre, n_pre)
                         if dynamic else ctx[1])
            logits = lm_mod.cache_mixed_logp(params, logits, h, log_cache)
        if token_masks is not None:
            logits = jnp.where(token_masks[phase], logits, -jnp.inf)
        nxt = filtered_sample(sub, logits, temp, cfg.top_k, cfg.top_p)
        nxt = jnp.where(done, PAD, nxt)
        done = done | (nxt == EOS)
        n_phases = token_masks.shape[0] if token_masks is not None else 1
        phase = jnp.where(done, phase, (phase + 1) % n_phases)
        if dynamic:
            c_pre, n_pre = _count_emitted(c_pre, n_pre, nxt)
            state = (state, c_pre, n_pre)
        return state, nxt, done, phase

    if dynamic:
        v = params["out_b"].shape[0]
        state = (state, jnp.zeros((b, v), jnp.float32),
                 jnp.zeros((b, 1), jnp.float32))
    init = (state, jnp.full((b,), BOS, jnp.int32),
            jnp.zeros((b,), jnp.bool_), jnp.zeros((b,), jnp.int32))
    return _run_decode(one_step, init, step_keys, b, n_tokens, early_exit)


@partial(jax.jit, static_argnames=("cfg", "n_tokens", "early_exit"))
def sample_transformer(params: dict, support: jax.Array,
                       support_len: jax.Array, key: jax.Array, cfg,
                       n_tokens: int,
                       token_masks: jax.Array | None = None,
                       temperature: jax.Array | None = None,
                       early_exit: bool = True) -> jax.Array:
    """Transformer few-shot continuation via prefix KV-cache decode."""
    b, k_, l_ = support.shape
    temp = (jnp.float32(cfg.temperature) if temperature is None
            else temperature)
    keys = key if key.ndim == 2 else jax.random.split(key, b)
    use_prefix = cfg.support_mode in ("state", "mean_state")
    prefix_len = k_ * l_ if use_prefix else 0
    max_len = prefix_len + n_tokens + 1
    cache = tfm_mod.init_kv_cache(cfg, b, max_len)
    tparams = params["transformer"]
    if use_prefix:
        flat = support.reshape(b, prefix_len)
        mask = (jnp.arange(l_) < support_len[..., None]).reshape(b,
                                                                 prefix_len)
        cache = tfm_mod.prefill(tparams, lm_mod.embed(params, flat), mask,
                                cache, cfg)

    step_keys = jnp.swapaxes(
        jax.vmap(lambda k: jax.random.split(k, n_tokens))(keys), 0, 1)
    ctx = _cache_ctx(params, support, support_len, cfg)
    dynamic = ctx is not None and ctx[0] == "dynamic"

    def one_step(carry, tok, done, phase, i_sub):
        if dynamic:
            cache, c_pre, n_pre = carry
        else:
            cache = carry
        i, sub = i_sub
        x = lm_mod.embed(params, tok)
        h, cache = tfm_mod.transformer_step(tparams, x, cache,
                                            prefix_len + i, cfg)
        logits = lm_mod.head_logits(params, h, cfg)
        if ctx is not None:
            # sample from the SAME mixture the NLL scores (cache head)
            log_cache = (_dynamic_log_cache(ctx, c_pre, n_pre)
                         if dynamic else ctx[1])
            logits = lm_mod.cache_mixed_logp(params, logits, h, log_cache)
        if token_masks is not None:
            logits = jnp.where(token_masks[phase], logits, -jnp.inf)
        nxt = filtered_sample(sub, logits, temp, cfg.top_k, cfg.top_p)
        nxt = jnp.where(done, PAD, nxt)
        done = done | (nxt == EOS)
        n_phases = token_masks.shape[0] if token_masks is not None else 1
        phase = jnp.where(done, phase, (phase + 1) % n_phases)
        if dynamic:
            c_pre, n_pre = _count_emitted(c_pre, n_pre, nxt)
            cache = (cache, c_pre, n_pre)
        return cache, nxt, done, phase

    if dynamic:
        v = params["out_b"].shape[0]
        cache = (cache, jnp.zeros((b, v), jnp.float32),
                 jnp.zeros((b, 1), jnp.float32))
    init = (cache, jnp.full((b,), BOS, jnp.int32),
            jnp.zeros((b,), jnp.bool_), jnp.zeros((b,), jnp.int32))
    return _run_decode(one_step, init,
                       (jnp.arange(n_tokens), step_keys), b, n_tokens,
                       early_exit)


@partial(jax.jit, static_argnames=("cfg",))
def _finetune_adapt(params: dict, support: jax.Array,
                    support_len: jax.Array, cfg):
    """Per-episode inner SGD on the support set -> stacked adapted params
    [B, ...] (mirrors models.lm.finetune_episodic_nll_stats's inner loop)."""
    from fewshot.models.lm import lm_logits, sequence_nll, shift_targets

    def adapt(sup, slen):
        def support_loss(p):
            inputs, targets, mask = shift_targets(sup, slen)
            logits, _ = lm_logits(p, inputs, cfg, mask=mask)
            return sequence_nll(logits, targets, mask)
        p = params
        for _ in range(cfg.inner_steps):
            g = jax.grad(support_loss)(p)
            p = jax.tree.map(lambda w, gw: w - cfg.inner_lr * gw, p, g)
        return p

    return jax.vmap(adapt)(support, support_len)


def generate(params: dict, support: jax.Array, support_len: jax.Array,
             key: jax.Array, cfg, n_tokens: int | None = None,
             token_masks: jax.Array | None = None,
             temperature=None, early_exit: bool = True) -> jax.Array:
    """Support-conditioned continuations.

    key: a single PRNG key OR a [B, 2] batch of per-row keys; with per-row
    keys, row i's continuation depends only on its own key (batching-
    position invariant — the serving batcher relies on this).
    temperature: optional traced scalar or [B] vector overriding
    cfg.temperature — per-request control with zero recompiles.
    early_exit: stop decoding once all rows hit EOS (lax.while_loop —
    serving latency); False uses lax.scan (better pipelining for
    full-length offline sampling).  Outputs are bit-identical.

    support_mode="finetune": the support set conditions generation by
    per-episode inner SGD (as in training/eval), then each episode samples
    under its own adapted parameters (vmapped)."""
    n = n_tokens if n_tokens is not None else cfg.sample_tokens
    fn = sample_lstm if cfg.model == "lstm" else sample_transformer
    if temperature is not None:
        temperature = jnp.asarray(temperature, jnp.float32)

    if cfg.support_mode == "finetune":
        b = support.shape[0]
        adapted = _finetune_adapt(params, support, support_len, cfg)
        keys = key if key.ndim == 2 else jax.random.split(key, b)
        temps = (None if temperature is None
                 else jnp.broadcast_to(temperature, (b,)))

        def one(p_row, sup_row, slen_row, key_row, temp_row):
            t = None if temps is None else temp_row[None]
            return fn(p_row, sup_row[None], slen_row[None], key_row[None],
                      cfg, n, token_masks, t, early_exit)[0]

        if temps is None:
            return jax.vmap(lambda p, su, sl, k: one(p, su, sl, k, None))(
                adapted, support, support_len, keys)
        return jax.vmap(one)(adapted, support, support_len, keys, temps)

    return fn(params, support, support_len, key, cfg, n, token_masks,
              temperature, early_exit)
