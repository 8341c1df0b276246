"""Language-model head + masked NLL + episodic conditioning.

Reference equivalent (SURVEY.md §4.5): embedding_lookup -> backbone -> dense
softmax -> sparse CE masked by pad, mean over non-pad QUERY tokens — the
headline metric (BASELINE.json:2).  The masking semantics here are the parity-
critical part (SURVEY.md §8 hard-part #1): with a song framed as
[BOS, w1..wn, EOS, PAD...] of true length len, position t predicts token t+1,
so exactly (len-1) target positions are real; NLL is the sum of their CE
divided by their count, never counting PAD or support tokens.

Episodic conditioning (SURVEY.md §1):
  * LSTM, support_mode="state": the K support songs are concatenated along
    time (PAD steps carry state through — see models/lstm.py masking) and the
    final (h, c) primes the query-song recurrence, broadcast over the Q
    query songs of the episode.
  * Transformer: the support concat becomes an attention PREFIX whose K/V are
    computed once per episode and shared by all Q query songs
    (models/transformer.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fewshot.data.episodes import Episode
from fewshot.models import lstm as lstm_mod
from fewshot.models import transformer as tfm_mod


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_lm(key: jax.Array, cfg, vocab_size: int) -> dict:
    k_embed, k_backbone, k_head = jax.random.split(key, 3)
    e, h = cfg.embed_dim, cfg.hidden_dim
    params: dict = {
        "embed": jax.random.normal(k_embed, (vocab_size, e),
                                   jnp.float32) * 0.02,
    }
    if cfg.model == "lstm":
        params["lstm"] = lstm_mod.init_lstm_params(k_backbone, e, h,
                                                   cfg.num_layers)
        out_dim = h
    else:
        params["transformer"] = tfm_mod.init_transformer_params(
            k_backbone, cfg)
        out_dim = e
    if cfg.tie_embeddings:
        if out_dim != e:
            params["out_proj"] = jax.nn.initializers.glorot_uniform()(
                k_head, (out_dim, e), jnp.float32)
    else:
        params["out_w"] = jax.nn.initializers.glorot_uniform()(
            k_head, (out_dim, vocab_size), jnp.float32)
    params["out_b"] = jnp.zeros((vocab_size,), jnp.float32)
    if cfg.support_cache:
        # hidden-dependent mixture gate of the neural-cache head
        # (support_log_cache / cache_mixed_logp below); b=-1 starts the
        # cache weight low (~0.27) so early training is LM-dominated
        params["cache_gate"] = {"w": jnp.zeros((out_dim,), jnp.float32),
                                "b": jnp.float32(-1.0)}
        if cfg.cache_backoff == "global":
            # Learned Dirichlet-style backoff: the cache posterior smooths
            # support counts toward softmax(u) with strength softplus-free
            # exp(log_s) pseudo-counts, mirroring the episodic-unigram
            # floor's count+prior posterior (models/unigram.py) instead of
            # a uniform alpha.  Init is EXACTLY the uniform path at every
            # vocab size: u=0 -> 1/V each, s=CACHE_ALPHA*V -> s/V=alpha.
            params["cache_prior"] = {
                "u": jnp.zeros((vocab_size,), jnp.float32),
                "log_s": jnp.log(jnp.float32(CACHE_ALPHA * vocab_size)),
            }
        if cfg.cache_calib:
            # Learned count-level calibration phi(c) = exp(t[c]); init
            # t[c] = log(c) makes it the identity (pure generalization
            # lever — see cache_posterior_parts).
            params["cache_calib"] = {
                "t": jnp.log(jnp.arange(1, CACHE_CALIB_MAX + 1,
                                        dtype=jnp.float32)),
            }
            if cfg.cache_calib_freq:
                # Frequency-aware calibration: phi(c, w) = exp(t[c] +
                # a[c] * log(V * p_global(w))).  a=0 at init (and the
                # feature itself is 0 while u=0), so init is still the
                # exact identity.  The Bayes predictive of the corpus
                # generator discounts a count by how UNsurprising it is
                # under the word's global rate (a common word seen twice
                # is probably noise; a rare word seen twice is artist
                # signature) — benchmarks/bayes_bound.json measures that
                # signal worth ~0.08 nats at K=5.
                params["cache_calib"]["a"] = jnp.zeros(
                    (CACHE_CALIB_MAX,), jnp.float32)
    return params


# ---------------------------------------------------------------------------
# head
# ---------------------------------------------------------------------------

def head_logits(params: dict, hidden: jax.Array, cfg) -> jax.Array:
    """hidden [..., H] -> logits [..., V]; fp32 softmax path for parity."""
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    if cfg.tie_embeddings:
        if "out_proj" in params:
            table = params["embed"]
            h, e = params["out_proj"].shape
            v = table.shape[0]
            rows = 1
            for d in hidden.shape[:-1]:
                rows *= d
            # For small vocabs, pre-contract the tied head once per call:
            # rows x (H@E + E@V) beats rows x H@V only while V > H*E/(H-E);
            # below that, one [H, V] matmul over the (many) rows is ~3x
            # fewer FLOPs at the bench shapes.  Grads through the [H, E] x
            # [E, V] product are handled by autodiff.  The rows gate keeps
            # the per-token decode loop (rows = B) on the two-matmul path,
            # where the H*E*V precontract would dominate.
            if h > e and v < (h * e) // (h - e) and rows * (h - e) > h * e:
                w = jnp.dot(params["out_proj"].astype(dt),
                            table.T.astype(dt),
                            preferred_element_type=jnp.float32)   # [H, V]
                logits = jnp.dot(hidden.astype(dt), w.astype(dt),
                                 preferred_element_type=jnp.float32)
                return logits + params["out_b"]
            hidden = jnp.dot(hidden.astype(dt), params["out_proj"].astype(dt),
                             preferred_element_type=jnp.float32)
        logits = jnp.dot(hidden.astype(dt), params["embed"].T.astype(dt),
                         preferred_element_type=jnp.float32)
    else:
        logits = jnp.dot(hidden.astype(dt), params["out_w"].astype(dt),
                         preferred_element_type=jnp.float32)
    return logits + params["out_b"]


def fused_head_eligible(params: dict, cfg, vocab_size: int) -> bool:
    """Use the fused head+CE Pallas kernel (ops/head_ce.py)?

    Gated on cfg.cell="pallas" (the repo's Pallas-enable knob), large
    vocab (below ONEHOT_VOCAB_MAX the one-hot CE paths are already MXU
    matmuls and logits are cheap), and the kernel's VMEM plan holding for
    the head's inner dimension."""
    if cfg.cell != "pallas" or vocab_size <= ONEHOT_VOCAB_MAX:
        return False
    from fewshot.ops.head_ce import fused_head_nll_supported
    if cfg.tie_embeddings:
        d = params["embed"].shape[1]
    else:
        d = params["out_w"].shape[0]
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    return fused_head_nll_supported(d, vocab_size, dt)


def head_lse_target(params: dict, hidden: jax.Array, targets: jax.Array,
                    cfg) -> tuple[jax.Array, jax.Array]:
    """Fused per-position (logsumexp, target-logit) of the head logits.

    hidden [..., D_in], targets [...] over the same leading dims.  The
    numerics mirror head_logits' large-V path exactly: bf16 matmuls with
    fp32 accumulation, fp32 bias/softmax."""
    from fewshot.ops.head_ce import head_lse_tgt
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    if cfg.tie_embeddings:
        h2 = hidden
        if "out_proj" in params:
            h2 = jnp.dot(hidden.astype(dt), params["out_proj"].astype(dt),
                         preferred_element_type=jnp.float32)
        w = params["embed"].T
    else:
        h2 = hidden
        w = params["out_w"]
    d = w.shape[0]
    lse, tl = head_lse_tgt(h2.astype(dt).reshape(-1, d), w,
                           params["out_b"], targets.reshape(-1))
    return lse.reshape(targets.shape), tl.reshape(targets.shape)


# Below this vocab size, embedding lookup runs as a one-hot MXU matmul
# instead of gather/scatter.  Profiled on-chip (2026-08-17 trace of the
# bench step, V=104): the backward's scatter-add cost 317us/step and the
# CE token gather 148us — both serialize on TPU — while the equivalent
# one-hot matmuls are ~10us on the MXU.  Past ~1k vocab the one-hot
# FLOPs (B*T*V*E) overtake the flat scatter cost, so large-vocab corpora
# keep the gather path.
ONEHOT_VOCAB_MAX = 1024


def embed(params: dict, tokens: jax.Array) -> jax.Array:
    table = params["embed"]
    if table.shape[0] <= ONEHOT_VOCAB_MAX:
        hot = jax.nn.one_hot(tokens, table.shape[0], dtype=table.dtype)
        return jnp.dot(hot, table, preferred_element_type=jnp.float32)
    return table[tokens]


def _lstm_embed(params: dict, tokens: jax.Array, cfg,
                k_in: jax.Array | None):
    """(x, zx0) for the LSTM backbone: fold the embedding into the
    layer-0 input projection when eligible.

    zx0 = onehot @ (embed @ Wx_0) never materializes the [rows, E]
    activations — forward saves rows*(E*(V+4H) - V*4H) FLOPs and the
    backward drops BOTH big input-side matmuls (dx = dzx0 @ Wx0^T and
    dWx0 = x^T @ dzx0, each rows*E*4H) for one rows*V*4H contraction
    plus two tiny [V,4H]-sized ones.  Eligible only when V is small
    (below both the one-hot threshold and the FLOP crossover
    E*4H/(4H-E)), the row count amortizes the precontract, and embedding
    dropout is inactive (dropout on x breaks the factorization)."""
    table = params["embed"]
    v = table.shape[0]
    wx0 = params["lstm"][0]["wx"]
    e, four_h = wx0.shape
    rows = 1
    for d in tokens.shape:
        rows *= d
    drop_active = k_in is not None and cfg.dropout > 0
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    if (not drop_active and v <= ONEHOT_VOCAB_MAX and four_h > e
            and v < (e * four_h) // (four_h - e) and rows >= 512):
        w = jnp.dot(table.astype(dt), wx0.astype(dt),
                    preferred_element_type=jnp.float32)       # [V, 4H]
        hot = jax.nn.one_hot(tokens, v, dtype=dt)
        zx0 = jnp.dot(hot, w.astype(dt),
                      preferred_element_type=jnp.float32)     # [.., 4H]
        return None, zx0
    return dropout(embed(params, tokens), cfg.dropout, k_in), None


def dropout(x: jax.Array, rate: float, key: jax.Array | None) -> jax.Array:
    """Inverted dropout; identity when rate==0 or no key (eval mode)."""
    if key is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


# ---------------------------------------------------------------------------
# plain LM forward + loss (config #1, BASELINE.json:7)
# ---------------------------------------------------------------------------

def lm_logits(params: dict, tokens: jax.Array, cfg,
              mask: jax.Array | None = None, state=None,
              dropout_key: jax.Array | None = None,
              eval_mode: bool = False, with_hidden: bool = False,
              no_head: bool = False):
    """tokens [B, T] -> (logits [B, T, V], final_state[, hidden]).

    with_hidden=True also returns the (post-dropout) pre-head hidden
    states — the neural-cache gate input (cache_mixed_logp).
    no_head=True (implies with_hidden) skips the head entirely and returns
    (None, state, hidden) — the fused head+CE path (ops/head_ce.py)
    consumes hidden directly and never materializes logits.

    For the transformer, `state` must be None (use sampling.py's KV-cache
    decoder for incremental decoding).  `dropout_key` enables train-mode
    dropout on the embeddings and the pre-head hidden states (cfg.dropout).
    `eval_mode` promises the caller will not differentiate (unlocks the
    forward-only fused LSTM stack — see models/lstm.py).
    """
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    k_in = k_out = None
    if dropout_key is not None:
        k_in, k_out = jax.random.split(dropout_key)
    if cfg.model == "lstm":
        x, zx0 = _lstm_embed(params, tokens, cfg, k_in)
        hidden, state = lstm_mod.lstm_forward(
            params["lstm"], x, mask=mask, state=state, compute_dtype=dt,
            cell=cfg.cell, eval_mode=eval_mode, zx0=zx0)
    else:
        x = dropout(embed(params, tokens), cfg.dropout, k_in)
        hidden = tfm_mod.transformer_forward(params["transformer"], x, mask,
                                             cfg)
        state = None
    hidden = dropout(hidden, cfg.dropout, k_out)
    if no_head:
        return None, state, hidden
    if with_hidden:
        return head_logits(params, hidden, cfg), state, hidden
    return head_logits(params, hidden, cfg), state


def token_nll(logits: jax.Array, targets: jax.Array,
              mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(sum CE over masked positions, count).  fp32 log-softmax."""
    logits = logits.astype(jnp.float32)
    v = logits.shape[-1]
    if v <= ONEHOT_VOCAB_MAX:
        # one-hot multiply-reduce instead of take_along_axis: the gather
        # (and its scatter-add transpose) serialize on TPU (see
        # ONEHOT_VOCAB_MAX); this is one VPU multiply-sum.
        logp = jax.nn.log_softmax(logits, axis=-1)
        hot = jax.nn.one_hot(targets, v, dtype=logp.dtype)
        ce = -jnp.sum(logp * hot, axis=-1)
    else:
        # lse-form CE: logp[tgt] = logits[tgt] - logsumexp(logits), so the
        # full [.., V] fp32 log-prob array never materializes — at V=5000
        # the log_softmax form cost an extra ~300MB write + read per pass
        # (the top op in benchmarks/step_profile_v5000.json).  Identical
        # math; backward still forms softmax once, as it must.
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(logits, targets[..., None],
                                  axis=-1)[..., 0]
        ce = lse - tgt
    mask = mask.astype(jnp.float32)
    return jnp.sum(ce * mask), jnp.sum(mask)


# ---------------------------------------------------------------------------
# neural-cache head (cfg.support_cache)
# ---------------------------------------------------------------------------

# Smoothing pseudo-count for the cache posterior.  Small on purpose: the
# cache's job is to spike on the support set's actual tokens; the LM branch
# of the mixture covers everything else.
CACHE_ALPHA = 0.01

# cfg.cache_calib: counts above this extend the last calibration-table
# slot multiplicatively (support counts concentrate below ~32 at K=5;
# '/' separators peak ~45 and ride the top slot's learned scale).
CACHE_CALIB_MAX = 32


def support_counts(support: jax.Array, support_len: jax.Array,
                   vocab_size: int) -> jax.Array:
    """[B, V] token counts over the support set's target positions
    (targets 1..len-1, PAD masked — the same positions NLL scores), as
    one one-hot multiply-reduce — no gather/scatter."""
    _, targets, mask = shift_targets(support, support_len)    # [B, K, L-1]
    hot = jax.nn.one_hot(targets, vocab_size, dtype=jnp.float32)
    return jnp.sum(hot * mask[..., None].astype(jnp.float32),
                   axis=tuple(range(1, targets.ndim)))        # [B, V]


def cache_posterior_parts(params: dict, support: jax.Array,
                          support_len: jax.Array, vocab_size: int
                          ) -> tuple[jax.Array, jax.Array, jax.Array,
                                     jax.Array]:
    """(phi [B,V], total [B,1], s [], p_global [V]) with the cache
    posterior = (phi + s*p_global) / (total + s) — one representation for
    every cache variant:

    - phi = raw support counts, or, with cfg.cache_calib
      (params["cache_calib"]), a LEARNED per-count-level calibration
      phi(c) = exp(t[c]) (phi(0)=0, t init log(c) => identity): the
      Bayes posterior E[p|count] of the true generator is not
      proportional to c (benchmarks/gap_analysis.json: two-thirds of the
      oracle gap sits on seen-word calibration), and a free monotone-free
      table lets SGD find the mapping instead of hand-deriving it.  With
      cfg.cache_calib_freq a learned per-count-level slope a[c] on the
      word's centered log global frequency joins the exponent, letting
      the same count mean different things for rare vs common words
      (the signal the K-shot Bayes bound exploits —
      benchmarks/bayes_bound.json).
    - (s, p_global) = uniform CACHE_ALPHA pseudo-counts, or the learned
      Dirichlet backoff (params["cache_prior"], cfg.cache_backoff=global).
    """
    counts = support_counts(support, support_len, vocab_size)
    prior = params.get("cache_prior")
    if prior is None:
        s = jnp.float32(CACHE_ALPHA * vocab_size)
        p_global = jnp.full((vocab_size,), 1.0 / vocab_size, jnp.float32)
        log_pg = jnp.full((vocab_size,), -jnp.log(jnp.float32(vocab_size)))
    else:
        s = jnp.exp(prior["log_s"].astype(jnp.float32))
        log_pg = jax.nn.log_softmax(prior["u"].astype(jnp.float32))
        p_global = jnp.exp(log_pg)
    calib = params.get("cache_calib")
    if calib is None:
        phi = counts
    else:
        # Counts past the table extend the last slot multiplicatively
        # (phi = exp(t[MAX-1]) * c/MAX), so init (t[c]=log(c)) is the
        # EXACT identity phi(c)=c for every c, not just c<=MAX.
        #
        # The table lookups are ONE-HOT MATMULS, not gathers: a [B*V]-
        # element gather from a 32-entry table lowers to a serialized
        # scalar-path fusion on TPU (~1.2ms) and its VJP to a
        # scatter-add (~1.4ms) — measured 26%/42% of the WHOLE train
        # step for calib/freq at the V=5000 flagship shape
        # (benchmarks/cache_speed_recheck.json + the fusion.522/542
        # trace).  one_hot(idx) @ table is a [B*V,32]x[32,k] matmul
        # whose VJP is another matmul; both ride the MXU at ~50us.
        idx = jnp.clip(counts.astype(jnp.int32) - 1, 0, CACHE_CALIB_MAX - 1)
        c_cap = jnp.clip(counts, 1.0, float(CACHE_CALIB_MAX))
        hot = jax.nn.one_hot(idx, CACHE_CALIB_MAX, dtype=jnp.float32)
        t = calib["t"].astype(jnp.float32)
        if "a" in calib:
            # cfg.cache_calib_freq: per-count-level slope on the word's
            # log global frequency, centered so x=0 for a uniform
            # backoff (init) — see init_lm.  stop_gradient keeps u
            # trained purely as the backoff distribution; here it is a
            # feature, not a branch of the mixture.  Both tables share
            # one one-hot: [32,2] stacked, one matmul, one VJP.
            x = jax.lax.stop_gradient(
                jnp.log(jnp.float32(vocab_size)) + log_pg)       # [V]
            tab = jnp.stack([t, calib["a"].astype(jnp.float32)], axis=-1)
            ta = jnp.einsum("bvc,ck->bvk", hot, tab)
            log_phi = ta[..., 0] + ta[..., 1] * x
        else:
            log_phi = jnp.einsum("bvc,c->bv", hot, t)
        phi = jnp.where(counts > 0,
                        jnp.exp(log_phi) * (counts / c_cap), 0.0)
    total = jnp.sum(phi, axis=-1, keepdims=True)
    return phi, total, s, p_global


def dynamic_cache_target_logp(phi: jax.Array, total: jax.Array,
                              s: jax.Array, p_global: jax.Array,
                              targets: jax.Array, mask: jax.Array
                              ) -> jax.Array:
    """[rows, T] cache-branch log-prob at each target with the query's own
    autoregressive prefix counts added (continuous cache, cfg.cache_dynamic):

        logp(t) = log(phi_sup(w_t) + c_prefix(t, w_t) + s*p(w_t))
                - log(total_sup + len_prefix(t) + s)

    Prefix counts are RAW (calibration applies to support counts only) so
    the normalizer stays the closed-form masked prefix length instead of a
    per-position [T, V] recount.  Counts run over the same positions NLL
    scores (previous masked targets), matching the support-count semantics.
    """
    eq = targets[:, :, None] == targets[:, None, :]          # [rows, T, T]
    t_ = targets.shape[-1]
    tri = jnp.tril(jnp.ones((t_, t_), jnp.bool_), -1)
    msk = mask[:, None, :].astype(jnp.float32)
    c_pre = jnp.sum(eq * tri[None] * msk, axis=-1)           # [rows, T]
    plen = jnp.cumsum(mask.astype(jnp.float32), axis=-1) \
        - mask.astype(jnp.float32)                           # exclusive
    phi_t = jnp.take_along_axis(phi, targets, axis=-1)
    return (jnp.log(phi_t + c_pre + s * p_global[targets])
            - jnp.log(total + plen + s))


def support_log_cache(params: dict, support: jax.Array,
                      support_len: jax.Array,
                      vocab_size: int) -> jax.Array:
    """[B, V] log-probs of the support-count posterior (the "cache").

    Counts run over the same positions NLL scores (targets 1..len-1, PAD
    masked), as one one-hot multiply-reduce — no gather/scatter.  This is
    the mechanism that makes few-shot work at vocab scale: "which rare
    words does this artist use" is a set-membership signal that survives
    no fixed-size state bottleneck, but is trivially carried by counts
    (cf. the episodic-unigram floor in models/unigram.py, which this head
    lets the neural model absorb instead of losing to).

    Backoff (cfg.cache_backoff="global", params["cache_prior"]): a
    LEARNED Dirichlet backoff — posterior = phi + exp(log_s)*softmax(u)
    — so unseen tokens back off toward a learned global unigram with a
    learned strength, per-TOKEN, the same shape as the floor's
    count+prior posterior; the scalar uniform CACHE_ALPHA
    (cfg.cache_backoff="uniform") cannot express that.  phi = counts, or
    the learned per-count-level calibration (cfg.cache_calib) — see
    cache_posterior_parts.  At init every variant coincides exactly with
    the uniform-alpha raw-count posterior."""
    phi, total, s, p_global = cache_posterior_parts(
        params, support, support_len, vocab_size)
    return jnp.log(phi + s * p_global[None]) - jnp.log(total + s)


def cache_mixed_logp(params: dict, logits: jax.Array, hidden: jax.Array,
                     log_cache: jax.Array) -> jax.Array:
    """Mixture log-probs: (1-g)*p_lm + g*p_cache with g = sigmoid(h.w+b).

    The gate is per POSITION (hidden-dependent), so the model learns when
    to trust the support counts (rare/style words) vs the LM (function
    words, structure).  Output is a normalized log-distribution; the
    downstream log_softmax in token_nll is then the identity, and
    sampling's temperature/top-k act on the mixture as they would on
    logits."""
    z = (jnp.tensordot(hidden.astype(jnp.float32),
                       params["cache_gate"]["w"], axes=([-1], [0]))
         + params["cache_gate"]["b"])
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.logaddexp(logp + jax.nn.log_sigmoid(-z)[..., None],
                         log_cache + jax.nn.log_sigmoid(z)[..., None])


def cache_token_nll(params: dict, logits: jax.Array, hidden: jax.Array,
                    log_cache: jax.Array, targets: jax.Array,
                    mask: jax.Array, lm_aux: float = 0.0,
                    resp_floor: float = 0.0
                    ) -> tuple[jax.Array, jax.Array]:
    """(sum CE, count) under the cache mixture, WITHOUT materializing the
    [.., V] mixture: CE only needs the mixture's log-prob at the TARGET
    token, and both branches are normalized, so
        ce = -logaddexp(log(1-g) + logp_lm[tgt], log(g) + log_cache[tgt]).
    Saves ~3 V-wide elementwise passes per position vs mixing first then
    gathering (the full mixture is still needed for SAMPLING —
    cache_mixed_logp).  Parity with the explicit mixture is pinned by
    tests/test_cache_head.py.

    logits/hidden [rows, T, *]; log_cache [rows, V] (one cache row per
    query row); targets/mask [rows, T]."""
    v = logits.shape[-1]
    lm_t = lm_target_logp(logits, targets)
    if v <= ONEHOT_VOCAB_MAX:
        hot = jax.nn.one_hot(targets, v, dtype=jnp.float32)
        cache_t = jnp.einsum("rtv,rv->rt", hot, log_cache)
    else:
        cache_t = jnp.take_along_axis(log_cache, targets, axis=-1)
    return cache_mix_stats(params, hidden, lm_t, cache_t, mask, lm_aux,
                           resp_floor)


def lm_target_logp(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """[.., T] log-softmax of the logits at the target ids; one-hot
    multiply-reduce below ONEHOT_VOCAB_MAX (MXU-friendly), lse-form gather
    above (no [.., V] fp32 logp materialization)."""
    logits = logits.astype(jnp.float32)
    v = logits.shape[-1]
    if v <= ONEHOT_VOCAB_MAX:
        logp = jax.nn.log_softmax(logits, axis=-1)
        hot = jax.nn.one_hot(targets, v, dtype=logp.dtype)
        return jnp.sum(logp * hot, axis=-1)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    return jnp.take_along_axis(logits, targets[..., None],
                               axis=-1)[..., 0] - lse


def cache_mix_stats(params: dict, hidden: jax.Array, lm_t: jax.Array,
                    cache_t: jax.Array, mask: jax.Array,
                    lm_aux: float = 0.0,
                    resp_floor: float = 0.0) -> tuple[jax.Array, jax.Array]:
    """(sum CE, count) of the gated mixture given the two branches' target
    log-probs (lm_t from logits or the fused head kernel; cache_t from the
    support posterior).

    lm_aux > 0 (cfg.cache_lm_aux, TRAIN steps only — eval always passes 0
    so the reported NLL is the pure mixture) adds lm_aux * the LM branch's
    own CE to the sum.  Rationale: the mixture's gradient to the LM branch
    is scaled by the branch's posterior responsibility
    (1-g)*p_lm/p_mix; when the count posterior is near-optimal at init
    (small vocab + high support coverage, e.g. MIDI V=204) the gate
    saturates toward the cache and that factor is ~1%, freezing the LSTM
    at the unigram floor (the collapsed plain_cache leg in
    benchmarks/midi_scale.json).  The auxiliary term gives the LM branch
    its full-strength gradient regardless of the gate; the gate still
    arbitrates the mixture the metric scores.

    resp_floor > 0 (cfg.cache_resp_floor, TRAIN steps only) is the
    surgical alternative: the mixture CE's gradient w.r.t. lm_t is
    -r_lm, the branch's posterior responsibility
    r_lm = (1-g)*p_lm(tgt)/p_mix(tgt); the floor lifts that per-position
    multiplier to max(r_lm, floor) by adding the ZERO-VALUED term
        relu(floor - sg(r_lm)) * (lm_t - sg(lm_t))
    to mixed_t.  The loss VALUE stays the pure mixture everywhere
    (second factor is identically 0), and wherever r_lm >= floor the
    term is exactly zero in value AND gradient (relu clamps the
    coefficient to 0) — the inertness property lm_aux lacks (lm_aux
    adds a full-strength bare-LM CE even where the mixture is healthy,
    measured -0.02 nats at V=20k).  Pre-registered 2-seed x 2-regime
    study: ROADMAP.md r5 ledger #2; pinned by tests/test_cache_head.py.
    """
    z = (jnp.tensordot(hidden.astype(jnp.float32),
                       params["cache_gate"]["w"], axes=([-1], [0]))
         + params["cache_gate"]["b"])
    mixed_t = jnp.logaddexp(jax.nn.log_sigmoid(-z) + lm_t,
                            jax.nn.log_sigmoid(z) + cache_t)
    if resp_floor:
        # r_lm computed from the PURE mixture (pre-aux), under
        # stop_gradient: the coefficient is data, not a learnable path.
        r_lm = jax.lax.stop_gradient(
            jnp.exp(jax.nn.log_sigmoid(-z) + lm_t - mixed_t))
        coef = jax.nn.relu(resp_floor - r_lm)
        mixed_t = mixed_t + coef * (lm_t - jax.lax.stop_gradient(lm_t))
    if lm_aux:
        mixed_t = mixed_t + lm_aux * lm_t
    m = mask.astype(jnp.float32)
    return -jnp.sum(mixed_t * m), jnp.sum(m)


def sequence_nll(logits: jax.Array, targets: jax.Array,
                 mask: jax.Array) -> jax.Array:
    """Masked mean NLL/token (the headline metric)."""
    total, count = token_nll(logits, targets, mask)
    return total / jnp.maximum(count, 1.0)


def shift_targets(tokens: jax.Array,
                  lengths: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(inputs [.., T-1], targets [.., T-1], mask [.., T-1]).

    Position t is real iff t < len-1 (predicting tokens 1..len-1)."""
    inputs = tokens[..., :-1]
    targets = tokens[..., 1:]
    t = tokens.shape[-1] - 1
    mask = jnp.arange(t) < (lengths[..., None] - 1)
    return inputs, targets, mask


def lm_nll_stats(params: dict, tokens: jax.Array, lengths: jax.Array,
                 cfg, dropout_key: jax.Array | None = None,
                 eval_mode: bool = False) -> tuple[jax.Array, jax.Array]:
    """(sum CE, token count) on a [B, T] batch — exact aggregation across
    eval batches and across chips (psum both, divide once)."""
    inputs, targets, mask = shift_targets(tokens, lengths)
    logits, _ = lm_logits(params, inputs, cfg, mask=mask,
                          dropout_key=dropout_key, eval_mode=eval_mode)
    return token_nll(logits, targets, mask)


def lm_nll(params: dict, tokens: jax.Array, lengths: jax.Array,
           cfg) -> jax.Array:
    """Plain LM loss on a [B, T] batch of songs."""
    total, count = lm_nll_stats(params, tokens, lengths, cfg)
    return total / jnp.maximum(count, 1.0)


# ---------------------------------------------------------------------------
# episodic forward + loss (configs #2-#4)
# ---------------------------------------------------------------------------

def support_state(params: dict, support: jax.Array, support_len: jax.Array,
                  cfg, eval_mode: bool = False):
    """LSTM: derive the priming per-layer (h, c) from the support set.

    support_mode="state" (reference semantics): songs are concatenated along
    time ([B, K*L] stream; PAD steps masked so state flows untouched across
    inter-song padding) — K*L sequential steps.

    support_mode="mean_state" (TPU-first variant): each song is scanned
    INDEPENDENTLY as part of one [B*K, L] batch and the K final states are
    averaged — only L sequential steps (Kx less serial work) with Kx more
    parallelism per step, which is exactly the trade the hardware wants.
    Order-invariant over the support set, which episodic conditioning
    arguably should be anyway.

    (A learned attention-pooling variant, "attn_state", was built and
    studied twice — benchmarks/attn_state_study.json and
    benchmarks/attn_state_round2.json; it never beat mean_state, even on
    the heterogeneous support sets it was designed for, and was removed
    per the pre-registered decision rule.)
    """
    b, k_, l_ = support.shape
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    if cfg.support_mode == "mean_state":
        flat = support.reshape(b * k_, l_)
        mask = (jnp.arange(l_) < support_len.reshape(b * k_)[:, None])
        x, zx0 = _lstm_embed(params, flat, cfg, None)
        _, state = lstm_mod.lstm_forward(params["lstm"], x, mask=mask,
                                         compute_dtype=dt, cell=cfg.cell,
                                         eval_mode=eval_mode, zx0=zx0)
        return [(h.reshape(b, k_, -1).mean(axis=1),
                 c.reshape(b, k_, -1).mean(axis=1)) for h, c in state]
    flat = support.reshape(b, k_ * l_)
    mask = (jnp.arange(l_) < support_len[..., None]).reshape(b, k_ * l_)
    x, zx0 = _lstm_embed(params, flat, cfg, None)
    _, state = lstm_mod.lstm_forward(params["lstm"], x, mask=mask,
                                     compute_dtype=dt, cell=cfg.cell,
                                     eval_mode=eval_mode, zx0=zx0)
    return state


def episodic_nll(params: dict, ep: Episode, cfg) -> jax.Array:
    """Query-set NLL/token for a meta-batch of episodes (the metric).

    eval_mode=True: this is a metric, never differentiated, and it must
    report the PURE mixture CE — without it a cfg.cache_lm_aux > 0 config
    would fold the train-only auxiliary LM-branch CE into the reported
    number (advisor r4)."""
    total, count = episodic_nll_stats(params, ep, cfg, eval_mode=True)
    return total / jnp.maximum(count, 1.0)


def finetune_episodic_nll_stats(params: dict, ep: Episode, cfg,
                                dropout_key: jax.Array | None = None,
                                lm_aux: float = 0.0,
                                resp_floor: float = 0.0
                                ) -> tuple[jax.Array, jax.Array]:
    """Fine-tune episodic variant (SURVEY.md §2 "LSTM LM baseline
    (+ fine-tune variant)"): per episode, take cfg.inner_steps SGD steps on
    the support-set LM loss from the shared initialization, then score the
    query set with the adapted parameters.

    TPU-native formulation: the whole inner loop is vmapped over the
    meta-batch — B per-episode parameter copies adapt in parallel in one XLA
    program (the reference would fine-tune episodes one at a time in
    Python).  With cfg.first_order=True the inner gradients are
    stop-gradiented (FOMAML); False differentiates through the inner loop
    (full MAML, second-order).

    cfg.support_cache composes: the inner SGD adapts the weights on the
    plain support LM loss (the support set carries no separate cache for
    itself), then the QUERY is scored under the adapted parameters' gated
    mixture with the episode's support-count posterior — inner-loop
    adaptation and the count cache answer different questions ("shift the
    weights toward this artist" vs "which exact words did they use"), so
    the combination is the natural experiment at vocab scale.
    """
    v_total = (params["embed"].shape[0] if cfg.tie_embeddings
               else params["out_w"].shape[1])

    def one_episode(support, support_len, query, query_len, dkey):
        def support_loss(p):
            inputs, targets, mask = shift_targets(support, support_len)
            logits, _ = lm_logits(p, inputs, cfg, mask=mask)
            return sequence_nll(logits, targets, mask)

        p = params
        for _ in range(cfg.inner_steps):
            g = jax.grad(support_loss)(p)
            if cfg.first_order:
                g = jax.lax.stop_gradient(g)
            p = jax.tree.map(lambda w, gw: w - cfg.inner_lr * gw, p, g)

        inputs, targets, mask = shift_targets(query, query_len)
        if not cfg.support_cache:
            logits, _ = lm_logits(p, inputs, cfg, mask=mask,
                                  dropout_key=dkey)
            return token_nll(logits, targets, mask)

        # cache mixture under the adapted parameters (explicit-logits
        # path; rows = the episode's Q query songs).  The cache params
        # (gate/backoff/calib) receive zero inner gradient — support_loss
        # never touches them — so p's cache tree equals the meta-params'.
        q_ = query.shape[0]
        logits, _, hidden = lm_logits(p, inputs, cfg, mask=mask,
                                      dropout_key=dkey, with_hidden=True)
        if cfg.cache_dynamic:
            phi, total, s, p_global = cache_posterior_parts(
                p, support[None], support_len[None], v_total)
            cache_t = dynamic_cache_target_logp(
                jnp.repeat(phi, q_, axis=0), jnp.repeat(total, q_, axis=0),
                s, p_global, targets, mask)
            return cache_mix_stats(p, hidden, lm_target_logp(logits, targets),
                                   cache_t, mask, lm_aux, resp_floor)
        log_cache = support_log_cache(p, support[None], support_len[None],
                                      v_total)
        log_cache = jnp.repeat(log_cache, q_, axis=0)
        return cache_token_nll(p, logits, hidden, log_cache, targets, mask,
                               lm_aux, resp_floor)

    b = ep.support.shape[0]
    dkeys = (jax.random.split(dropout_key, b)
             if dropout_key is not None else jnp.zeros((b, 2), jnp.uint32))
    if dropout_key is None:
        one = lambda s, sl, q, ql, dk: one_episode(s, sl, q, ql, None)  # noqa: E731
    else:
        one = one_episode
    totals, counts = jax.vmap(one)(ep.support, ep.support_len, ep.query,
                                   ep.query_len, dkeys)
    return jnp.sum(totals), jnp.sum(counts)


def episodic_nll_stats(params: dict, ep: Episode, cfg,
                       dropout_key: jax.Array | None = None,
                       eval_mode: bool = False
                       ) -> tuple[jax.Array, jax.Array]:
    """(sum CE over query tokens, query token count) for a meta-batch.

    eval_mode: caller will not differentiate (see models/lstm.py).  NOT
    forwarded to the finetune variant — its inner SGD differentiates the
    support loss even under an undifferentiated outer eval.  eval_mode
    additionally gates cfg.cache_lm_aux: the auxiliary LM-branch loss
    (see cache_mix_stats) shapes TRAIN gradients only; every eval NLL
    reported anywhere is the pure mixture."""
    lm_aux = 0.0 if eval_mode else cfg.cache_lm_aux
    resp_floor = 0.0 if eval_mode else cfg.cache_resp_floor
    if cfg.support_mode == "finetune":
        return finetune_episodic_nll_stats(params, ep, cfg, dropout_key,
                                           lm_aux, resp_floor)
    b, q_, l_ = ep.query.shape
    inputs, targets, mask = shift_targets(ep.query, ep.query_len)
    flat_inputs = inputs.reshape(b * q_, l_ - 1)
    flat_mask = mask.reshape(b * q_, l_ - 1)
    v_total = (params["embed"].shape[0] if cfg.tie_embeddings
               else params["out_w"].shape[1])
    fused = fused_head_eligible(params, cfg, v_total)

    hidden = None
    logits = None
    if cfg.model == "lstm":
        state = None
        if cfg.support_mode in ("state", "mean_state"):
            state = support_state(params, ep.support, ep.support_len, cfg,
                                  eval_mode=eval_mode)
            # Broadcast each episode's state over its Q query songs.
            state = [(jnp.repeat(h, q_, axis=0), jnp.repeat(c, q_, axis=0))
                     for h, c in state]
        if cfg.support_cache or fused:
            logits, _, hidden = lm_logits(params, flat_inputs, cfg,
                                          mask=flat_mask, state=state,
                                          dropout_key=dropout_key,
                                          eval_mode=eval_mode,
                                          with_hidden=True, no_head=fused)
        else:
            logits, _ = lm_logits(params, flat_inputs, cfg, mask=flat_mask,
                                  state=state, dropout_key=dropout_key,
                                  eval_mode=eval_mode)
    else:
        if cfg.support_mode in ("state", "mean_state"):
            k_in = k_out = None
            if dropout_key is not None:
                k_in, k_out = jax.random.split(dropout_key)
            bk, k_, sl = ep.support.shape
            prefix = ep.support.reshape(b, k_ * sl)
            prefix_mask = (jnp.arange(sl) <
                           ep.support_len[..., None]).reshape(b, k_ * sl)
            q_emb = dropout(embed(params, flat_inputs), cfg.dropout, k_in)
            hidden = tfm_mod.transformer_prefix_forward(
                params["transformer"], embed(params, prefix), prefix_mask,
                q_emb.reshape(b, q_, l_ - 1, -1), mask, cfg)
            hidden = dropout(hidden.reshape(b * q_, l_ - 1, -1),
                             cfg.dropout, k_out)
            if not fused:
                logits = head_logits(params, hidden, cfg)
        elif cfg.support_cache or fused:
            logits, _, hidden = lm_logits(params, flat_inputs, cfg,
                                          mask=flat_mask,
                                          dropout_key=dropout_key,
                                          with_hidden=True, no_head=fused)
        else:
            logits, _ = lm_logits(params, flat_inputs, cfg, mask=flat_mask,
                                  dropout_key=dropout_key)

    flat_targets = targets.reshape(b * q_, l_ - 1)
    if cfg.support_cache:
        # [B, V] cache per episode, broadcast over its Q query songs;
        # scored via the fused target-only mixture (cache_token_nll)
        if cfg.cache_dynamic:
            phi, total, s, p_global = cache_posterior_parts(
                params, ep.support, ep.support_len, v_total)
            cache_t = dynamic_cache_target_logp(
                jnp.repeat(phi, q_, axis=0), jnp.repeat(total, q_, axis=0),
                s, p_global, flat_targets, flat_mask)
            if fused:
                lse, tl = head_lse_target(params, hidden, flat_targets,
                                          cfg)
                lm_t = tl - lse
            else:
                lm_t = lm_target_logp(logits, flat_targets)
            return cache_mix_stats(params, hidden, lm_t, cache_t,
                                   flat_mask, lm_aux, resp_floor)
        log_cache = support_log_cache(params, ep.support, ep.support_len,
                                      v_total)
        log_cache = jnp.repeat(log_cache, q_, axis=0)
        if fused:
            lse, tl = head_lse_target(params, hidden, flat_targets, cfg)
            cache_t = jnp.take_along_axis(log_cache, flat_targets, axis=-1)
            return cache_mix_stats(params, hidden, tl - lse, cache_t,
                                   flat_mask, lm_aux, resp_floor)
        return cache_token_nll(params, logits, hidden, log_cache,
                               flat_targets, flat_mask, lm_aux, resp_floor)
    if fused:
        lse, tl = head_lse_target(params, hidden, flat_targets, cfg)
        m = flat_mask.astype(jnp.float32)
        return jnp.sum((lse - tl) * m), jnp.sum(m)

    return token_nll(logits, flat_targets, flat_mask)
