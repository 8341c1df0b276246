"""Model tier: LSTM masking/state semantics, NLL oracle, transformer
causality + prefix/KV-cache consistency (SURVEY.md §5.2-5.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fewshot.config import Config
from fewshot.data.episodes import Episode
from fewshot.models import lm as lm_mod
from fewshot.models import lstm as lstm_mod
from fewshot.models import transformer as tfm_mod

CFG_LSTM = Config(model="lstm", embed_dim=16, hidden_dim=24, num_layers=2,
                  vocab_size=40, max_len=16, batch_size=4, support_size=2,
                  query_size=2, data_parallel=False)
CFG_TFM = Config(model="transformer", embed_dim=32, num_heads=4,
                 num_layers=2, vocab_size=40, max_len=16, batch_size=4,
                 support_size=2, query_size=2, data_parallel=False)


# -- LSTM --------------------------------------------------------------------

def test_lstm_mask_carries_state():
    """PAD steps must leave (h, c) untouched — the support-priming invariant."""
    key = jax.random.PRNGKey(0)
    params = lstm_mod.init_lstm_params(key, 8, 12, 1)
    x = jax.random.normal(key, (2, 10, 8))
    full_mask = jnp.ones((2, 10), bool)
    short_mask = jnp.arange(10) < 6

    _, s_full = lstm_mod.lstm_forward(params, x, jnp.broadcast_to(
        short_mask, (2, 10)))
    # Same inputs truncated at 6 steps -> identical final state
    _, s_trunc = lstm_mod.lstm_forward(params, x[:, :6],
                                       jnp.ones((2, 6), bool))
    for (h1, c1), (h2, c2) in zip(s_full, s_trunc):
        np.testing.assert_allclose(h1, h2, atol=1e-6)
        np.testing.assert_allclose(c1, c2, atol=1e-6)


def test_lstm_step_matches_forward():
    key = jax.random.PRNGKey(1)
    params = lstm_mod.init_lstm_params(key, 8, 12, 2)
    x = jax.random.normal(key, (3, 5, 8))
    ys, state = lstm_mod.lstm_forward(params, x)
    # replay with single steps
    st = lstm_mod.zero_state(3, 12, 2)
    for t in range(5):
        h, st = lstm_mod.lstm_step(params, x[:, t], st)
        np.testing.assert_allclose(h, ys[:, t], atol=1e-5)
    for (h1, c1), (h2, c2) in zip(st, state):
        np.testing.assert_allclose(h1, h2, atol=1e-5)


def test_forget_bias_gate_order():
    """With zero weights, c' = sigmoid(FORGET_BIAS)*c + 0.5*tanh(0)=sig(1)*c."""
    params = [{"wx": jnp.zeros((4, 8 * 4)), "wh": jnp.zeros((8, 32)),
               "b": jnp.zeros((32,))}]
    h0 = jnp.zeros((1, 8))
    c0 = jnp.ones((1, 8))
    h, c = lstm_mod.lstm_gates(jnp.zeros((1, 32)), h0, c0,
                               params[0]["wh"], params[0]["b"], jnp.float32)
    np.testing.assert_allclose(c, jax.nn.sigmoid(1.0) * c0, atol=1e-6)


# -- NLL oracle --------------------------------------------------------------

def test_masked_nll_matches_numpy():
    rng = np.random.RandomState(0)
    logits = rng.randn(3, 7, 11).astype(np.float32)
    targets = rng.randint(0, 11, (3, 7))
    lengths = np.array([8, 3, 1])  # token seq lengths incl BOS/EOS
    mask = np.arange(7)[None, :] < (lengths[:, None] - 1)

    # numpy oracle
    ex = np.exp(logits - logits.max(-1, keepdims=True))
    logp = np.log(ex / ex.sum(-1, keepdims=True))
    ce = -np.take_along_axis(logp, targets[..., None], -1)[..., 0]
    want = (ce * mask).sum() / mask.sum()

    got = lm_mod.sequence_nll(jnp.asarray(logits), jnp.asarray(targets),
                              jnp.asarray(mask))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_shift_targets():
    toks = jnp.array([[1, 5, 6, 2, 0, 0]])  # BOS w w EOS PAD PAD, len=4
    inputs, targets, mask = lm_mod.shift_targets(toks, jnp.array([4]))
    np.testing.assert_array_equal(np.asarray(inputs), [[1, 5, 6, 2, 0]])
    np.testing.assert_array_equal(np.asarray(targets), [[5, 6, 2, 0, 0]])
    np.testing.assert_array_equal(np.asarray(mask),
                                  [[True, True, True, False, False]])


def test_episodic_nll_ignores_support_tokens():
    """Loss must be computed on query tokens only: changing support CONTENT
    changes the NLL only via the primed state, and support token count never
    enters the normalizer."""
    key = jax.random.PRNGKey(0)
    params = lm_mod.init_lm(key, CFG_LSTM, CFG_LSTM.vocab_size)
    b, k, q, L = 2, 2, 2, 10
    rng = np.random.RandomState(1)
    sup = jnp.asarray(rng.randint(4, 40, (b, k, L)))
    qry = jnp.asarray(rng.randint(4, 40, (b, q, L)))
    ep = Episode(sup, jnp.full((b, k), L), qry, jnp.full((b, q), L),
                 jnp.zeros((b,), jnp.int32))
    _, count = lm_mod.episodic_nll_stats(params, ep, CFG_LSTM)
    assert float(count) == b * q * (L - 1)


def test_support_mode_none_ignores_support():
    cfg = Config(**{**CFG_LSTM.__dict__, "support_mode": "none"})
    key = jax.random.PRNGKey(0)
    params = lm_mod.init_lm(key, cfg, cfg.vocab_size)
    rng = np.random.RandomState(1)
    qry = jnp.asarray(rng.randint(4, 40, (2, 2, 10)))
    qlen = jnp.full((2, 2), 10)
    alen = jnp.zeros((2,), jnp.int32)
    sup1 = jnp.asarray(rng.randint(4, 40, (2, 2, 10)))
    sup2 = jnp.asarray(rng.randint(4, 40, (2, 2, 10)))
    slen = jnp.full((2, 2), 10)
    n1 = lm_mod.episodic_nll(params, Episode(sup1, slen, qry, qlen, alen), cfg)
    n2 = lm_mod.episodic_nll(params, Episode(sup2, slen, qry, qlen, alen), cfg)
    assert float(n1) == float(n2)


# -- transformer -------------------------------------------------------------

def test_transformer_causal():
    key = jax.random.PRNGKey(0)
    params = lm_mod.init_lm(key, CFG_TFM, CFG_TFM.vocab_size)
    toks = jnp.asarray(np.random.RandomState(0).randint(4, 40, (1, 8)))
    logits1, _ = lm_mod.lm_logits(params, toks, CFG_TFM)
    toks2 = toks.at[0, 5].set(7)  # change a future token
    logits2, _ = lm_mod.lm_logits(params, toks2, CFG_TFM)
    np.testing.assert_allclose(np.asarray(logits1[0, :5]),
                               np.asarray(logits2[0, :5]), atol=1e-4)
    assert not np.allclose(np.asarray(logits1[0, 5:]),
                           np.asarray(logits2[0, 5:]), atol=1e-4)


def test_prefix_forward_matches_concat():
    """Episodic prefix attention == running the full concat through the
    plain forward (when nothing is padded)."""
    cfg = CFG_TFM
    key = jax.random.PRNGKey(2)
    tparams = tfm_mod.init_transformer_params(key, cfg)
    b, p, lq, e = 2, 6, 5, cfg.embed_dim
    rng = np.random.RandomState(0)
    prefix = jnp.asarray(rng.randn(b, p, e), jnp.float32)
    query = jnp.asarray(rng.randn(b, 1, lq, e), jnp.float32)
    pm = jnp.ones((b, p), bool)
    qm = jnp.ones((b, 1, lq), bool)

    got = tfm_mod.transformer_prefix_forward(tparams, prefix, pm, query,
                                             qm, cfg)
    full = tfm_mod.transformer_forward(
        tparams, jnp.concatenate([prefix, query[:, 0]], axis=1), None, cfg)
    np.testing.assert_allclose(np.asarray(got[:, 0]),
                               np.asarray(full[:, p:]), atol=2e-4)


def test_kv_cache_decode_matches_forward():
    cfg = CFG_TFM
    key = jax.random.PRNGKey(3)
    tparams = tfm_mod.init_transformer_params(key, cfg)
    b, t, e = 2, 7, cfg.embed_dim
    x = jnp.asarray(np.random.RandomState(1).randn(b, t, e), jnp.float32)
    full = tfm_mod.transformer_forward(tparams, x, None, cfg)

    cache = tfm_mod.init_kv_cache(cfg, b, t)
    outs = []
    for i in range(t):
        h, cache = tfm_mod.transformer_step(tparams, x[:, i], cache,
                                            jnp.int32(i), cfg)
        outs.append(h)
    got = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full), atol=2e-4)


def test_prefill_matches_steps():
    cfg = CFG_TFM
    key = jax.random.PRNGKey(4)
    tparams = tfm_mod.init_transformer_params(key, cfg)
    b, p, e = 1, 5, cfg.embed_dim
    x = jnp.asarray(np.random.RandomState(2).randn(b, p + 1, e), jnp.float32)
    mask = jnp.ones((b, p), bool)

    cache1 = tfm_mod.init_kv_cache(cfg, b, p + 2)
    cache1 = tfm_mod.prefill(tparams, x[:, :p], mask, cache1, cfg)
    h1, _ = tfm_mod.transformer_step(tparams, x[:, p], cache1,
                                     jnp.int32(p), cfg)

    cache2 = tfm_mod.init_kv_cache(cfg, b, p + 2)
    for i in range(p):
        _, cache2 = tfm_mod.transformer_step(tparams, x[:, i], cache2,
                                             jnp.int32(i), cfg)
    h2, _ = tfm_mod.transformer_step(tparams, x[:, p], cache2,
                                     jnp.int32(p), cfg)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=2e-4)


def test_dropout_train_vs_eval():
    """cfg.dropout is live in train mode (key given) and off in eval."""
    import dataclasses
    cfg = dataclasses.replace(CFG_LSTM, dropout=0.5)
    key = jax.random.PRNGKey(0)
    params = lm_mod.init_lm(key, cfg, cfg.vocab_size)
    toks = jnp.asarray(np.random.RandomState(0).randint(4, 40, (2, 8)))
    lens = jnp.full((2,), 8)
    # eval: no dropout key -> deterministic, equals dropout=0.0 config
    e1 = lm_mod.lm_nll_stats(params, toks, lens, cfg)
    e2 = lm_mod.lm_nll_stats(params, toks, lens, CFG_LSTM)
    assert float(e1[0]) == float(e2[0])
    # train: dropout active -> loss differs from eval and across keys
    t1 = lm_mod.lm_nll_stats(params, toks, lens, cfg,
                             dropout_key=jax.random.PRNGKey(1))
    t2 = lm_mod.lm_nll_stats(params, toks, lens, cfg,
                             dropout_key=jax.random.PRNGKey(2))
    assert float(t1[0]) != float(e1[0])
    assert float(t1[0]) != float(t2[0])


def test_mean_state_matches_concat_on_single_support():
    """K=1: mean_state and concat state-priming are the same computation."""
    import dataclasses
    cfg_s = dataclasses.replace(CFG_LSTM, support_size=1)
    cfg_m = dataclasses.replace(cfg_s, support_mode="mean_state")
    params = lm_mod.init_lm(jax.random.PRNGKey(0), cfg_s, cfg_s.vocab_size)
    rng = np.random.RandomState(0)
    sup = jnp.asarray(rng.randint(4, 40, (2, 1, 10)), jnp.int32)
    slen = jnp.asarray([[10], [6]], jnp.int32)
    s1 = lm_mod.support_state(params, sup, slen, cfg_s)
    s2 = lm_mod.support_state(params, sup, slen, cfg_m)
    for (h1, c1), (h2, c2) in zip(s1, s2):
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)


def test_mean_state_order_invariant():
    import dataclasses
    cfg = dataclasses.replace(CFG_LSTM, support_mode="mean_state",
                              support_size=3)
    params = lm_mod.init_lm(jax.random.PRNGKey(0), cfg, cfg.vocab_size)
    rng = np.random.RandomState(1)
    sup = jnp.asarray(rng.randint(4, 40, (1, 3, 10)), jnp.int32)
    slen = jnp.full((1, 3), 10, jnp.int32)
    perm = jnp.asarray([[2, 0, 1]])
    s1 = lm_mod.support_state(params, sup, slen, cfg)
    s2 = lm_mod.support_state(params, sup[0][perm[0]][None], slen, cfg)
    for (h1, _), (h2, _) in zip(s1, s2):
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-5)


def test_attn_state_rejected():
    """attn_state was removed after losing both pre-registered studies
    (benchmarks/attn_state_round2.json); the config surface must reject it
    so stale YAML/checkpoint hparams fail loudly, not silently."""
    import dataclasses
    with np.testing.assert_raises(ValueError):
        dataclasses.replace(CFG_LSTM, support_mode="attn_state")


def test_onehot_paths_match_gather():
    """The small-vocab one-hot embed/CE paths must agree exactly with the
    gather paths they replace (same values, only the lowering differs)."""
    import fewshot.models.lm as lm

    rng = np.random.RandomState(0)
    v, e, b, t = 50, 8, 4, 6
    params = {"embed": jnp.asarray(rng.randn(v, e), jnp.float32)}
    tokens = jnp.asarray(rng.randint(0, v, (b, t)), jnp.int32)

    got = lm.embed(params, tokens)                 # one-hot path (v <= max)
    want = params["embed"][tokens]                 # gather reference
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    logits = jnp.asarray(rng.randn(b, t, v), jnp.float32)
    targets = jnp.asarray(rng.randint(0, v, (b, t)), jnp.int32)
    mask = jnp.asarray(rng.rand(b, t) > 0.3, jnp.float32)
    tot, cnt = lm.token_nll(logits, targets, mask)  # one-hot multiply-sum
    logp = jax.nn.log_softmax(logits, -1)
    ce = -np.take_along_axis(np.asarray(logp), np.asarray(targets)[..., None],
                             -1)[..., 0]
    np.testing.assert_allclose(float(tot), (ce * np.asarray(mask)).sum(),
                               rtol=1e-6)
    assert float(cnt) == float(np.asarray(mask).sum())


def test_fused_tied_head_matches_two_matmuls():
    """Small-vocab pre-contracted tied head == sequential out_proj @ embed.T
    (only matmul association changes), and the decode-row gate keeps tiny
    batches on the two-matmul path (same values either way)."""
    import dataclasses

    import fewshot.models.lm as lm

    rng = np.random.RandomState(1)
    h, e, v = 64, 32, 20
    cfg = dataclasses.replace(CFG_TFM, hidden_dim=h, embed_dim=e,
                              vocab_size=v)
    params = {"embed": jnp.asarray(rng.randn(v, e), jnp.float32),
              "out_proj": jnp.asarray(rng.randn(h, e), jnp.float32),
              "out_b": jnp.asarray(rng.randn(v), jnp.float32)}

    def reference(hidden):
        mid = np.asarray(hidden) @ np.asarray(params["out_proj"])
        return mid @ np.asarray(params["embed"]).T + np.asarray(
            params["out_b"])

    big = jnp.asarray(rng.randn(8, 300, h), jnp.float32)   # rows > gate
    small = jnp.asarray(rng.randn(4, h), jnp.float32)      # decode rows
    for hidden in (big, small):
        got = lm.head_logits(params, hidden, cfg)
        np.testing.assert_allclose(np.asarray(got), reference(hidden),
                                   rtol=2e-4, atol=2e-4)


def test_embedding_fold_matches_unfolded(monkeypatch):
    """The embedding-folded layer-0 projection (zx0 = onehot @ (E @ Wx0))
    must match the materialized-x path to reassociation tolerance, for
    logits and grads, with a support-primed episodic loss."""
    import dataclasses

    import fewshot.models.lm as lm

    cfg = dataclasses.replace(
        CFG_LSTM, embed_dim=64, hidden_dim=128,
        vocab_size=50, support_mode="mean_state", dropout=0.0)
    rng = np.random.RandomState(0)
    params = lm.init_lm(jax.random.PRNGKey(0), cfg, 50)
    b, t = 8, 80                        # rows = 640 >= the fold gate
    tokens = jnp.asarray(rng.randint(0, 50, (b, t)), jnp.int32)
    lens = jnp.asarray(rng.randint(2, t, (b,)), jnp.int32)
    mask = jnp.arange(t) < lens[:, None]

    def run(p):
        logits, _ = lm.lm_logits(p, tokens, cfg, mask=mask)
        return logits

    folded = run(params)
    x, zx0 = lm._lstm_embed(params, tokens, cfg, None)
    assert zx0 is not None and x is None      # fold actually engaged
    monkeypatch.setattr(lm, "ONEHOT_VOCAB_MAX", 0)
    unfolded = run(params)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(unfolded),
                               atol=2e-4)

    def loss(p):
        logits, _ = lm.lm_logits(p, tokens, cfg, mask=mask)
        return lm.sequence_nll(logits, tokens, mask.astype(jnp.float32))

    g_unfolded = jax.grad(loss)(params)
    monkeypatch.undo()
    g_folded = jax.grad(loss)(params)
    for a, b2 in zip(jax.tree.leaves(g_folded), jax.tree.leaves(g_unfolded)):
        scale = float(jnp.abs(b2).max()) + 1e-12
        assert float(jnp.abs(a - b2).max()) / scale < 1e-3
