"""Neural-cache head (cfg.support_cache): math, parity, training, sampling.

The cache head mixes the LM's next-token distribution with the support-set
count posterior through a learned hidden-dependent gate — the mechanism
that lets the neural model absorb the episodic-unigram floor at vocab
scale (benchmarks/scale_quality.json) instead of losing to it.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fewshot.config import Config
from fewshot.models import lm


def _cfg(**kw):
    base = dict(vocab_size=64, max_len=12, embed_dim=16, hidden_dim=24,
                num_layers=1, batch_size=4, support_size=3, query_size=2,
                support_mode="mean_state", support_cache=True,
                data_parallel=False)
    base.update(kw)
    return Config(**base)


def _episode(key, cfg, v):
    from fewshot.data.episodes import Episode
    k1, k2, k3, k4 = jax.random.split(key, 4)
    b, k, q, l = (cfg.batch_size, cfg.support_size, cfg.query_size,
                  cfg.max_len)
    sup = jax.random.randint(k1, (b, k, l), 3, v)
    qry = jax.random.randint(k2, (b, q, l), 3, v)
    sup_len = jax.random.randint(k3, (b, k), 4, l + 1)
    qry_len = jax.random.randint(k4, (b, q), 4, l + 1)
    return Episode(support=sup, support_len=sup_len, query=qry,
                   query_len=qry_len, artist=jnp.zeros((b,), jnp.int32))


def test_support_log_cache_matches_numpy_oracle():
    cfg = _cfg()
    v = cfg.vocab_size
    ep = _episode(jax.random.PRNGKey(0), cfg, v)
    got = np.asarray(lm.support_log_cache({}, ep.support, ep.support_len,
                                          v))
    sup = np.asarray(ep.support)
    slen = np.asarray(ep.support_len)
    for b in range(sup.shape[0]):
        counts = np.zeros(v)
        for k in range(sup.shape[1]):
            for t in range(1, int(slen[b, k])):       # targets 1..len-1
                counts[sup[b, k, t]] += 1
        want = np.log((counts + lm.CACHE_ALPHA)
                      / (counts.sum() + lm.CACHE_ALPHA * v))
        np.testing.assert_allclose(got[b], want, rtol=1e-5)


def test_cache_mixed_logp_is_normalized():
    cfg = _cfg()
    params = lm.init_lm(jax.random.PRNGKey(0), cfg, cfg.vocab_size)
    params["cache_gate"]["w"] = jax.random.normal(
        jax.random.PRNGKey(1), (cfg.hidden_dim,)) * 0.5
    hidden = jax.random.normal(jax.random.PRNGKey(2), (5, 7,
                                                       cfg.hidden_dim))
    logits = jax.random.normal(jax.random.PRNGKey(3), (5, 7,
                                                       cfg.vocab_size))
    log_cache = jax.nn.log_softmax(
        jax.random.normal(jax.random.PRNGKey(4), (5, 1, cfg.vocab_size)))
    mixed = lm.cache_mixed_logp(params, logits, hidden, log_cache)
    sums = np.exp(np.asarray(mixed)).sum(-1)
    np.testing.assert_allclose(sums, 1.0, rtol=1e-5)


def test_gate_off_matches_plain_model():
    """w=0, b=-30 => g~0: NLL identical to support_cache=False."""
    cfg = _cfg()
    cfg_off = dataclasses.replace(cfg, support_cache=False)
    params = lm.init_lm(jax.random.PRNGKey(0), cfg, cfg.vocab_size)
    params["cache_gate"]["b"] = jnp.float32(-30.0)
    ep = _episode(jax.random.PRNGKey(1), cfg, cfg.vocab_size)
    t1, c1 = lm.episodic_nll_stats(params, ep, cfg)
    p_off = {k: v for k, v in params.items() if k != "cache_gate"}
    t2, c2 = lm.episodic_nll_stats(p_off, ep, cfg_off)
    assert float(c1) == float(c2)
    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-5)


def test_gate_full_matches_cache_only_nll():
    """b=+30 => g~1: NLL equals scoring queries under the cache posterior."""
    cfg = _cfg()
    v = cfg.vocab_size
    params = lm.init_lm(jax.random.PRNGKey(0), cfg, v)
    params["cache_gate"]["b"] = jnp.float32(30.0)
    ep = _episode(jax.random.PRNGKey(1), cfg, v)
    total, count = lm.episodic_nll_stats(params, ep, cfg)

    log_cache = np.asarray(lm.support_log_cache({}, ep.support,
                                                ep.support_len, v))
    qry, qlen = np.asarray(ep.query), np.asarray(ep.query_len)
    want = 0.0
    n = 0
    for b in range(qry.shape[0]):
        for q in range(qry.shape[1]):
            for t in range(1, int(qlen[b, q])):
                want -= log_cache[b, qry[b, q, t]]
                n += 1
    assert int(count) == n
    np.testing.assert_allclose(float(total), want, rtol=1e-5)


def test_cache_head_trains_and_gate_learns():
    """Few steps on a repeat-the-support task: loss falls, gate params move."""
    from fewshot import training
    from fewshot.data.corpus import build_lyrics_corpus
    from fewshot.data.synthetic import generate_lyrics_csv
    from fewshot.data import episodes as eps
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as tmp:
        generate_lyrics_csv(Path(tmp) / "l.csv", num_artists=8,
                            songs_per_artist=6, seed=0)
        corpus = build_lyrics_corpus(Path(tmp) / "l.csv",
                                     Path(tmp) / "c", vocab_size=128,
                                     max_len=20)
    cfg = _cfg(vocab_size=128, max_len=20, batch_size=8, lr=5e-3)
    data = eps.put_corpus(corpus)
    split = jnp.asarray(corpus.splits["train"])
    step = training.make_train_step(cfg, data, split)
    state = training.init_train_state(cfg, len(corpus.vocab))
    g0 = np.asarray(state.params["cache_gate"]["b"])
    losses = []
    for _ in range(30):
        state, m = step(state)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert not np.allclose(np.asarray(state.params["cache_gate"]["b"]), g0)


def test_sampling_respects_cache():
    """b=+30: sampled tokens come (almost surely) from the support set."""
    from fewshot import sampling
    cfg = _cfg(top_k=0, sample_tokens=16)
    v = cfg.vocab_size
    params = lm.init_lm(jax.random.PRNGKey(0), cfg, v)
    params["cache_gate"]["b"] = jnp.float32(30.0)
    ep = _episode(jax.random.PRNGKey(1), cfg, v)
    toks = np.asarray(sampling.generate(params, ep.support, ep.support_len,
                                        jax.random.PRNGKey(2), cfg))
    sup, slen = np.asarray(ep.support), np.asarray(ep.support_len)
    for b in range(toks.shape[0]):
        allowed = {int(sup[b, k, t]) for k in range(sup.shape[1])
                   for t in range(1, int(slen[b, k]))}
        emitted = [int(t) for t in toks[b] if t != 0]     # skip PAD
        in_cache = sum(1 for t in emitted if t in allowed)
        assert in_cache >= 0.8 * max(len(emitted), 1), \
            (b, emitted, sorted(allowed))


def test_fused_cache_nll_matches_explicit_mixture():
    """cache_token_nll (target-only fused path) == mix-then-score, both
    vocab branches (one-hot and gather)."""
    for v in (64, 2000):
        cfg = _cfg(vocab_size=v)
        params = lm.init_lm(jax.random.PRNGKey(0), cfg, v)
        params["cache_gate"]["w"] = jax.random.normal(
            jax.random.PRNGKey(1), (cfg.hidden_dim,)) * 0.3
        rows, t = 6, 9
        logits = jax.random.normal(jax.random.PRNGKey(2), (rows, t, v))
        hidden = jax.random.normal(jax.random.PRNGKey(3),
                                   (rows, t, cfg.hidden_dim))
        log_cache = jax.nn.log_softmax(
            jax.random.normal(jax.random.PRNGKey(4), (rows, v)))
        targets = jax.random.randint(jax.random.PRNGKey(5), (rows, t), 0, v)
        mask = jax.random.bernoulli(jax.random.PRNGKey(6), 0.8, (rows, t))
        tot_f, cnt_f = lm.cache_token_nll(params, logits, hidden, log_cache,
                                          targets, mask)
        mixed = lm.cache_mixed_logp(params, logits, hidden,
                                    log_cache[:, None, :])
        tot_e, cnt_e = lm.token_nll(mixed, targets, mask)
        assert float(cnt_f) == float(cnt_e)
        np.testing.assert_allclose(float(tot_f), float(tot_e), rtol=2e-5)

def test_global_backoff_init_equals_uniform():
    """cache_backoff="global" at init (u=0, log_s=log(alpha*V)) is EXACTLY
    the uniform-alpha cache, for any vocab size."""
    for v in (64, 500):
        cfg = _cfg(vocab_size=v)
        params = lm.init_lm(jax.random.PRNGKey(0), cfg, v)
        assert "cache_prior" in params
        ep = _episode(jax.random.PRNGKey(1), cfg, v)
        uni = lm.support_log_cache({}, ep.support, ep.support_len, v)
        glo = lm.support_log_cache(params, ep.support, ep.support_len, v)
        np.testing.assert_allclose(np.asarray(glo), np.asarray(uni),
                                   rtol=1e-6)


def test_global_backoff_numpy_oracle():
    """posterior = counts + exp(log_s) * softmax(u), normalized."""
    cfg = _cfg()
    v = cfg.vocab_size
    ep = _episode(jax.random.PRNGKey(0), cfg, v)
    u = jax.random.normal(jax.random.PRNGKey(7), (v,))
    prior = {"u": u, "log_s": jnp.float32(1.3)}
    got = np.asarray(lm.support_log_cache({"cache_prior": prior},
                                          ep.support, ep.support_len, v))
    sup, slen = np.asarray(ep.support), np.asarray(ep.support_len)
    s = np.exp(1.3)
    eu = np.exp(np.asarray(u) - np.asarray(u).max())
    p_global = eu / eu.sum()
    for b in range(sup.shape[0]):
        counts = np.zeros(v)
        for k in range(sup.shape[1]):
            for t in range(1, int(slen[b, k])):
                counts[sup[b, k, t]] += 1
        want = np.log((counts + s * p_global) / (counts.sum() + s))
        np.testing.assert_allclose(got[b], want, rtol=1e-5)


def test_global_backoff_grads_flow():
    """Outer grads reach the learned prior (u and log_s) through the
    episodic NLL; uniform mode has no cache_prior params at all."""
    cfg = _cfg()
    params = lm.init_lm(jax.random.PRNGKey(0), cfg, cfg.vocab_size)
    ep = _episode(jax.random.PRNGKey(1), cfg, cfg.vocab_size)

    def loss(p):
        t, c = lm.episodic_nll_stats(p, ep, cfg)
        return t / c
    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["cache_prior"]["u"]).max()) > 0
    assert float(jnp.abs(g["cache_prior"]["log_s"])) > 0

    cfg_u = dataclasses.replace(cfg, cache_backoff="uniform")
    params_u = lm.init_lm(jax.random.PRNGKey(0), cfg_u, cfg_u.vocab_size)
    assert "cache_prior" not in params_u


def test_cache_calib_init_is_exact_identity():
    """cache_calib at init (t[c]=log c, top slot extended multiplicatively
    past CACHE_CALIB_MAX) reproduces the raw-count posterior EXACTLY —
    including counts above the table size."""
    cfg = _cfg(cache_calib=True, vocab_size=8, support_size=16, max_len=20)
    v = cfg.vocab_size
    params = lm.init_lm(jax.random.PRNGKey(0), cfg, v)
    assert "cache_calib" in params
    ep = _episode(jax.random.PRNGKey(1), cfg, v)
    counts = np.asarray(lm.support_counts(ep.support, ep.support_len, v))
    assert counts.max() > lm.CACHE_CALIB_MAX  # the regime that matters
    with_c = lm.support_log_cache(params, ep.support, ep.support_len, v)
    no_c = lm.support_log_cache(
        {k: x for k, x in params.items() if k != "cache_calib"},
        ep.support, ep.support_len, v)
    np.testing.assert_allclose(np.asarray(with_c), np.asarray(no_c),
                               rtol=1e-6)


def test_cache_calib_grads_flow():
    cfg = _cfg(cache_calib=True)
    params = lm.init_lm(jax.random.PRNGKey(0), cfg, cfg.vocab_size)
    ep = _episode(jax.random.PRNGKey(1), cfg, cfg.vocab_size)

    def loss(p):
        t, c = lm.episodic_nll_stats(p, ep, cfg)
        return t / c
    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["cache_calib"]["t"]).max()) > 0


def test_cache_flags_require_support_cache():
    for flag in ("cache_calib", "cache_dynamic"):
        with pytest.raises(ValueError, match="support_cache"):
            _cfg(support_cache=False, **{flag: True})


def test_calib_freq_requires_calib_and_global_backoff():
    with pytest.raises(ValueError, match="cache_calib_freq"):
        _cfg(cache_calib_freq=True)                    # no cache_calib
    with pytest.raises(ValueError, match="cache_calib_freq"):
        _cfg(cache_calib=True, cache_calib_freq=True,
             cache_backoff="uniform")
    _cfg(cache_calib=True, cache_calib_freq=True)      # ok


def test_calib_freq_init_identity_even_with_trained_backoff():
    """a=0 at init: the frequency feature must not change the posterior
    regardless of what the backoff unigram u says."""
    cfg = _cfg(cache_calib=True, cache_calib_freq=True)
    v = cfg.vocab_size
    params = lm.init_lm(jax.random.PRNGKey(0), cfg, v)
    assert "a" in params["cache_calib"]
    params["cache_prior"]["u"] = jax.random.normal(jax.random.PRNGKey(7),
                                                   (v,))
    ep = _episode(jax.random.PRNGKey(1), cfg, v)
    with_a = lm.support_log_cache(params, ep.support, ep.support_len, v)
    no_a = lm.support_log_cache(
        {**params, "cache_calib": {"t": params["cache_calib"]["t"]}},
        ep.support, ep.support_len, v)
    np.testing.assert_allclose(np.asarray(with_a), np.asarray(no_a),
                               rtol=1e-6)


def test_calib_freq_numpy_oracle():
    """phi = exp(t[c-1] + a[c-1]*log(V*p_global)) * c/min(c,MAX) on seen
    words; posterior = (phi + s*p_global)/(sum phi + s)."""
    cfg = _cfg(cache_calib=True, cache_calib_freq=True)
    v = cfg.vocab_size
    params = lm.init_lm(jax.random.PRNGKey(0), cfg, v)
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    params["cache_prior"]["u"] = jax.random.normal(keys[0], (v,))
    params["cache_calib"]["t"] = jax.random.normal(
        keys[1], (lm.CACHE_CALIB_MAX,))
    params["cache_calib"]["a"] = jax.random.normal(
        keys[2], (lm.CACHE_CALIB_MAX,)) * 0.3
    ep = _episode(jax.random.PRNGKey(1), cfg, v)
    got = np.asarray(lm.support_log_cache(params, ep.support,
                                          ep.support_len, v))
    sup, slen = np.asarray(ep.support), np.asarray(ep.support_len)
    u = np.asarray(params["cache_prior"]["u"], np.float64)
    p_g = np.exp(u - u.max())
    p_g /= p_g.sum()
    s = np.exp(float(params["cache_prior"]["log_s"]))
    t_tab = np.asarray(params["cache_calib"]["t"], np.float64)
    a_tab = np.asarray(params["cache_calib"]["a"], np.float64)
    x = np.log(v * p_g)
    for b in range(sup.shape[0]):
        counts = np.zeros(v)
        for k in range(sup.shape[1]):
            for t in range(1, int(slen[b, k])):
                counts[sup[b, k, t]] += 1
        phi = np.zeros(v)
        seen = counts > 0
        idx = np.clip(counts[seen].astype(int) - 1, 0,
                      lm.CACHE_CALIB_MAX - 1)
        phi[seen] = (np.exp(t_tab[idx] + a_tab[idx] * x[seen])
                     * counts[seen] / np.minimum(counts[seen],
                                                 lm.CACHE_CALIB_MAX))
        want = np.log((phi + s * p_g) / (phi.sum() + s))
        np.testing.assert_allclose(got[b], want, rtol=1e-4)


def test_calib_freq_grads_flow_to_slope_not_feature():
    """With a non-uniform backoff, outer grads reach a; the feature is
    stop-gradient so u's grad comes only from its mixture/backoff roles
    (checked by comparing against the a=frozen path)."""
    cfg = _cfg(cache_calib=True, cache_calib_freq=True)
    v = cfg.vocab_size
    params = lm.init_lm(jax.random.PRNGKey(0), cfg, v)
    params["cache_prior"]["u"] = jax.random.normal(jax.random.PRNGKey(7),
                                                   (v,)) * 2.0
    ep = _episode(jax.random.PRNGKey(1), cfg, v)

    def loss(p):
        t, c = lm.episodic_nll_stats(p, ep, cfg)
        return t / c
    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["cache_calib"]["a"]).max()) > 0


@pytest.mark.parametrize("mode,dynamic,model", [
    ("mean_state", False, "lstm"),
    ("mean_state", True, "lstm"),
    ("finetune", False, "lstm"),
    ("mean_state", False, "transformer"),   # tfm_cache_full_aux leg's path
])
def test_cache_lm_aux_train_total_is_mix_plus_aux_lm(mode, dynamic, model):
    """Train-mode total with cache_lm_aux=l == pure mixture total +
    l * LM-branch CE (the latter read off via a gate pinned to g~0);
    eval-mode total is the pure mixture regardless of the flag."""
    lam = 0.7
    cfg = _cfg(support_mode=mode, cache_dynamic=dynamic, dropout=0.0,
               model=model)
    cfg_aux = dataclasses.replace(cfg, cache_lm_aux=lam)
    params = lm.init_lm(jax.random.PRNGKey(0), cfg, cfg.vocab_size)
    params["cache_gate"]["w"] = jax.random.normal(
        jax.random.PRNGKey(1), params["cache_gate"]["w"].shape) * 0.3
    ep = _episode(jax.random.PRNGKey(2), cfg, cfg.vocab_size)

    t_mix, c_mix = lm.episodic_nll_stats(params, ep, cfg)
    t_aux, c_aux = lm.episodic_nll_stats(params, ep, cfg_aux)
    t_aux_eval, _ = lm.episodic_nll_stats(params, ep, cfg_aux,
                                          eval_mode=True)
    p_lm = {**params,
            "cache_gate": {"w": jnp.zeros_like(params["cache_gate"]["w"]),
                           "b": jnp.float32(-30.0)}}
    t_lm, _ = lm.episodic_nll_stats(p_lm, ep, cfg)

    assert float(c_mix) == float(c_aux)
    np.testing.assert_allclose(float(t_aux_eval), float(t_mix), rtol=1e-6)
    np.testing.assert_allclose(float(t_aux), float(t_mix) + lam * float(t_lm),
                               rtol=1e-4)


def test_cache_lm_aux_unsticks_the_starved_lm_gradient():
    """The pathology pin (benchmarks/midi_scale.json plain_cache): with the
    gate saturated toward the cache (b=+30) the LM branch's mixture
    gradient is ~sigmoid(-30)~1e-13 of normal; the auxiliary loss restores
    a full-strength gradient to the LSTM/embedding."""
    cfg = _cfg()
    cfg_aux = dataclasses.replace(cfg, cache_lm_aux=1.0)
    params = lm.init_lm(jax.random.PRNGKey(0), cfg, cfg.vocab_size)
    params["cache_gate"]["b"] = jnp.float32(30.0)
    ep = _episode(jax.random.PRNGKey(1), cfg, cfg.vocab_size)

    def gnorm(c):
        def loss(p):
            t, n = lm.episodic_nll_stats(p, ep, c)
            return t / n
        g = jax.grad(loss)(params)
        return float(optax_global_norm(g["lstm"]))

    starved, unstuck = gnorm(cfg), gnorm(cfg_aux)
    assert starved < 1e-6, starved
    assert unstuck > 1e3 * max(starved, 1e-30), (starved, unstuck)


def optax_global_norm(tree):
    import optax
    return optax.global_norm(tree)


def test_cache_lm_aux_requires_support_cache():
    with pytest.raises(ValueError, match="cache_lm_aux"):
        _cfg(support_cache=False, cache_lm_aux=1.0)
    with pytest.raises(ValueError, match="cache_lm_aux"):
        _cfg(cache_lm_aux=-0.5)


def test_cache_resp_floor_unsticks_starved_and_is_inert_when_healthy():
    """The pre-registered property pair (ROADMAP.md r5 ledger #2) of
    cache_resp_floor=f:

    (a) STARVED regime (gate saturated toward the cache, b=+30, so the
        LM branch's posterior responsibility r_lm ~ 1e-13): the floor
        lifts the LM-branch gradient multiplier to exactly f — the grad
        equals f * the full-strength LM-CE grad (read off via b=-30,
        where the mixture IS the LM branch and r_lm ~ 1).
    (b) HEALTHY regime (b=-30, r_lm ~ 1 >= f everywhere): the term is
        exactly zero in value AND gradient — bit-level-identical grads
        to the no-floor config.  This is the inertness cache_lm_aux
        lacks.
    In BOTH regimes the loss VALUE is the pure mixture."""
    f = 0.25
    cfg = _cfg()
    cfg_floor = dataclasses.replace(cfg, cache_resp_floor=f)
    params = lm.init_lm(jax.random.PRNGKey(0), cfg, cfg.vocab_size)
    ep = _episode(jax.random.PRNGKey(1), cfg, cfg.vocab_size)

    def grad_at(b_gate, c):
        p = {**params, "cache_gate": {"w": params["cache_gate"]["w"],
                                      "b": jnp.float32(b_gate)}}

        def loss(pp):
            t, n = lm.episodic_nll_stats(pp, ep, c)
            return t / n
        return jax.grad(loss)(p), float(loss(p))

    # (a) starved: multiplier floors to exactly f
    g_starved, v_starved = grad_at(30.0, cfg)
    g_floor, v_floor = grad_at(30.0, cfg_floor)
    g_lm, _ = grad_at(-30.0, cfg)
    assert float(optax_global_norm(g_starved["lstm"])) < 1e-6
    np.testing.assert_allclose(v_floor, v_starved, rtol=1e-6)  # pure value
    for leaf_f, leaf_lm in zip(jax.tree.leaves(g_floor["lstm"]),
                               jax.tree.leaves(g_lm["lstm"])):
        np.testing.assert_allclose(np.asarray(leaf_f),
                                   f * np.asarray(leaf_lm),
                                   rtol=1e-4, atol=1e-8)

    # (b) healthy: exactly inert, value and gradient
    g_plain, v_plain = grad_at(-30.0, cfg)
    g_floor_h, v_floor_h = grad_at(-30.0, cfg_floor)
    np.testing.assert_allclose(v_floor_h, v_plain, rtol=1e-6)
    for leaf_f, leaf_p in zip(jax.tree.leaves(g_floor_h),
                              jax.tree.leaves(g_plain)):
        np.testing.assert_array_equal(np.asarray(leaf_f),
                                      np.asarray(leaf_p))


def test_cache_resp_floor_eval_nll_is_pure_mixture():
    """Any eval NLL with the floor on equals the floorless mixture —
    both eval_mode and (because the term is zero-valued) train totals."""
    cfg = _cfg()
    cfg_floor = dataclasses.replace(cfg, cache_resp_floor=0.4)
    params = lm.init_lm(jax.random.PRNGKey(0), cfg, cfg.vocab_size)
    params["cache_gate"]["w"] = jax.random.normal(
        jax.random.PRNGKey(1), params["cache_gate"]["w"].shape) * 0.3
    ep = _episode(jax.random.PRNGKey(2), cfg, cfg.vocab_size)
    t0, c0 = lm.episodic_nll_stats(params, ep, cfg)
    t1, c1 = lm.episodic_nll_stats(params, ep, cfg_floor)
    t2, _ = lm.episodic_nll_stats(params, ep, cfg_floor, eval_mode=True)
    assert float(c0) == float(c1)
    np.testing.assert_allclose(float(t1), float(t0), rtol=1e-6)
    np.testing.assert_allclose(float(t2), float(t0), rtol=1e-6)


def test_cache_resp_floor_config_validation():
    with pytest.raises(ValueError, match="cache_resp_floor"):
        _cfg(support_cache=False, cache_resp_floor=0.25)
    with pytest.raises(ValueError, match="cache_resp_floor"):
        _cfg(cache_resp_floor=1.0)
    with pytest.raises(ValueError, match="cache_resp_floor"):
        _cfg(cache_resp_floor=-0.1)
    _cfg(cache_resp_floor=0.25)                        # ok


def test_dynamic_cache_matches_numpy_oracle():
    """dynamic_cache_target_logp == per-position numpy recount of the
    query's own masked prefix."""
    rows, t_, v = 5, 9, 23
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    phi = jax.random.uniform(k[0], (rows, v)) * 3.0
    total = jnp.sum(phi, axis=-1, keepdims=True)
    s = jnp.float32(0.7)
    p_global = jax.nn.softmax(jax.random.normal(k[1], (v,)))
    targets = jax.random.randint(k[2], (rows, t_), 0, v)
    mask = jax.random.bernoulli(k[3], 0.8, (rows, t_))
    got = np.asarray(lm.dynamic_cache_target_logp(phi, total, s, p_global,
                                                  targets, mask))
    phi_n, tot_n = np.asarray(phi), np.asarray(total)
    p_n, tg, m = np.asarray(p_global), np.asarray(targets), np.asarray(mask)
    for r in range(rows):
        c = np.zeros(v)
        plen = 0.0
        for t in range(t_):
            w = tg[r, t]
            want = (np.log(phi_n[r, w] + c[w] + 0.7 * p_n[w])
                    - np.log(tot_n[r, 0] + plen + 0.7))
            np.testing.assert_allclose(got[r, t], want, rtol=1e-5)
            if m[r, t]:
                c[w] += 1.0
                plen += 1.0


def test_dynamic_gate_full_matches_cache_only_nll():
    """b=+30 with cache_dynamic: episodic NLL equals scoring each query
    under support counts + its own running prefix counts (numpy)."""
    cfg = _cfg(cache_dynamic=True)
    v = cfg.vocab_size
    params = lm.init_lm(jax.random.PRNGKey(0), cfg, v)
    params["cache_gate"]["b"] = jnp.float32(30.0)
    ep = _episode(jax.random.PRNGKey(1), cfg, v)
    total, count = lm.episodic_nll_stats(params, ep, cfg)

    sup, slen = np.asarray(ep.support), np.asarray(ep.support_len)
    qry, qlen = np.asarray(ep.query), np.asarray(ep.query_len)
    alpha = lm.CACHE_ALPHA
    want, n = 0.0, 0
    for b in range(sup.shape[0]):
        base = np.zeros(v)
        for k in range(sup.shape[1]):
            for t in range(1, int(slen[b, k])):
                base[sup[b, k, t]] += 1
        for q in range(qry.shape[1]):
            c = base.copy()
            plen = c.sum()
            for t in range(1, int(qlen[b, q])):
                w = qry[b, q, t]
                want -= (np.log(c[w] + alpha)
                         - np.log(plen + alpha * v))
                c[w] += 1.0
                plen += 1.0
                n += 1
    assert int(count) == n
    np.testing.assert_allclose(float(total), want, rtol=1e-5)


def test_dynamic_sampling_self_reinforces():
    """Empty support + all-cache gate: the continuous cache feeds emitted
    tokens back, so the sampler repeats itself far above the uniform
    rate."""
    from fewshot import sampling
    cfg = _cfg(cache_dynamic=True, top_k=0, sample_tokens=24)
    v = cfg.vocab_size
    params = lm.init_lm(jax.random.PRNGKey(0), cfg, v)
    params["cache_gate"]["b"] = jnp.float32(30.0)
    ep = _episode(jax.random.PRNGKey(1), cfg, v)
    slen = jnp.ones_like(ep.support_len)          # zero support counts
    toks = np.asarray(sampling.generate(params, ep.support, slen,
                                        jax.random.PRNGKey(2), cfg))
    rep, tot = 0, 0
    for b in range(toks.shape[0]):
        seen = set()
        for t in toks[b]:
            t = int(t)
            if t == 0:                            # PAD tail
                continue
            if t in seen:
                rep += 1
            seen.add(t)
            tot += 1
    # uniform-without-feedback repeat rate over 24 draws from 64 ids is
    # ~16%; the continuous cache at alpha=0.01 drives it far higher
    assert tot > 0 and rep / tot > 0.5, (rep, tot)


def test_global_backoff_sampling_uses_prior():
    """A prior spiked on one token steers sampling when counts are empty
    for it: push log_s high, u one-hot -> that token dominates the cache."""
    from fewshot import sampling
    cfg = _cfg(top_k=0, sample_tokens=12)
    v = cfg.vocab_size
    params = lm.init_lm(jax.random.PRNGKey(0), cfg, v)
    params["cache_gate"]["b"] = jnp.float32(30.0)     # all-cache mixture
    tok = 17
    params["cache_prior"]["u"] = jnp.zeros((v,)).at[tok].set(25.0)
    params["cache_prior"]["log_s"] = jnp.float32(12.0)  # prior >> counts
    ep = _episode(jax.random.PRNGKey(1), cfg, v)
    toks = np.asarray(sampling.generate(params, ep.support, ep.support_len,
                                        jax.random.PRNGKey(2), cfg))
    emitted = [int(t) for t in toks.ravel() if t != 0]
    frac = sum(1 for t in emitted if t == tok) / max(len(emitted), 1)
    assert frac > 0.9, (frac, emitted[:20])
