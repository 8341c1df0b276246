"""Fine-tune episodic variant (per-episode inner SGD, vmapped)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fewshot import training
from fewshot.config import Config
from fewshot.data import episodes as eps
from fewshot.data.episodes import Episode
from fewshot.models import lm as lm_mod

CFG = Config(vocab_size=64, max_len=24, embed_dim=16, hidden_dim=24,
             num_layers=1, batch_size=4, support_size=2, query_size=2,
             support_mode="finetune", inner_steps=2, inner_lr=0.5,
             data_parallel=False)


def _episode(b=2, k=2, q=2, L=10, vmax=64, seed=0):
    rng = np.random.RandomState(seed)
    return Episode(
        jnp.asarray(rng.randint(4, vmax, (b, k, L)), jnp.int32),
        jnp.full((b, k), L, jnp.int32),
        jnp.asarray(rng.randint(4, vmax, (b, q, L)), jnp.int32),
        jnp.full((b, q), L, jnp.int32),
        jnp.zeros((b,), jnp.int32))


def test_zero_inner_steps_equals_no_adaptation():
    cfg0 = dataclasses.replace(CFG, inner_steps=0)
    cfg_none = dataclasses.replace(CFG, support_mode="none")
    params = lm_mod.init_lm(jax.random.PRNGKey(0), CFG, CFG.vocab_size)
    ep = _episode()
    a = lm_mod.episodic_nll_stats(params, ep, cfg0)
    b = lm_mod.episodic_nll_stats(params, ep, cfg_none)
    np.testing.assert_allclose(float(a[0]), float(b[0]), rtol=1e-6)
    assert float(a[1]) == float(b[1])


def test_adaptation_helps_when_query_repeats_support():
    """Query == support songs: inner steps must strictly lower query NLL."""
    params = lm_mod.init_lm(jax.random.PRNGKey(1), CFG, CFG.vocab_size)
    ep = _episode(seed=3)
    ep = ep._replace(query=ep.support, query_len=ep.support_len)
    cfg0 = dataclasses.replace(CFG, inner_steps=0)
    n0 = lm_mod.episodic_nll_stats(params, ep, cfg0)
    n2 = lm_mod.episodic_nll_stats(params, ep, CFG)
    assert float(n2[0]) / float(n2[1]) < float(n0[0]) / float(n0[1])


def test_outer_gradients_finite():
    params = lm_mod.init_lm(jax.random.PRNGKey(2), CFG, CFG.vocab_size)
    ep = _episode(seed=4)

    def loss(p):
        t, c = lm_mod.episodic_nll_stats(p, ep, CFG)
        return t / c

    for first_order in (True, False):
        cfg = dataclasses.replace(CFG, first_order=first_order)
        def loss_fo(p, cfg=cfg):
            t, c = lm_mod.episodic_nll_stats(p, ep, cfg)
            return t / c
        g = jax.grad(loss_fo)(params)
        leaves = jax.tree.leaves(g)
        assert all(bool(jnp.isfinite(x).all()) for x in leaves)
        # at least some gradient reaches the shared init
        assert any(float(jnp.abs(x).max()) > 0 for x in leaves)


def test_meta_training_runs(tiny_corpus):
    data = eps.put_corpus(tiny_corpus)
    split = jnp.asarray(tiny_corpus.splits["train"])
    step = training.make_train_step(CFG, data, split)
    state = training.init_train_state(CFG, 64)
    first = None
    for _ in range(15):
        state, m = step(state)
        first = first if first is not None else float(m["loss"])
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < first


def test_finetune_cache_zero_steps_matches_main_path():
    """support_cache composes with finetune: at inner_steps=0 the vmapped
    finetune+cache scoring must equal the main (batched) cache path with
    support_mode="none" — same mixture, different program shape."""
    for dyn in (False, True):
        cfg_ft = dataclasses.replace(
            CFG, inner_steps=0, support_cache=True, cache_backoff="global",
            cache_calib=True, cache_calib_freq=True, cache_dynamic=dyn)
        cfg_main = dataclasses.replace(cfg_ft, support_mode="none")
        params = lm_mod.init_lm(jax.random.PRNGKey(5), cfg_ft,
                                CFG.vocab_size)
        ep = _episode(b=3, seed=6)
        a = lm_mod.episodic_nll_stats(params, ep, cfg_ft)
        b = lm_mod.episodic_nll_stats(params, ep, cfg_main)
        np.testing.assert_allclose(float(a[0]), float(b[0]), rtol=1e-5)
        assert float(a[1]) == float(b[1])


def test_finetune_cache_outer_gradients_finite_and_train_step_runs(
        tiny_corpus):
    cfg = dataclasses.replace(CFG, support_cache=True,
                              cache_backoff="global", cache_calib=True,
                              cache_dynamic=True)
    params = lm_mod.init_lm(jax.random.PRNGKey(7), cfg, cfg.vocab_size)
    ep = _episode(seed=8)

    def loss(p):
        t, c = lm_mod.episodic_nll_stats(p, ep, cfg)
        return t / c

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)
    # the cache gate is downstream of the query scoring, so it must train
    assert float(jnp.abs(g["cache_gate"]["w"]).max()) > 0

    data = eps.put_corpus(tiny_corpus)
    split = jnp.asarray(tiny_corpus.splits["train"])
    step = training.make_train_step(cfg, data, split)
    state = training.init_train_state(cfg, 64)
    state, m = step(state)
    assert np.isfinite(float(m["loss"]))


def test_finetune_sampling_uses_support():
    """Generation under support_mode=finetune must adapt to the support —
    different supports give different greedy continuations, same support is
    reproducible."""
    from fewshot import sampling
    cfg = dataclasses.replace(CFG, top_k=1, sample_tokens=10,
                              inner_steps=2, inner_lr=0.5)
    params = lm_mod.init_lm(jax.random.PRNGKey(0), cfg, cfg.vocab_size)
    rng = np.random.RandomState(0)
    s1 = jnp.asarray(rng.randint(4, 64, (1, 2, 10)), jnp.int32)
    s2 = jnp.asarray(rng.randint(4, 64, (1, 2, 10)), jnp.int32)
    slen = jnp.full((1, 2), 10, jnp.int32)
    t1 = sampling.generate(params, s1, slen, jax.random.PRNGKey(1), cfg)
    t1b = sampling.generate(params, s1, slen, jax.random.PRNGKey(2), cfg)
    t2 = sampling.generate(params, s2, slen, jax.random.PRNGKey(1), cfg)
    assert t1.shape == (1, 10)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t1b))  # greedy
    assert not np.array_equal(np.asarray(t1), np.asarray(t2))


def test_finetune_cache_sampling_valid_ids():
    """Generation composes finetune adaptation with the cache mixture."""
    from fewshot import sampling
    cfg = dataclasses.replace(CFG, sample_tokens=8, support_cache=True,
                              cache_backoff="global", cache_calib=True,
                              cache_dynamic=True)
    params = lm_mod.init_lm(jax.random.PRNGKey(0), cfg, cfg.vocab_size)
    rng = np.random.RandomState(1)
    sup = jnp.asarray(rng.randint(4, 64, (2, 2, 10)), jnp.int32)
    slen = jnp.full((2, 2), 10, jnp.int32)
    toks = np.asarray(sampling.generate(params, sup, slen,
                                        jax.random.PRNGKey(1), cfg))
    assert toks.shape == (2, 8)
    assert (toks >= 0).all() and (toks < 64).all()
