"""Unigram baselines vs a numpy oracle (SURVEY.md §2 simple baselines)."""

import jax
import jax.numpy as jnp
import numpy as np

from fewshot.data import episodes as eps
from fewshot.data.vocab import PAD
from fewshot.models import unigram as U


def test_global_unigram_matches_numpy(tiny_corpus):
    data = eps.put_corpus(tiny_corpus)
    pool = eps.split_song_pool(tiny_corpus, "train")
    v = len(tiny_corpus.vocab)
    glp = np.asarray(U.fit_global(data.songs, data.song_len,
                                  jnp.asarray(pool), v))

    # numpy oracle: count target tokens (positions 1..len-1)
    counts = np.zeros(v)
    for i in pool:
        ln = int(tiny_corpus.song_len[i])
        for tok in tiny_corpus.songs[i][1:ln]:
            counts[int(tok)] += 1
    counts[PAD] = 0
    want = np.log((counts + 1.0) / (counts + 1.0).sum())
    np.testing.assert_allclose(glp, want, rtol=1e-5)
    np.testing.assert_allclose(np.exp(glp).sum(), 1.0, rtol=1e-5)


def test_episodic_unigram_beats_global_on_support_heavy_corpus(tiny_corpus):
    """Support conditioning must help: per-artist styles mean the posterior
    unigram scores query songs better than the global prior."""
    data = eps.put_corpus(tiny_corpus)
    v = len(tiny_corpus.vocab)
    pool = jnp.asarray(eps.split_song_pool(tiny_corpus, "train"))
    glp = U.fit_global(data.songs, data.song_len, pool, v)
    split = jnp.asarray(tiny_corpus.splits["train"])

    tot_e = cnt_e = tot_g = cnt_g = 0.0
    for i in range(8):
        ep = eps.sample_episode(jax.random.PRNGKey(i), data, split, 16,
                                k=3, q=3)
        te, ce = U.episodic_nll_stats(ep, glp, v)
        b, q_, L = ep.query.shape
        tg, cg = U.lm_nll_stats(ep.query.reshape(b * q_, L),
                                ep.query_len.reshape(b * q_), glp)
        tot_e += float(te); cnt_e += float(ce)
        tot_g += float(tg); cnt_g += float(cg)
    assert cnt_e == cnt_g
    assert tot_e / cnt_e < tot_g / cnt_g   # support counts help


def test_unigram_eval_sharded_over_mesh(tiny_corpus):
    """evaluate_unigram under a mesh: psum'd stats, deterministic, sane.

    Same sharding contract as training.make_eval_step — chips sample
    disjoint PRNG folds of the batch and (ce_sum, count) are psum'd — so
    multi-process floor evals split the work (r3 verdict weak #5)."""
    from fewshot.config import Config
    from fewshot.parallel.mesh import make_mesh

    assert jax.device_count() == 8   # conftest forced 8 virtual devices
    mesh = make_mesh()
    cfg = Config(vocab_size=64, max_len=tiny_corpus.max_len, embed_dim=16,
                 hidden_dim=32, num_layers=1, batch_size=16,
                 support_size=2, query_size=2, eval_episodes=32,
                 data_parallel=True)
    data = eps.put_corpus(tiny_corpus, mesh=mesh)
    split = jnp.asarray(tiny_corpus.splits["val"])
    key = jax.random.PRNGKey(3)
    nll = U.evaluate_unigram(cfg, tiny_corpus, data, split, key, mesh=mesh)
    nll2 = U.evaluate_unigram(cfg, tiny_corpus, data, split, key, mesh=mesh)
    assert nll == nll2                       # deterministic under fixed key
    assert 0.0 < nll < np.log(64) + 2.0      # a valid distribution's NLL

    # count accounting stays exact under sharding: the psum'd token count
    # equals the sum of per-shard masked counts for the same folded keys
    step = U.make_unigram_eval_step(cfg, data, split, 64, mesh=mesh)
    pool = jnp.asarray(eps.split_song_pool(tiny_corpus, "train"))
    glp = U.fit_global(data.songs, data.song_len, pool, 64)
    _, count = step(glp, key)
    want = 0.0
    local_b = cfg.batch_size // 8
    for idx in range(8):
        ep = eps.sample_episode(jax.random.fold_in(key, idx), data, split,
                                local_b, k=2, q=2)
        want += float(jnp.sum(jnp.maximum(ep.query_len - 1, 0)))
    assert float(count) == want


def test_episodic_unigram_valid_distribution(tiny_corpus):
    data = eps.put_corpus(tiny_corpus)
    v = len(tiny_corpus.vocab)
    pool = jnp.asarray(eps.split_song_pool(tiny_corpus, "train"))
    glp = U.fit_global(data.songs, data.song_len, pool, v)
    split = jnp.asarray(tiny_corpus.splits["val"])
    ep = eps.sample_episode(jax.random.PRNGKey(0), data, split, 4, k=2, q=2)
    total, count = U.episodic_nll_stats(ep, glp, v)
    nll = float(total) / float(count)
    assert 0.0 < nll < np.log(v) + 2.0
