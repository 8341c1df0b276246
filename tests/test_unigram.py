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
