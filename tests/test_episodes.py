"""On-device episode sampler vs host oracle (SURVEY.md §5.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from fewshot.data import episodes as eps


def _device(tiny_corpus):
    return eps.put_corpus(tiny_corpus)


def test_episode_invariants(tiny_corpus):
    data = _device(tiny_corpus)
    split = jnp.asarray(tiny_corpus.splits["train"])
    k, q = 2, 2
    ep = eps.sample_episode(jax.random.PRNGKey(3), data, split, 16, k=k, q=q)
    assert ep.support.shape == (16, k, tiny_corpus.max_len)
    assert ep.query.shape == (16, q, tiny_corpus.max_len)

    split_set = set(int(a) for a in tiny_corpus.splits["train"])
    for b in range(16):
        artist = int(ep.artist[b])
        assert artist in split_set
        # every selected song belongs to the episode's artist and its
        # content matches the packed corpus row exactly
        all_tokens = np.concatenate([np.asarray(ep.support[b]),
                                     np.asarray(ep.query[b])])
        all_lens = np.concatenate([np.asarray(ep.support_len[b]),
                                   np.asarray(ep.query_len[b])])
        for tokens, ln in zip(all_tokens, all_lens):
            matches = np.where((tiny_corpus.songs == tokens).all(1))[0]
            assert len(matches) >= 1
            assert any(int(tiny_corpus.song_artist[m]) == artist
                       for m in matches)
            assert int(tiny_corpus.song_len[matches[0]]) == ln


def test_without_replacement(tiny_corpus):
    # 6 songs per artist, k+q=6 -> all six songs distinct
    data = _device(tiny_corpus)
    split = jnp.asarray(tiny_corpus.splits["train"])
    ep = eps.sample_episode(jax.random.PRNGKey(0), data, split, 8, k=3, q=3)
    for b in range(8):
        rows = np.concatenate([np.asarray(ep.support[b]),
                               np.asarray(ep.query[b])])
        assert len(np.unique(rows, axis=0)) == 6


def test_deterministic(tiny_corpus):
    data = _device(tiny_corpus)
    split = jnp.asarray(tiny_corpus.splits["train"])
    a = eps.sample_episode(jax.random.PRNGKey(5), data, split, 4, k=2, q=1)
    b = eps.sample_episode(jax.random.PRNGKey(5), data, split, 4, k=2, q=1)
    np.testing.assert_array_equal(np.asarray(a.support), np.asarray(b.support))
    c = eps.sample_episode(jax.random.PRNGKey(6), data, split, 4, k=2, q=1)
    assert not np.array_equal(np.asarray(a.support), np.asarray(c.support))


def test_artist_coverage(tiny_corpus):
    # uniform artist choice: all split artists appear over many episodes
    data = _device(tiny_corpus)
    split = jnp.asarray(tiny_corpus.splits["train"])
    ep = eps.sample_episode(jax.random.PRNGKey(1), data, split, 256, k=1, q=1)
    seen = set(int(a) for a in np.asarray(ep.artist))
    assert seen == set(int(a) for a in tiny_corpus.splits["train"])


def test_lm_batch(tiny_corpus):
    data = _device(tiny_corpus)
    pool = jnp.asarray(eps.split_song_pool(tiny_corpus, "train"))
    toks, lens = eps.sample_lm_batch(jax.random.PRNGKey(0), data, pool, 8)
    assert toks.shape == (8, tiny_corpus.max_len)
    pool_set = set(int(i) for i in np.asarray(pool))
    for row, ln in zip(np.asarray(toks), np.asarray(lens)):
        m = np.where((tiny_corpus.songs == row).all(1))[0]
        assert any(int(i) in pool_set for i in m)
        assert int(tiny_corpus.song_len[m[0]]) == int(ln)
