"""On-device episode sampling: PRNG key -> [B, K/Q, L] gathers, fully jitted.

Reference equivalent (SURVEY.md §2 L2, §4.1): `EpisodeSampler.get_episode`,
which the reference runs as a per-step Python loop over CSV rows — its main
bottleneck (BASELINE.json:5).  Here the packed corpus lives in HBM and an
episode is three XLA ops: artist choice, Gumbel-top-k song choice without
replacement, and a `take` gather.  The sampler is vmapped over the meta-batch
and fused into the train step, so episode assembly costs ~0 host time.

Static-shape tricks (SURVEY.md §8 "hard parts" #1):
  * without-replacement choice of K+Q songs = top-(K+Q) of per-slot Gumbel
    noise, with slots >= artist_num_songs masked to -inf;
  * artists with fewer than K+Q songs fall back to with-replacement draws
    for the overflow ranks (the reference would simply never pick such an
    artist; we keep shapes static instead);
  * ragged song lengths ride along as `*_len` arrays; masks are derived
    in the model (models/lm.py), not stored.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Episode(NamedTuple):
    """One meta-batch of episodes (all int32, static shapes)."""
    support: jax.Array      # [B, K, L]
    support_len: jax.Array  # [B, K]
    query: jax.Array        # [B, Q, L]
    query_len: jax.Array    # [B, Q]
    artist: jax.Array       # [B]


class CorpusOnDevice(NamedTuple):
    """The packed-corpus arrays after one-time device_put (HBM-resident)."""
    songs: jax.Array             # [S, L]
    song_len: jax.Array          # [S]
    artist_song_ids: jax.Array   # [A, M]
    artist_num_songs: jax.Array  # [A]


def put_corpus(corpus, mesh=None) -> CorpusOnDevice:
    """One-time HBM upload of a PackedCorpus (or its device_arrays dict).

    With `mesh` (multi-process runs), arrays are device_put fully REPLICATED
    over the global mesh — required so the corpus can be closed over inside
    shard_map when jax.devices() spans hosts (process-local arrays are not
    addressable from other hosts)."""
    d = corpus.device_arrays() if hasattr(corpus, "device_arrays") else corpus

    def put(x, dtype):
        arr = np.asarray(x, dtype)
        if mesh is None:
            return jnp.asarray(arr)
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(arr, NamedSharding(mesh, P()))

    return CorpusOnDevice(
        songs=put(d["songs"], np.int32),
        song_len=put(d["song_len"], np.int32),
        artist_song_ids=put(d["artist_song_ids"], np.int32),
        artist_num_songs=put(d["artist_num_songs"], np.int32),
    )


def _choose_songs(k_gumbel: jax.Array, k_fallback: jax.Array,
                  data: CorpusOnDevice, artist: jax.Array,
                  n_songs: int) -> tuple[jax.Array, jax.Array]:
    """Without-replacement song choice for one artist (the ONE impl shared
    by training and serving, so episode semantics can't drift between the
    two paths).  Returns (song_ids [n_songs], lengths [n_songs])."""
    row = data.artist_song_ids[artist]                     # [M]
    n = data.artist_num_songs[artist]                      # scalar
    m = row.shape[0]

    # Gumbel top-k = uniform sample of n_songs distinct valid slots.
    gumbel = jax.random.gumbel(k_gumbel, (m,))
    scores = jnp.where(jnp.arange(m) < n, gumbel, -jnp.inf)
    _, slots = jax.lax.top_k(scores, n_songs)              # [n_songs]

    # Overflow ranks (artist has < n_songs songs): draw with replacement.
    fallback = jax.random.randint(k_fallback, (n_songs,), 0,
                                  jnp.maximum(n, 1))
    slots = jnp.where(jnp.arange(n_songs) < n, slots, fallback)

    song_ids = row[slots]
    return song_ids, data.song_len[song_ids]


def _sample_one(key: jax.Array, data: CorpusOnDevice, split_artists: jax.Array,
                n_songs: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One episode's song ids: (song_ids [n_songs], lengths, artist)."""
    k_artist, k_gumbel, k_fallback = jax.random.split(key, 3)
    artist = split_artists[
        jax.random.randint(k_artist, (), 0, split_artists.shape[0])]
    song_ids, lens = _choose_songs(k_gumbel, k_fallback, data, artist,
                                   n_songs)
    return song_ids, lens, artist


@partial(jax.jit, static_argnames=("batch_size", "k", "q"))
def sample_episode(key: jax.Array, data: CorpusOnDevice,
                   split_artists: jax.Array, batch_size: int | None = None,
                   *, k: int, q: int) -> Episode:
    """Sample a meta-batch of episodes entirely on device.

    `key` may be a single PRNG key (batch_size must be given) or a [B, 2]
    batch of keys.  Returns an Episode with support [B,k,L], query [B,q,L].
    """
    if k + q > data.artist_song_ids.shape[1]:
        raise ValueError(
            f"episode needs k+q={k + q} songs but the corpus's largest "
            f"artist has only {data.artist_song_ids.shape[1]} "
            f"(lax.top_k requires k <= table width)")
    if key.ndim == 1:
        keys = jax.random.split(key, batch_size)
    else:
        keys = key
    song_ids, lens, artists = jax.vmap(
        lambda kk: _sample_one(kk, data, split_artists, k + q))(keys)
    tokens = data.songs[song_ids]                          # [B, k+q, L]
    return Episode(
        support=tokens[:, :k], support_len=lens[:, :k],
        query=tokens[:, k:], query_len=lens[:, k:], artist=artists)


@partial(jax.jit, static_argnames=("k", "q"))
def sample_episode_for_artists(keys: jax.Array, data: CorpusOnDevice,
                               artists: jax.Array, *, k: int,
                               q: int) -> Episode:
    """Episodes for GIVEN artist ids (serving: per-request artists).

    keys [B, 2] per-row PRNG keys, artists [B] int32.  Song choice matches
    sample_episode (Gumbel top-k without replacement)."""
    def one(key, artist):
        k_gumbel, k_fallback = jax.random.split(key)
        return _choose_songs(k_gumbel, k_fallback, data, artist, k + q)

    song_ids, lens = jax.vmap(one)(keys, artists)
    tokens = data.songs[song_ids]
    return Episode(
        support=tokens[:, :k], support_len=lens[:, :k],
        query=tokens[:, k:], query_len=lens[:, k:], artist=artists)


@partial(jax.jit, static_argnames=("batch_size",))
def sample_lm_batch(key: jax.Array, data: CorpusOnDevice,
                    song_pool: jax.Array,
                    batch_size: int) -> tuple[jax.Array, jax.Array]:
    """Plain (non-episodic) LM batch: B songs uniform over a split's pool.

    Reference config #1 (BASELINE.json:7): plain word-LSTM LM, single split.
    Returns (tokens [B, L], lengths [B]).
    """
    ids = song_pool[jax.random.randint(key, (batch_size,), 0,
                                       song_pool.shape[0])]
    return data.songs[ids], data.song_len[ids]


def split_song_pool(corpus, split: str) -> np.ndarray:
    """Host-side: all song ids whose artist belongs to `split`."""
    artists = set(int(a) for a in corpus.splits[split])
    mask = np.array([int(a) in artists for a in corpus.song_artist])
    return np.nonzero(mask)[0].astype(np.int32)


def base_token_ratio(corpus, split: str | None = None,
                     song_ids: np.ndarray | None = None) -> float:
    """targets(bpe)/targets(base) — the NLL-per-base-token rescale.

    BPE-token NLL isn't comparable to base-token NLL; multiplying by this
    ratio converts it (exact in expectation over episodes).  Computed over
    a split's whole song pool, or over explicit `song_ids` (e.g. a fixed
    eval set's query songs).  1.0 for non-BPE corpora.  Single source for
    fewshot/cli.py and the benchmark scripts."""
    if not (corpus.merges and corpus.base_song_len is not None):
        return 1.0
    pool = song_ids if song_ids is not None else split_song_pool(corpus,
                                                                 split)
    bpe_t = np.maximum(corpus.song_len[pool] - 1, 0).sum()
    base_t = np.maximum(corpus.base_song_len[pool] - 1, 0).sum()
    return float(bpe_t) / max(float(base_t), 1.0)


# ---------------------------------------------------------------------------
# Fixed episode sets: continuous-eval harness (ROADMAP r1 #5)
# ---------------------------------------------------------------------------

def save_episode_set(path, corpus, split: str, n: int, k: int, q: int,
                     seed: int = 0) -> None:
    """Draw n episodes' SONG INDICES host-side and save them (npz).

    A saved set pins eval to exact (artist, songs) tuples, so the score of
    a checkpoint is identical across runs, batch sizes, pipelines, and
    future sampler changes — the eval is data, not code."""
    rng = np.random.RandomState(seed)
    artists = np.asarray(corpus.splits[split])
    song_ids = np.zeros((n, k + q), np.int32)
    ep_artist = np.zeros((n,), np.int32)
    for i in range(n):
        a = int(artists[rng.randint(len(artists))])
        row = corpus.artist_song_ids[a][: int(corpus.artist_num_songs[a])]
        take = rng.choice(len(row), size=min(k + q, len(row)),
                          replace=False)
        while len(take) < k + q:
            take = np.concatenate([take, rng.choice(len(row), size=1)])
        song_ids[i] = row[take]
        ep_artist[i] = a
    np.savez(path, song_ids=song_ids, artist=ep_artist,
             k=np.int32(k), q=np.int32(q), split=np.str_(split))


def load_episode_set(path) -> tuple[np.ndarray, np.ndarray, int, int]:
    z = np.load(path, allow_pickle=False)
    return z["song_ids"], z["artist"], int(z["k"]), int(z["q"])


def gather_episode(data: CorpusOnDevice, song_ids: jax.Array,
                   artist: jax.Array, k: int, q: int) -> Episode:
    """Materialize an Episode from explicit song indices [B, k+q]."""
    tokens = data.songs[song_ids]
    lens = data.song_len[song_ids]
    return Episode(support=tokens[:, :k], support_len=lens[:, :k],
                   query=tokens[:, k:], query_len=lens[:, k:],
                   artist=artist)
