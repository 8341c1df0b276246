"""Host-streaming episode pipeline for corpora beyond HBM residency.

The default pipeline (data/episodes.py) keeps the whole packed corpus in HBM
and samples episodes on device — optimal at song-corpus scale.  For corpora
that do NOT fit in HBM (production-scale catalogs), this module keeps tokens
in host RAM and streams episode batches:

  * a background thread assembles [B, K+Q, L] episode batches with numpy
    (the gather is per-episode-cheap on host; only the SELECTED songs cross
    PCIe, not the corpus);
  * batches are prefetched into a bounded queue and `jax.device_put` with
    the step's target sharding, so H2D copies overlap the previous step's
    compute (double buffering);
  * the train step takes the episode as an ARGUMENT
    (training.make_fed_train_step) instead of sampling in-graph.

Select with `pipeline: host` in the task YAML.  Semantics match the
on-device sampler (uniform artist, without-replacement songs, identical
padding), but the PRNG is numpy's — step-for-step loss curves differ from
`pipeline: device` while distributions match.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from fewshot.data.episodes import Episode


class HostEpisodePipeline:
    """Background-threaded episode prefetcher over a host-resident corpus."""

    def __init__(self, corpus, split: str, batch_size: int, k: int, q: int,
                 seed: int = 0, prefetch: int = 2, sharding=None):
        import jax
        self.corpus = corpus
        self.batch = batch_size
        self.k, self.q = k, q
        self.sharding = sharding
        self._rng = np.random.RandomState(seed)
        self._artists = [int(a) for a in corpus.splits[split]]
        self._songs_of = {
            a: corpus.artist_song_ids[a][: int(corpus.artist_num_songs[a])]
            for a in self._artists}
        self._queue: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._jax = jax
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    # -- host-side assembly ---------------------------------------------------

    def _one_episode(self):
        artist = self._artists[self._rng.randint(len(self._artists))]
        pool = self._songs_of[artist]
        n = self.k + self.q
        if len(pool) >= n:
            ids = self._rng.choice(pool, size=n, replace=False)
        else:
            ids = np.concatenate([
                self._rng.permutation(pool),
                self._rng.choice(pool, size=n - len(pool))])
        return ids, artist

    def _make_batch(self) -> Episode:
        c = self.corpus
        n = self.k + self.q
        song_ids = np.zeros((self.batch, n), np.int32)
        artists = np.zeros((self.batch,), np.int32)
        for b in range(self.batch):
            song_ids[b], artists[b] = self._one_episode()
        tokens = c.songs[song_ids]          # [B, K+Q, L] gather on host
        lens = c.song_len[song_ids]
        return Episode(
            support=tokens[:, : self.k], support_len=lens[:, : self.k],
            query=tokens[:, self.k:], query_len=lens[:, self.k:],
            artist=artists)

    def _producer(self) -> None:
        while not self._stop.is_set():
            batch = self._make_batch()
            # device_put here (producer thread) so the H2D copy overlaps the
            # consumer's compute; sharding places the batch dim on the mesh.
            if self.sharding is not None:
                batch = Episode(*(self._jax.device_put(x, self.sharding)
                                  for x in batch))
            else:
                batch = Episode(*(self._jax.device_put(np.asarray(x))
                                  for x in batch))
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.1)
                    break
                except queue.Full:
                    continue

    # -- consumer ---------------------------------------------------------------

    def __next__(self) -> Episode:
        return self._queue.get()

    def __iter__(self):
        return self

    def close(self) -> None:
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5)
