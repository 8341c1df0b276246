"""Unigram baselines: the reference's non-neural sanity models.

Reference equivalent (SURVEY.md §2 "Simple baselines" in models/baselines.py,
low-confidence entry): count-based LMs that bound what the neural models must
beat.

Two variants, both pure XLA (one-hot scatter counts, no Python loops):
  * global unigram — smoothed token frequencies over the train split;
  * episodic unigram — per-episode Dirichlet posterior: support-set counts
    mixed with the global prior (prior_strength pseudo-counts), the
    few-shot analogue.  Beating THIS (not just the global model) is what
    shows a neural model actually uses the support set.

NLL semantics are identical to the neural path (targets 1..len-1, PAD
masked), so numbers are directly comparable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from fewshot.data.episodes import Episode
from fewshot.data.vocab import PAD
from fewshot.models.lm import shift_targets


def _masked_counts(tokens: jax.Array, lengths: jax.Array,
                   vocab_size: int) -> jax.Array:
    """Counts over TARGET positions (1..len-1), i.e. what NLL is scored on."""
    _, targets, mask = shift_targets(tokens, lengths)
    onehot = jax.nn.one_hot(targets, vocab_size, dtype=jnp.float32)
    return jnp.sum(onehot * mask[..., None].astype(jnp.float32),
                   axis=tuple(range(targets.ndim)))


@partial(jax.jit, static_argnames=("vocab_size",))
def fit_global(songs: jax.Array, song_len: jax.Array, song_pool: jax.Array,
               vocab_size: int, alpha: float = 1.0) -> jax.Array:
    """Smoothed global log-probs [V] from a split's songs.

    Scatter-add, not one-hot: the pool is the whole split (tens of
    thousands of songs), so the one-hot intermediate is [pool, L-1, V] —
    ~150GB at the V=5000 scale corpus.  XLA:TPU fuses it away but the
    CPU backend materializes it and dies; a scatter-add is O(V) memory
    on every backend, and this fit runs once per eval, not per step.
    """
    _, targets, mask = shift_targets(songs[song_pool], song_len[song_pool])
    counts = jnp.zeros((vocab_size,), jnp.float32).at[
        targets.reshape(-1)].add(mask.reshape(-1).astype(jnp.float32))
    counts = counts.at[PAD].set(0.0)
    smoothed = counts + alpha
    return jnp.log(smoothed / jnp.sum(smoothed))


@partial(jax.jit, static_argnames=("vocab_size",))
def episodic_nll_stats(ep: Episode, global_log_probs: jax.Array,
                       vocab_size: int, prior_strength: float = 50.0
                       ) -> tuple[jax.Array, jax.Array]:
    """(ce_sum, count) of the per-episode Dirichlet-posterior unigram."""
    sup_counts = jax.vmap(
        lambda s, l: _masked_counts(s, l, vocab_size))(
            ep.support, ep.support_len)                       # [B, V]
    prior = jnp.exp(global_log_probs) * prior_strength
    post = sup_counts + prior[None]
    log_p = jnp.log(post / jnp.sum(post, axis=-1, keepdims=True))  # [B, V]

    _, targets, mask = shift_targets(ep.query, ep.query_len)   # [B,Q,L-1]
    tok_lp = jnp.take_along_axis(
        log_p[:, None, None, :],
        targets[..., None], axis=-1)[..., 0]
    m = mask.astype(jnp.float32)
    return -jnp.sum(tok_lp * m), jnp.sum(m)


@partial(jax.jit, static_argnames=())
def lm_nll_stats(tokens: jax.Array, lengths: jax.Array,
                 log_probs: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(ce_sum, count) of the global unigram on a [B, T] batch."""
    _, targets, mask = shift_targets(tokens, lengths)
    tok_lp = log_probs[targets]
    m = mask.astype(jnp.float32)
    return -jnp.sum(tok_lp * m), jnp.sum(m)


def make_unigram_eval_step(cfg, data, split_artists, vocab_size: int,
                           mesh=None):
    """Jitted (glp, key) -> (ce_sum, count) over one episodic batch.

    With `mesh`, the same sharding contract as training.make_eval_step:
    each chip samples batch_size/n_chips episodes from its own PRNG fold
    and the (ce_sum, count) pair is psum'd, so multi-process floor evals
    split the work instead of replicating it per host."""
    from fewshot.data import episodes as eps

    if mesh is not None and mesh.devices.size == 1:
        mesh = None         # see training.make_train_step: 1-device tax

    def local(glp, key, batch):
        ep = eps.sample_episode(key, data, split_artists, batch,
                                k=cfg.support_size, q=cfg.query_size)
        return episodic_nll_stats(ep, glp, vocab_size)

    if mesh is None:
        @jax.jit
        def step(glp, key):
            return local(glp, key, cfg.batch_size)
        return step

    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from fewshot.parallel.mesh import AXIS
    n_shards = mesh.devices.size
    if cfg.batch_size % n_shards:
        raise ValueError(
            f"batch_size {cfg.batch_size} not divisible by {n_shards} chips")
    local_batch = cfg.batch_size // n_shards

    def sharded_local(glp, key):
        idx = jax.lax.axis_index(AXIS)
        t, c = local(glp, jax.random.fold_in(key, idx), local_batch)
        return jax.lax.psum(t, AXIS), jax.lax.psum(c, AXIS)

    sharded = shard_map(sharded_local, mesh=mesh, in_specs=(P(), P()),
                        out_specs=(P(), P()), check_vma=False)
    return jax.jit(sharded)


def evaluate_unigram(cfg, corpus, data, split_artists, key,
                     num_episodes: int | None = None, mesh=None) -> float:
    """Average query NLL/token of the episodic unigram baseline."""
    from fewshot.data import episodes as eps

    pool = jnp.asarray(eps.split_song_pool(corpus, "train"))
    glp = fit_global(data.songs, data.song_len, pool, len(corpus.vocab))
    n = num_episodes if num_episodes is not None else cfg.eval_episodes
    n_batches = max(1, n // cfg.batch_size)
    step = make_unigram_eval_step(cfg, data, split_artists,
                                  len(corpus.vocab), mesh=mesh)
    # Same deferred-readback pattern as training.evaluate: dispatch every
    # batch, accumulate on device, ONE host sync at the end (a float() per
    # batch costs ~10ms of device->host round trip through the tunnel).
    stats = [step(glp, jax.random.fold_in(key, i)) for i in range(n_batches)]
    total = sum(t for t, _ in stats)
    count = sum(c for _, c in stats)
    total, count = jax.device_get((total, count))
    return float(total) / max(float(count), 1.0)
