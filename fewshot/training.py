"""Training core: optimizer, TrainState, fused sample+grad+update steps.

Reference equivalent (SURVEY.md §4.1): the hot loop's
`sampler.get_episode(); model.train(episode)` pair.  Here BOTH halves live in
one XLA program: the on-device episode sampler (data/episodes.py) is traced
into the train step, so a training step is a single device dispatch with no
per-step host work at all.

Multi-chip (SURVEY.md §3 "parallelism"): episode-level data parallelism via
`shard_map` over a 1-D `data` mesh — each chip samples its own B/n_chips
episodes from its own fold of the PRNG key, computes local (grad, loss-sum,
token-count), and `psum`s all three over ICI.  Loss normalization divides the
psum'd CE sum by the psum'd token count, so ragged masking stays exact under
sharding.  See fewshot/parallel/mesh.py for mesh construction.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from fewshot.data.episodes import (CorpusOnDevice, sample_episode,
                                   sample_lm_batch)
from fewshot.models import lm as lm_mod
from fewshot.parallel.mesh import make_mesh, shard_step


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array      # int32 scalar
    key: jax.Array       # PRNG key consumed by the in-step episode sampler


def make_optimizer(cfg) -> optax.GradientTransformation:
    if cfg.warmup_steps > 0:
        lr = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
    else:
        lr = cfg.lr
    if cfg.optimizer == "adam":
        opt = (optax.adamw(lr, weight_decay=cfg.weight_decay)
               if cfg.weight_decay > 0 else optax.adam(lr))
    else:
        opt = optax.sgd(lr)
    if cfg.grad_clip > 0:
        return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
    return opt


def init_train_state(cfg, vocab_size: int, seed: int | None = None
                     ) -> TrainState:
    key = jax.random.PRNGKey(cfg.seed if seed is None else seed)
    k_init, k_run = jax.random.split(key)
    params = lm_mod.init_lm(k_init, cfg, vocab_size)
    opt_state = make_optimizer(cfg).init(params)
    return TrainState(params, opt_state, jnp.int32(0), k_run)


def _loss_stats(params, cfg, data: CorpusOnDevice, split_artists, key,
                batch_size: int, train: bool = False):
    """Sample a batch/episodes on device and return (ce_sum, token_count).

    train=False also flags eval_mode downstream: eval steps are never
    differentiated, which lets the LSTM use the forward-only fused stack
    kernel (models/lstm.py)."""
    k_sample, k_drop = jax.random.split(key)
    dropout_key = k_drop if (train and cfg.dropout > 0) else None
    if cfg.task == "episodic":
        ep = sample_episode(k_sample, data, split_artists, batch_size,
                            k=cfg.support_size, q=cfg.query_size)
        return lm_mod.episodic_nll_stats(params, ep, cfg, dropout_key,
                                         eval_mode=not train)
    tokens, lengths = sample_lm_batch(k_sample, data, split_artists,
                                      batch_size)
    return lm_mod.lm_nll_stats(params, tokens, lengths, cfg, dropout_key,
                               eval_mode=not train)


def _make_apply(cfg, opt):
    """Shared grad-normalize + optimizer update half of a train step."""
    def apply(state: TrainState, grads, total, count):
        # grads are CE sums; normalize by the global token count.
        inv = 1.0 / jnp.maximum(count, 1.0)
        grads = jax.tree.map(lambda g: g * inv, grads)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_key = jax.random.fold_in(state.key, state.step)
        metrics = {"loss": total * inv,
                   "tokens": count,
                   "grad_norm": optax.global_norm(grads)}
        return TrainState(params, opt_state, state.step + 1, new_key), metrics
    return apply


def make_train_step(cfg, data: CorpusOnDevice, split_artists, mesh=None):
    """Build the fused train step.  `split_artists` is the train split's
    artist-id array (or the song pool for task="lm").  `mesh` overrides the
    default all-devices data mesh (used by multichip dry runs)."""
    opt = make_optimizer(cfg)
    if mesh is None:
        mesh = make_mesh() if cfg.data_parallel else None
    if mesh is not None and mesh.devices.size == 1:
        # shard_map over one device is semantically the identity (psum of
        # one shard) but measurably NOT free: the wrapped transformer step
        # lowers ~2x slower (55ms vs 30ms at config #4).  Skip the wrapper
        # when there is nothing to shard.
        mesh = None
    n_shards = mesh.devices.size if mesh is not None else 1
    if cfg.batch_size % n_shards:
        raise ValueError(
            f"batch_size {cfg.batch_size} not divisible by {n_shards} chips")
    local_batch = cfg.batch_size // n_shards

    def local_grads(params, key):
        def loss_fn(p):
            total, count = _loss_stats(p, cfg, data, split_artists, key,
                                       local_batch, train=True)
            return total, count
        (total, count), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return grads, total, count

    apply = _make_apply(cfg, opt)

    if mesh is None:
        @jax.jit
        def train_step(state: TrainState):
            grads, total, count = local_grads(state.params, state.key)
            return apply(state, grads, total, count)
        return train_step

    sharded = shard_step(mesh, local_grads)

    @jax.jit
    def train_step(state: TrainState):
        grads, total, count = sharded(state.params, state.key)
        return apply(state, grads, total, count)

    return train_step


def make_multi_step(train_step, k: int):
    """Chunk k train steps into ONE compiled program (lax.scan).

    Removes the per-step host round trip entirely: the host dispatches
    once per k steps and XLA overlaps the steps' tails (measured +6% on
    the flagship bench at k=10; the per-call dispatch floor through the
    remote-device tunnel is what it buys back).  Returns (state, metrics
    of the LAST step in the chunk) — identical training trajectory to
    calling `train_step` k times."""
    if k <= 1:
        return train_step

    @jax.jit
    def multi(state: TrainState):
        def body(s, _):
            return train_step(s)
        state, ms = jax.lax.scan(body, state, None, length=k)
        return state, jax.tree.map(lambda x: x[-1], ms)
    return multi


def make_fed_train_step(cfg, mesh=None):
    """Train step taking the episode as an ARGUMENT (host pipeline mode).

    The episode arrives already device_put (data/host_pipeline.py) with its
    batch dim laid out over the mesh; shard_map consumes the local shard per
    chip and psums (grads, ce_sum, token_count) exactly like the fused path.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from fewshot.parallel.mesh import AXIS

    opt = make_optimizer(cfg)
    if mesh is None:
        mesh = make_mesh() if cfg.data_parallel else None
    if mesh is not None and mesh.devices.size == 1:
        mesh = None         # see make_train_step: 1-device shard_map tax
    apply = _make_apply(cfg, opt)

    def local_grads(params, key, ep):
        def loss_fn(p):
            dropout_key = (key if cfg.dropout > 0 else None)
            return lm_mod.episodic_nll_stats(p, ep, cfg, dropout_key)
        (total, count), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return grads, total, count

    if mesh is None:
        @jax.jit
        def train_step(state: TrainState, ep):
            grads, total, count = local_grads(state.params, state.key, ep)
            return apply(state, grads, total, count)
        return train_step

    def sharded_fn(params, key, ep):
        idx = jax.lax.axis_index(AXIS)
        grads, total, count = local_grads(params,
                                          jax.random.fold_in(key, idx), ep)
        return (jax.lax.psum(grads, AXIS), jax.lax.psum(total, AXIS),
                jax.lax.psum(count, AXIS))

    ep_spec = jax.tree.map(lambda _: P(AXIS),
                           _episode_structure(), is_leaf=lambda x: x is None)
    sharded = shard_map(sharded_fn, mesh=mesh,
                        in_specs=(P(), P(), ep_spec),
                        out_specs=(P(), P(), P()), check_vma=False)

    @jax.jit
    def train_step(state: TrainState, ep):
        grads, total, count = sharded(state.params, state.key, ep)
        return apply(state, grads, total, count)

    return train_step


def _episode_structure():
    from fewshot.data.episodes import Episode
    return Episode(None, None, None, None, None)


def make_fed_eval_step(cfg):
    """Jitted eval on a fed episode: (params, episode) -> (ce_sum, count)."""
    @jax.jit
    def eval_step(params, ep):
        return lm_mod.episodic_nll_stats(params, ep, cfg, eval_mode=True)
    return eval_step


def evaluate_fed(cfg, params, pipe, num_episodes: int | None = None,
                 eval_step=None) -> float:
    """Average NLL/token over episodes drawn from a host pipeline."""
    n = num_episodes if num_episodes is not None else cfg.eval_episodes
    step = eval_step if eval_step is not None else make_fed_eval_step(cfg)
    n_batches = max(1, n // pipe.batch)
    # Same deferred-readback pattern as evaluate(): dispatch all batches,
    # reduce on device, one host sync.
    stats = [step(params, next(pipe)) for _ in range(n_batches)]
    total = sum(t for t, _ in stats)
    count = sum(c for _, c in stats)
    total, count = jax.device_get((total, count))
    return float(total) / max(float(count), 1.0)


def make_eval_step(cfg, data: CorpusOnDevice, split_artists, mesh=None):
    """Jitted eval: (params, key) -> (ce_sum, token_count) on one batch.

    With `mesh`, each chip evaluates batch_size/n_chips episodes from its
    own PRNG fold and the (ce_sum, count) pair is psum'd — the exact-masked
    aggregation stays correct under sharding, and multi-host eval does 1/N
    of the work per host instead of replicating it."""
    if mesh is not None and mesh.devices.size == 1:
        mesh = None         # see make_train_step: 1-device shard_map tax
    if mesh is None:
        @jax.jit
        def eval_step(params, key):
            return _loss_stats(params, cfg, data, split_artists, key,
                               cfg.batch_size)
        return eval_step

    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from fewshot.parallel.mesh import AXIS
    n_shards = mesh.devices.size
    if cfg.batch_size % n_shards:
        raise ValueError(
            f"batch_size {cfg.batch_size} not divisible by {n_shards} chips")
    local_batch = cfg.batch_size // n_shards

    def local_eval(params, key):
        idx = jax.lax.axis_index(AXIS)
        t, c = _loss_stats(params, cfg, data, split_artists,
                           jax.random.fold_in(key, idx), local_batch)
        return jax.lax.psum(t, AXIS), jax.lax.psum(c, AXIS)

    sharded = shard_map(local_eval, mesh=mesh, in_specs=(P(), P()),
                        out_specs=(P(), P()), check_vma=False)
    return jax.jit(sharded)


def evaluate(cfg, params, data: CorpusOnDevice, split_artists, key,
             num_episodes: int | None = None, eval_step=None,
             mesh=None) -> float:
    """Average query NLL/token over N eval episodes (SURVEY.md §4.2).

    Pass a prebuilt `eval_step` (make_eval_step) when calling repeatedly —
    a fresh closure per call would retrace/recompile every time."""
    n = num_episodes if num_episodes is not None else cfg.eval_episodes
    step = eval_step if eval_step is not None else \
        make_eval_step(cfg, data, split_artists, mesh=mesh)
    n_batches = max(1, n // cfg.batch_size)
    # Dispatch every batch before reading anything back: a float() per
    # batch forces a device->host sync per iteration, which through the
    # remote-device tunnel costs ~10ms a pop and serializes the whole
    # eval.  All batches are independent; accumulate ON DEVICE and read
    # one scalar pair at the end.
    stats = [step(params, jax.random.fold_in(key, i))
             for i in range(n_batches)]
    total = sum(t for t, _ in stats)
    count = sum(c for _, c in stats)
    total, count = jax.device_get((total, count))
    return float(total) / max(float(count), 1.0)
