"""Training loop: determinism, sharding consistency, and the 200-step
regression threshold (SURVEY.md §5.3-5.5)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fewshot import training
from fewshot.config import Config
from fewshot.data import episodes as eps

BASE = Config(vocab_size=64, max_len=24, embed_dim=16, hidden_dim=24,
              num_layers=1, batch_size=8, support_size=2, query_size=2,
              lr=5e-3, data_parallel=False)


def _cfg(**kw) -> Config:
    return dataclasses.replace(BASE, **kw)


@pytest.fixture(scope="module")
def device_data(tiny_corpus):
    return eps.put_corpus(tiny_corpus)


def test_train_step_deterministic(tiny_corpus, device_data):
    split = jnp.asarray(tiny_corpus.splits["train"])
    cfg = _cfg()
    step = training.make_train_step(cfg, device_data, split)

    s1 = training.init_train_state(cfg, 64)
    s2 = training.init_train_state(cfg, 64)
    for _ in range(3):
        s1, m1 = step(s1)
        s2, m2 = step(s2)
    assert float(m1["loss"]) == float(m2["loss"])
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 s1.params, s2.params)


def test_sharded_matches_metrics_shape(tiny_corpus, device_data):
    """shard_map step on the 8-device CPU mesh runs and decreases loss."""
    split = jnp.asarray(tiny_corpus.splits["train"])
    cfg = _cfg(data_parallel=True, batch_size=8)
    assert jax.device_count() == 8   # conftest forced 8 virtual devices
    step = training.make_train_step(cfg, device_data, split)
    state = training.init_train_state(cfg, 64)
    state, m0 = step(state)
    losses = [float(m0["loss"])]
    for _ in range(30):
        state, m = step(state)
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_lm_task(tiny_corpus, device_data):
    pool = jnp.asarray(eps.split_song_pool(tiny_corpus, "train"))
    cfg = _cfg(task="lm")
    step = training.make_train_step(cfg, device_data, pool)
    state = training.init_train_state(cfg, 64)
    state, m = step(state)
    assert np.isfinite(float(m["loss"]))


def test_regression_200_steps(tiny_corpus, device_data):
    """Catches silent masking/lr bugs: must beat uniform by a clear margin."""
    split = jnp.asarray(tiny_corpus.splits["train"])
    cfg = _cfg(lr=1e-2)
    step = training.make_train_step(cfg, device_data, split)
    state = training.init_train_state(cfg, 64)
    for _ in range(200):
        state, m = step(state)
    uniform = np.log(64)
    assert float(m["loss"]) < uniform - 0.7


def test_eval_exact_aggregation(tiny_corpus, device_data):
    split = jnp.asarray(tiny_corpus.splits["val"])
    cfg = _cfg(eval_episodes=16)
    state = training.init_train_state(cfg, 64)
    nll = training.evaluate(cfg, state.params, device_data, split,
                            jax.random.PRNGKey(0))
    # untrained model ~ uniform over vocab
    assert abs(nll - np.log(64)) < 0.5


def test_transformer_episodic_train(tiny_corpus, device_data):
    split = jnp.asarray(tiny_corpus.splits["train"])
    cfg = _cfg(model="transformer", embed_dim=32, num_heads=4, lr=3e-3)
    step = training.make_train_step(cfg, device_data, split)
    state = training.init_train_state(cfg, 64)
    first = None
    for _ in range(20):
        state, m = step(state)
        first = first if first is not None else float(m["loss"])
    assert float(m["loss"]) < first


def test_multi_step_matches_single_steps(tiny_corpus, device_data):
    """k chunked steps (make_multi_step) follow the SAME trajectory as k
    individual dispatches: identical params and final loss."""
    cfg = _cfg(steps_per_call=3, log_interval=3, eval_interval=0,
               checkpoint_interval=0, max_steps=6)
    split = jnp.asarray(tiny_corpus.splits["train"])

    s1 = training.init_train_state(cfg, len(tiny_corpus.vocab))
    step = training.make_train_step(cfg, device_data, split)
    for _ in range(3):
        s1, m1 = step(s1)

    s2 = training.init_train_state(cfg, len(tiny_corpus.vocab))
    multi = training.make_multi_step(step, 3)
    s2, m2 = multi(s2)

    assert int(s1.step) == int(s2.step) == 3
    assert jnp.allclose(m1["loss"], m2["loss"], atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        assert jnp.allclose(a, b, atol=1e-6)
