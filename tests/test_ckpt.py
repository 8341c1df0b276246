"""Checkpoint round-trip + vocab-hash guard (SURVEY.md §5.2, §6)."""

import dataclasses

import jax
import numpy as np
import pytest

from fewshot import training
from fewshot.config import Config
from fewshot.utils.ckpt import recover_or_init, save_checkpoint

CFG = Config(vocab_size=32, max_len=16, embed_dim=8, hidden_dim=12,
             num_layers=1, batch_size=4, support_size=2, query_size=1,
             data_parallel=False)


def test_roundtrip(tmp_path):
    state = training.init_train_state(CFG, 32)
    state = state._replace(step=state.step + 7)
    save_checkpoint(tmp_path / "ck", state, vocab_hash="abc")

    init = training.init_train_state(CFG, 32, seed=99)
    restored, ok = recover_or_init(tmp_path / "ck", init, vocab_hash="abc")
    assert ok
    assert int(restored.step) == 7
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 restored.params, state.params)


def test_missing_dir_inits(tmp_path):
    init = training.init_train_state(CFG, 32)
    state, ok = recover_or_init(tmp_path / "nope", init)
    assert not ok and state is init
    state, ok = recover_or_init(None, init)
    assert not ok


def test_vocab_hash_mismatch(tmp_path):
    state = training.init_train_state(CFG, 32)
    save_checkpoint(tmp_path / "ck", state, vocab_hash="aaa")
    init = training.init_train_state(CFG, 32)
    with pytest.raises(ValueError, match="different vocab"):
        recover_or_init(tmp_path / "ck", init, vocab_hash="bbb")


def test_resume_after_steps(tmp_path, tiny_corpus):
    import jax.numpy as jnp
    from fewshot.data import episodes as eps
    cfg = dataclasses.replace(CFG, vocab_size=64, max_len=24)
    data = eps.put_corpus(tiny_corpus)
    split = jnp.asarray(tiny_corpus.splits["train"])
    step = training.make_train_step(cfg, data, split)
    state = training.init_train_state(cfg, 64)
    for _ in range(3):
        state, _ = step(state)
    save_checkpoint(tmp_path / "ck", state)
    restored, ok = recover_or_init(
        tmp_path / "ck", training.init_train_state(cfg, 64))
    assert ok and int(restored.step) == 3
    # training continues from the restored state identically
    s1, m1 = step(state)
    s2, m2 = step(restored)
    assert float(m1["loss"]) == float(m2["loss"])
