"""Host-streaming pipeline: episode validity + fed train step on the mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fewshot import training
from fewshot.config import Config
from fewshot.data.host_pipeline import HostEpisodePipeline

CFG = Config(vocab_size=64, max_len=24, embed_dim=16, hidden_dim=24,
             num_layers=1, batch_size=8, support_size=2, query_size=2,
             lr=5e-3, pipeline="host", data_parallel=False)


def test_host_episodes_valid(tiny_corpus):
    pipe = HostEpisodePipeline(tiny_corpus, "train", batch_size=8, k=2, q=2,
                               seed=0)
    try:
        split_set = set(int(a) for a in tiny_corpus.splits["train"])
        for _ in range(3):
            ep = next(pipe)
            assert ep.support.shape == (8, 2, tiny_corpus.max_len)
            for b in range(8):
                artist = int(ep.artist[b])
                assert artist in split_set
                rows = np.concatenate([np.asarray(ep.support[b]),
                                       np.asarray(ep.query[b])])
                # without replacement (6 songs per tiny-corpus artist)
                assert len(np.unique(rows, axis=0)) == 4
                for row in rows:
                    m = np.where((tiny_corpus.songs == row).all(1))[0]
                    assert any(int(tiny_corpus.song_artist[i]) == artist
                               for i in m)
    finally:
        pipe.close()


def test_fed_train_step_single_device(tiny_corpus):
    pipe = HostEpisodePipeline(tiny_corpus, "train", batch_size=8, k=2, q=2,
                               seed=1)
    try:
        step = training.make_fed_train_step(CFG)
        state = training.init_train_state(CFG, 64)
        losses = []
        for _ in range(20):
            state, m = step(state, next(pipe))
            losses.append(float(m["loss"]))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])
    finally:
        pipe.close()


def test_fed_train_step_sharded(tiny_corpus):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fewshot.parallel.mesh import AXIS, make_mesh
    cfg = dataclasses.replace(CFG, data_parallel=True)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    sharding = NamedSharding(mesh, P(AXIS))
    pipe = HostEpisodePipeline(tiny_corpus, "train", batch_size=8, k=2, q=2,
                               seed=2, sharding=sharding)
    try:
        step = training.make_fed_train_step(cfg, mesh=mesh)
        state = training.init_train_state(cfg, 64)
        for _ in range(5):
            state, m = step(state, next(pipe))
        assert np.isfinite(float(m["loss"]))
        assert float(m["tokens"]) > 0
    finally:
        pipe.close()


def test_evaluate_fed(tiny_corpus):
    pipe = HostEpisodePipeline(tiny_corpus, "val", batch_size=8, k=2, q=2,
                               seed=3)
    try:
        state = training.init_train_state(CFG, 64)
        nll = training.evaluate_fed(CFG, state.params, pipe,
                                    num_episodes=16)
        assert 0 < nll < np.log(64) + 1   # untrained ~ uniform
    finally:
        pipe.close()
