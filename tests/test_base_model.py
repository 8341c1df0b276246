"""FewShotModel facade: the reference's five-method contract end-to-end."""

import jax
import numpy as np

from fewshot.config import Config
from fewshot.data import episodes as eps
from fewshot.models.base import FewShotModel

CFG = Config(vocab_size=64, max_len=24, embed_dim=16, hidden_dim=24,
             num_layers=1, batch_size=8, support_size=2, query_size=2,
             sample_tokens=10, lr=5e-3, data_parallel=False)


def test_contract(tiny_corpus, tmp_path):
    model = FewShotModel(CFG, tiny_corpus)

    # train
    first = model.train(1)
    for _ in range(10):
        last = model.train(1)
    assert model.step == 11
    assert np.isfinite(last)

    # eval: split average and a single episode
    nll = model.eval(split="val", num_episodes=8)
    assert 0 < nll < np.log(64) + 1
    ep = eps.sample_episode(jax.random.PRNGKey(0), model.data,
                            np.asarray(tiny_corpus.splits["val"]), 4,
                            k=2, q=2)
    ep_nll = model.eval(episode=ep)
    assert np.isfinite(ep_nll)

    # sample
    toks, artists = model.sample_artist(split="test", num=2, seed=1)
    assert toks.shape == (2, CFG.sample_tokens)
    assert toks.min() >= 0 and toks.max() < 64

    # save / recover_or_init
    model.save(tmp_path / "ck")
    model2 = FewShotModel(CFG, tiny_corpus, seed=123)
    assert model2.recover_or_init(tmp_path / "ck")
    assert model2.step == model.step
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 model2.state.params, model.state.params)
    # fresh dir -> init
    model3 = FewShotModel(CFG, tiny_corpus)
    assert not model3.recover_or_init(tmp_path / "nothing_here")
