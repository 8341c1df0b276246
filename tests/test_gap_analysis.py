"""The gap-analysis decomposition must exactly reconstruct the model's
episodic NLL (scripts/gap_analysis.py make_decomposed_eval vs
lm.episodic_nll_stats), for BOTH model families, and its bins must
partition every masked position.  This is the correctness pin for the
gap_analysis*.json artifacts (RESULTS.md's per-bin tables)."""

import importlib.util
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fewshot.config import Config
from fewshot.data import episodes as eps
from fewshot.models import lm

REPO = Path(__file__).resolve().parent.parent
_spec = importlib.util.spec_from_file_location(
    "gap_analysis", REPO / "scripts" / "gap_analysis.py")
gap = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(gap)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("gap")
    from fewshot.data.corpus import build_lyrics_corpus
    from fewshot.data.synthetic import generate_lyrics_csv
    generate_lyrics_csv(root / "l.csv", num_artists=8, songs_per_artist=6,
                        seed=0)
    return build_lyrics_corpus(root / "l.csv", root / "corpus",
                               vocab_size=128, max_len=24)


@pytest.mark.parametrize("model", ["lstm", "transformer"])
def test_decomposed_bins_reconstruct_episodic_nll(corpus, model):
    cfg = Config(vocab_size=128, max_len=corpus.max_len, embed_dim=16,
                 hidden_dim=32, num_layers=1, model=model, batch_size=4,
                 support_size=3, query_size=2, support_mode="mean_state",
                 support_cache=True, cache_backoff="global",
                 data_parallel=False, dropout=0.0)
    params = lm.init_lm(jax.random.PRNGKey(0), cfg, len(corpus.vocab))
    # a non-trivial gate so both mixture branches matter
    params["cache_gate"]["w"] = jax.random.normal(
        jax.random.PRNGKey(1), params["cache_gate"]["w"].shape) * 0.5
    data = eps.put_corpus(corpus)
    split = jnp.asarray(corpus.splits["train"])
    slash_id = corpus.vocab.index.get("/", 5)

    dstep = gap.make_decomposed_eval(cfg, data, split, slash_id)
    key = jax.random.PRNGKey(42)
    out = jax.device_get(dstep(params, key))

    # the same episode the decomposed step sampled
    ep = eps.sample_episode(key, data, split, cfg.batch_size,
                            k=cfg.support_size, q=cfg.query_size)
    total, count = lm.episodic_nll_stats(params, ep, cfg, eval_mode=True)

    names = ("slash", "eos", "word_seen", "word_unseen")
    bin_nll = sum(float(out[n][0]) for n in names)
    bin_cnt = sum(float(out[n][1]) for n in names)
    assert bin_cnt == float(count)          # bins partition the mask
    np.testing.assert_allclose(bin_nll, float(total), rtol=1e-5)
    for n in names:
        g = float(out[n][2])
        c = float(out[n][1])
        assert c == 0 or 0.0 <= g / c <= 1.0
