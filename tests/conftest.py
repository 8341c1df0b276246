"""Test harness config (SURVEY.md §5.4): force the CPU backend with 8 virtual
devices so shard_map/mesh logic is exercised without a TPU slice.  Pallas
kernel tests detect the backend and skip themselves off-TPU (they are run on
the real chip by scripts/tpu_checks.py and bench.py)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# The sandbox's sitecustomize registers a TPU platform plugin and may have
# imported jax before this conftest ran — the env var alone is then too
# late.  Force the CPU backend explicitly (fails loudly if a backend was
# already initialized, which is what we'd want to know).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from fewshot.data.corpus import PackedCorpus  # noqa: E402
from fewshot.data.lyrics import tokenize_corpus  # noqa: E402


@pytest.fixture(scope="session")
def tiny_corpus() -> PackedCorpus:
    """Deterministic 8-artist corpus, small enough for fast jit."""
    rng = np.random.RandomState(7)
    words = [f"w{i}" for i in range(30)]
    rows = []
    for a in range(8):
        prefs = rng.dirichlet(np.ones(len(words)))
        for s in range(6):
            n = rng.randint(8, 20)
            text = " ".join(rng.choice(words, size=n, p=prefs))
            rows.append((f"artist_{a}", f"song_{s}", text))
    vocab, items = tokenize_corpus(rows, vocab_size=64)
    return PackedCorpus.pack(items, vocab, max_len=24, seed=0)
