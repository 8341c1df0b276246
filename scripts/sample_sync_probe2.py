#!/usr/bin/env python
"""Companion to sample_sync_probe.py: per-dispatch cost vs block semantics.

Times (i) a single dispatch+block_until_ready per iteration (clean queue
each time), (ii) the dispatch alone, (iii) the verbatim old sample_bench
measure() pattern for 5 repeats to see whether its session medians
(14-43M tok/s) reproduce in a fresh process.  Device-trace floor for one
batch is ~1.93 ms (sample_bench.json device_us_per_batch).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    import jax
    from fewshot.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from bench import ensure_corpus
    from fewshot.config import Config
    from fewshot.data import episodes as eps
    from fewshot import sampling, training

    batch, n_tokens = 32, 256
    corpus = ensure_corpus()
    cfg = Config(vocab_size=5000, max_len=256, embed_dim=256,
                 hidden_dim=512, num_layers=2, batch_size=batch,
                 support_size=5, query_size=5, cell="pallas",
                 support_mode="mean_state", compute_dtype="bfloat16",
                 sample_tokens=n_tokens, data_parallel=False)
    data = eps.put_corpus(corpus)
    split = jnp.asarray(corpus.splits["train"])
    state = training.init_train_state(cfg, len(corpus.vocab))
    ep = eps.sample_episode(jax.random.PRNGKey(0), data, split, batch,
                            k=cfg.support_size, q=cfg.query_size)

    def run(seed, early_exit=False):
        return sampling.generate(state.params, ep.support, ep.support_len,
                                 jax.random.PRNGKey(seed), cfg,
                                 early_exit=early_exit)

    for _ in range(2):
        toks = run(0)
    np.asarray(toks)

    out = {}
    # (i) single dispatch + block, queue drained between iterations
    singles, dispatch_only, blocks = [], [], []
    for i in range(15):
        t0 = time.perf_counter()
        t = run(100 + i)
        t1 = time.perf_counter()
        jax.block_until_ready(t)
        t2 = time.perf_counter()
        singles.append(t2 - t0)
        dispatch_only.append(t1 - t0)
        blocks.append(t2 - t1)
        np.asarray(t)                       # drain before next iteration
    out["single_ms"] = [round(s * 1e3, 2) for s in singles]
    out["dispatch_ms"] = [round(s * 1e3, 2) for s in dispatch_only]
    out["block_ms"] = [round(s * 1e3, 2) for s in blocks]

    # (iii) the old measure() pattern verbatim (10 iters x 5 repeats,
    # block only on the final output of each repeat, no drain between)
    reps = []
    for r in range(5):
        t0 = time.perf_counter()
        for i in range(10):
            toks = run(1 + r * 10 + i)
        jax.block_until_ready(toks)
        reps.append(10 * batch * n_tokens / (time.perf_counter() - t0))
    out["old_protocol_tok_s"] = [round(x, 0) for x in reps]
    np.asarray(toks)

    (REPO / "benchmarks" / "sample_sync_probe2.json").write_text(
        json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
