#!/usr/bin/env python
"""Sampling throughput: tokens/sec of on-device few-shot generation.

The reference's sampler did one sess.run + host softmax + numpy choice per
token (SURVEY.md §4.3) — latency-bound at host RPC speed.  Ours is a single
lax.scan program per batch.  Prints one JSON line.

Env knobs: SB_BATCH (32), SB_TOKENS (256), SB_CELL (pallas|scan).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    from fewshot.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from bench import ensure_corpus
    from fewshot.config import Config
    from fewshot.data import episodes as eps
    from fewshot import sampling, training

    batch = int(os.environ.get("SB_BATCH", "32"))
    n_tokens = int(os.environ.get("SB_TOKENS", "256"))
    cell = os.environ.get("SB_CELL", "pallas")

    corpus = ensure_corpus()
    cfg = Config(vocab_size=5000, max_len=256, embed_dim=256, hidden_dim=512,
                 num_layers=2, batch_size=batch, support_size=5,
                 query_size=5, cell=cell, support_mode="mean_state",
                 compute_dtype="bfloat16" if cell == "pallas" else "float32",
                 sample_tokens=n_tokens, data_parallel=False)
    data = eps.put_corpus(corpus)
    split = jnp.asarray(corpus.splits["train"])
    state = training.init_train_state(cfg, len(corpus.vocab))
    ep = eps.sample_episode(jax.random.PRNGKey(0), data, split, batch,
                            k=cfg.support_size, q=cfg.query_size)

    def run(seed, early_exit):
        return sampling.generate(state.params, ep.support, ep.support_len,
                                 jax.random.PRNGKey(seed), cfg,
                                 early_exit=early_exit)

    def measure(early_exit, iters=10):
        toks = run(0, early_exit)
        jax.block_until_ready(toks)
        t0 = time.perf_counter()
        for i in range(iters):
            toks = run(i, early_exit)
        jax.block_until_ready(toks)
        return time.perf_counter() - t0, iters

    # full-length batch throughput: lax.scan path (untrained params never
    # emit EOS, so the early-exit while_loop would run all n steps and only
    # measure its own pipelining penalty — serving latency with real
    # early exits is measured by tests/test_serve latency + this field)
    dt, iters = measure(early_exit=False)
    tps = iters * batch * n_tokens / dt
    dt_ee, iters = measure(early_exit=True)
    print(json.dumps({
        "metric": "sample_tokens_per_sec",
        "value": round(tps, 1),
        "unit": f"tokens/sec (1 chip, B={batch}, n={n_tokens}, "
                f"lstm512x2/{cell}, support-primed)",
        "per_stream_ms_per_token": round(1e3 * dt / (iters * n_tokens), 3),
        "early_exit_worst_case_tps": round(iters * batch * n_tokens / dt_ee,
                                           1),
    }))


if __name__ == "__main__":
    main()
