#!/usr/bin/env python
"""Is the sampling wall-clock protocol actually synchronized?

The r5 device-trace companion metric (sample_bench.py) reads ~4.25M tok/s
on-device while the wall protocol's session medians read 34-43M tok/s.
The wall number is PHYSICALLY impossible: one decode step is ~400 MFLOP
(two 512-wide LSTM gate matmuls + a [32,512]@[512,5000] head), so a
256-token batch of 32 streams is ~102 GFLOP, and 43M tok/s would need
~500 TF/s on a 197 TF/s-peak chip.  Hypothesis: through the axon relay,
`jax.block_until_ready` on an output of an independent (non-donated,
non-chained) dispatch returns before device execution completes, so the
timed loop measures enqueue throughput.

This probe times the SAME 10-batch loop three ways:
  a) block_until_ready on the last output (the old protocol);
  b) full host readback of every output (np.asarray; bytes on host
     cannot lie);
  c) block_until_ready, then a separate timer for the readback of all
     outputs (splits enqueue time from drain time).

Writes benchmarks/sample_sync_probe.json and prints one JSON line.
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

    batch, n_tokens, iters = 32, 256, 10
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

    def run(seed):
        return sampling.generate(state.params, ep.support, ep.support_len,
                                 jax.random.PRNGKey(seed), cfg,
                                 early_exit=False)

    for _ in range(2):
        toks = run(0)
    jax.block_until_ready(toks)
    np.asarray(toks)                       # drain everything before timing

    out = {"batch": batch, "n_tokens": n_tokens, "iters": iters,
           "gflop_per_batch_floor": 102.0}

    def tok_s(sec):
        return round(iters * batch * n_tokens / sec, 0)

    for rep in range(3):
        # (a) old protocol: block_until_ready on the last output only
        t0 = time.perf_counter()
        for i in range(iters):
            toks = run(1000 * rep + i)
        jax.block_until_ready(toks)
        a = time.perf_counter() - t0

        # settle: force everything from (a) truly finished
        np.asarray(toks)

        # (b) full host readback of every output inside the clock
        t0 = time.perf_counter()
        acc = 0
        for i in range(iters):
            acc += int(np.asarray(run(2000 * rep + i)).sum())
        b = time.perf_counter() - t0

        # (c) enqueue-then-drain split
        t0 = time.perf_counter()
        outs = [run(3000 * rep + i) for i in range(iters)]
        jax.block_until_ready(outs[-1])
        c_enq = time.perf_counter() - t0
        t0 = time.perf_counter()
        for o in outs:
            np.asarray(o)
        c_drain = time.perf_counter() - t0

        out[f"rep{rep}"] = {
            "a_block_last_sec": round(a, 4), "a_tok_s": tok_s(a),
            "b_readback_each_sec": round(b, 4), "b_tok_s": tok_s(b),
            "c_enqueue_sec": round(c_enq, 4),
            "c_drain_sec": round(c_drain, 4),
            "c_total_tok_s": tok_s(c_enq + c_drain),
        }
        print(json.dumps({f"rep{rep}": out[f"rep{rep}"]}), flush=True)

    (REPO / "benchmarks" / "sample_sync_probe.json").write_text(
        json.dumps(out, indent=1))
    print(json.dumps({"metric": "sample_sync_probe", "done": True}))


if __name__ == "__main__":
    main()
