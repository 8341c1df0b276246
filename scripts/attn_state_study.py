#!/usr/bin/env python
"""attn_state vs mean_state at a 5x step budget (VERDICT r1 #10).

Round 1 shipped three LSTM support-pooling modes; attn_state (learned
attention pooling over the K per-song states) trailed mean_state at the
1500-step matrix budget (val 4.57 vs 4.39).  Decision experiment: train
both at 5x the budget with best-val early stopping; keep attn_state only
if it wins anywhere.  Writes benchmarks/attn_state_study.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=7500)
    p.add_argument("--corpus", default=str(REPO / "data" / "matrix_lyrics"))
    p.add_argument("--out", default=str(REPO / "benchmarks" /
                                        "attn_state_study.json"))
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from fewshot import training
    from fewshot.config import Config
    from fewshot.data import episodes as eps
    from fewshot.data.corpus import PackedCorpus
    from fewshot.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    corpus = PackedCorpus.load(args.corpus)
    result = {"steps": args.steps, "corpus": args.corpus}
    for mode in ("mean_state", "attn_state"):
        cfg = Config(vocab_size=len(corpus.vocab), max_len=corpus.max_len,
                     embed_dim=256, hidden_dim=512, num_layers=2,
                     batch_size=32, support_size=5, query_size=5, lr=2e-3,
                     dropout=0.1, cell="pallas", compute_dtype="bfloat16",
                     support_mode=mode, eval_episodes=128,
                     data_parallel=False)
        data = eps.put_corpus(corpus)
        tr = jnp.asarray(corpus.splits["train"])
        va = jnp.asarray(corpus.splits["val"])
        te = jnp.asarray(corpus.splits["test"])
        step = training.make_train_step(cfg, data, tr)
        val_step = training.make_eval_step(cfg, data, va)
        state = training.init_train_state(cfg, len(corpus.vocab))
        best_val, best_params, best_step = float("inf"), state.params, 0
        eval_every = max(100, args.steps // 25)
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, m = step(state)
            if (i + 1) % eval_every == 0 or i + 1 == args.steps:
                v = training.evaluate(cfg, state.params, data, va,
                                      jax.random.PRNGKey(7),
                                      eval_step=val_step)
                if v < best_val:
                    best_val, best_step = v, i + 1
                    best_params = jax.tree.map(lambda x: x, state.params)
        jax.block_until_ready(m["loss"])
        test = training.evaluate(cfg, best_params, data, te,
                                 jax.random.PRNGKey(99))
        result[mode] = {"best_val": round(float(best_val), 4),
                        "best_step": best_step,
                        "test_nll": round(float(test), 4),
                        "wall_sec": round(time.perf_counter() - t0, 1)}
        print(json.dumps({mode: result[mode]}), flush=True)

    result["verdict"] = ("keep attn_state" if
                         result["attn_state"]["test_nll"]
                         < result["mean_state"]["test_nll"]
                         else "attn_state does not beat mean_state")
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
