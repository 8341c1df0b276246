#!/usr/bin/env python
"""Head-width study for the episodic transformer (config #4).

TPU-first motivation: the MXU contracts over 128 lanes.  With embed_dim
256 split over 8 heads, every attention dot_general contracts over
hd=32 — 25% lane utilization.  Fewer, wider heads (nh=2 -> hd=128) fill
the array.  Measured on the fused prefix-attention kernels this doubles
step speed (28.5 vs 57.6 ms at the data/midi shape).  Param count is
IDENTICAL across nh (fused QKV is [E, 3E]); only the head split
changes, so this is a pure speed/quality trade measured here.

Trains config-4 (matrix_midi) at each nh, reports test NLL at the
best-val snapshot + train-only eps/s.  Appends JSON to
benchmarks/heads_study.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_one(cfg, corpus, steps):
    import jax
    import jax.numpy as jnp
    from fewshot import training
    from fewshot.data import episodes as eps

    data = eps.put_corpus(corpus)
    splits = {s: jnp.asarray(corpus.splits[s]) for s in
              ("train", "val", "test")}
    state = training.init_train_state(cfg, len(corpus.vocab))
    step = training.make_train_step(cfg, data, splits["train"])
    val_step = training.make_eval_step(cfg, data, splits["val"])

    warm, _m = step(training.init_train_state(cfg, len(corpus.vocab),
                                              seed=123))
    training.evaluate(cfg, warm.params, data, splits["val"],
                      jax.random.PRNGKey(7), eval_step=val_step)
    jax.block_until_ready(_m["loss"])
    del warm, _m

    best_val, best_params, best_step = float("inf"), state.params, 0
    eval_every = max(50, cfg.max_steps // 15)
    train_sec, t0 = 0.0, time.perf_counter()
    for i in range(cfg.max_steps):
        state, m = step(state)
        if (i + 1) % eval_every == 0 or i + 1 == cfg.max_steps:
            jax.block_until_ready(m["loss"])
            train_sec += time.perf_counter() - t0
            v = training.evaluate(cfg, state.params, data, splits["val"],
                                  jax.random.PRNGKey(7), eval_step=val_step)
            if v < best_val:
                best_val, best_step = v, i + 1
                best_params = jax.tree.map(lambda x: x, state.params)
            t0 = time.perf_counter()
    jax.block_until_ready(m["loss"])
    train_sec += time.perf_counter() - t0
    test_nll = training.evaluate(cfg, best_params, data, splits["test"],
                                 jax.random.PRNGKey(99))
    return dict(num_heads=cfg.num_heads,
                head_dim=cfg.embed_dim // cfg.num_heads,
                final_train=float(m["loss"]), best_val=float(best_val),
                test_nll=float(test_nll), best_step=best_step,
                eps_per_sec=cfg.max_steps * cfg.batch_size / train_sec)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--heads", type=str, default="8,4,2")
    args = p.parse_args(argv)

    from fewshot.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from fewshot.config import Config
    from scripts.run_matrix import ensure

    corpus = ensure("midi", REPO / "data" / "matrix_midi")
    base = Config(vocab_size=204, dataset="midi", model="transformer",
                  max_len=corpus.max_len, embed_dim=256, hidden_dim=512,
                  num_layers=2, num_heads=8, batch_size=16, support_size=5,
                  query_size=5, lr=1e-3, cell="scan",
                  compute_dtype="bfloat16", support_mode="mean_state",
                  max_steps=args.steps, dropout=0.1, data_parallel=True,
                  eval_episodes=128)

    out = []
    for nh in (int(x) for x in args.heads.split(",")):
        r = run_one(dataclasses.replace(base, num_heads=nh), corpus,
                    args.steps)
        out.append(r)
        print(f"nh={r['num_heads']} (hd={r['head_dim']}): "
              f"test {r['test_nll']:.3f} @ step {r['best_step']}, "
              f"val {r['best_val']:.3f}, train {r['final_train']:.3f}, "
              f"{r['eps_per_sec']:.0f} eps/s", flush=True)
    path = REPO / "benchmarks" / "heads_study.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
