#!/usr/bin/env python
"""Host-pipeline vs device-pipeline at vocab scale (r2 verdict weak-#3).

The r2 scale test ran the host pipeline for 101 steps and recorded only
throughput — "doesn't crash", not "works at scale".  This trains BOTH
pipelines for the same step budget on the V=5000 scale corpus (fresh init
each, same model config) and records, for each: episodes/sec, final train
loss, and val NLL — the host pipeline draws from the same episode
DISTRIBUTION but not the same step-for-step sequence (host PRNG,
ROADMAP.md limitation #2), so the comparison is NLL-level, not
trajectory-level.  Patches results into benchmarks/scale_test.json.

Run on the real chip:  python scripts/host_pipeline_scale.py
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
    p.add_argument("--corpus", default=str(REPO / "data" / "scale_lyrics" /
                                           "plain"))
    p.add_argument("--scale_test_json",
                   default=str(REPO / "benchmarks" / "scale_test.json"))
    p.add_argument("--steps", type=int, default=8000,
                   help="max steps per leg (early stopping usually ends "
                        "sooner)")
    p.add_argument("--eval_every", type=int, default=500)
    p.add_argument("--patience", type=int, default=5)
    p.add_argument("--eval_episodes", type=int, default=512)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from fewshot import training
    from fewshot.config import Config
    from fewshot.data import episodes as eps
    from fewshot.data.corpus import PackedCorpus
    from fewshot.data.host_pipeline import HostEpisodePipeline
    from fewshot.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    corpus = PackedCorpus.load(args.corpus)
    base = dict(vocab_size=len(corpus.vocab), max_len=corpus.max_len,
                embed_dim=256, hidden_dim=512, num_layers=2, batch_size=32,
                support_size=5, query_size=5, lr=1e-3,
                support_mode="mean_state", cell="pallas",
                compute_dtype="bfloat16", eval_episodes=args.eval_episodes,
                data_parallel=False)
    data = eps.put_corpus(corpus)
    val_split = jnp.asarray(corpus.splits["val"])
    out = {"steps": args.steps, "corpus": args.corpus}

    def leg(tag: str) -> dict:
        """Train one pipeline leg with early stopping on val NLL; report
        best val (converged comparison — point-in-time NLL mid-descent is
        dominated by seed noise)."""
        if tag == "host":
            cfg = Config(**{**base, "pipeline": "host"})
            pipe = HostEpisodePipeline(corpus, "train", cfg.batch_size,
                                       cfg.support_size, cfg.query_size,
                                       seed=0)
            fed = training.make_fed_train_step(cfg)
            advance = lambda s: fed(s, next(pipe))      # noqa: E731
        else:
            cfg = Config(**base)
            tr = jnp.asarray(corpus.splits["train"])
            step = training.make_train_step(cfg, data, tr)
            pipe = None
            advance = step
        eval_step = training.make_eval_step(cfg, data, val_split)
        state = training.init_train_state(cfg, len(corpus.vocab))
        state, m = advance(state)
        jax.block_until_ready(m["loss"])
        best, stale, done = float("inf"), 0, 1
        best_step = 0
        t0 = time.perf_counter()
        train_sec = 0.0
        curve = []
        while done < args.steps and stale < args.patience:
            t1 = time.perf_counter()
            target = min(done + args.eval_every, args.steps)
            while done < target:
                state, m = advance(state)
                done += 1
            jax.block_until_ready(m["loss"])
            train_sec += time.perf_counter() - t1
            val = training.evaluate(cfg, state.params, data, val_split,
                                    jax.random.PRNGKey(7),
                                    num_episodes=args.eval_episodes,
                                    eval_step=eval_step)
            curve.append({"step": done, "val_nll": round(val, 4)})
            if val < best - 1e-4:
                best, best_step, stale = val, done, 0
            else:
                stale += 1
        if pipe is not None:
            pipe.close()
        return {
            "episodes_per_sec": round(done * cfg.batch_size / train_sec, 1),
            "steps_trained": done,
            "best_val_nll": round(best, 4),
            "best_step": best_step,
            "final_train_loss": round(float(m["loss"]), 4),
            "curve": curve,
        }

    out["device"] = leg("device")
    print(json.dumps({"device": out["device"]}), flush=True)
    out["host"] = leg("host")
    out["val_nll_gap_host_minus_device"] = round(
        out["host"]["best_val_nll"] - out["device"]["best_val_nll"], 4)
    print(json.dumps({"host": out["host"]}), flush=True)

    st_path = Path(args.scale_test_json)
    if st_path.exists():
        st = json.loads(st_path.read_text())
        st["train_host_pipeline"] = {
            **out["host"], "steps": args.steps,
            "device_pipeline_same_budget": out["device"],
            "note": "same episode distribution, different PRNG stream "
                    "(ROADMAP limitation #2); NLL-level comparison",
        }
        st_path.write_text(json.dumps(st, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
