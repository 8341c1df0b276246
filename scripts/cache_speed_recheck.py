#!/usr/bin/env python
"""Fresh-process throughput recheck of the cache-head legs at V=5000
(r3 verdict weak #1) -> benchmarks/cache_speed_recheck.json.

The r3 scale_quality.json eps/s column put the calibration legs at
2462-2894 eps/s vs 4049 for cache_global — a 29-39% toll — yet the
device trace (step_profile_v5000_cache.json) attributes only ~6% of step
time to the whole cache stack.  Those eps/s readings ran LAST in a long
session, which the repo's own hygiene rules flag as unreliable (tunnel
degradation).  This script settles it with the in-context-delta protocol
(CLAUDE.md): every mode compiled + warmed in ONE fresh process, one
untimed burn round per mode, then interleaved timing rounds and a true
median per mode — mode-to-mode ratios inside one process are the only
trustworthy eps/s comparison through the tunnel.

Run on the real chip:  python scripts/cache_speed_recheck.py
"""

from __future__ import annotations

import argparse
import json
import statistics
import time
from pathlib import Path
import sys

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus_dir",
                    default=str(REPO / "data" / "scale_lyrics" / "plain"))
    ap.add_argument("--out", default=str(REPO / "benchmarks" /
                                         "cache_speed_recheck.json"))
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--calls_per_round", type=int, default=4)
    ap.add_argument("--modes", type=str, default="",
                    help="comma list of modes to run (default all); the "
                         "r5 sweep covers the transformer + aux legs too "
                         "so RESULTS.md quotes ONE protocol")
    args = ap.parse_args(argv)

    import jax
    from fewshot.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from fewshot import training
    from fewshot.config import Config
    from fewshot.data import episodes as eps
    from fewshot.data.corpus import PackedCorpus

    corpus = PackedCorpus.load(Path(args.corpus_dir))
    spc = 10
    cache_g = dict(support_cache=True, cache_backoff="global")
    full = dict(**cache_g, cache_calib=True, cache_dynamic=True)
    modes = {
        "plain": {},
        "cache_global": cache_g,
        "cache_calib": dict(**cache_g, cache_calib=True),
        "cache_full": full,
        "cache_freq": dict(**full, cache_calib_freq=True),
        # r5 (verdict weak #4): the transformer + aux legs under the SAME
        # interleaved fresh-process protocol, so the RESULTS.md eps/s
        # column can be regenerated from one artifact with no footnotes
        "cache_full_aux": dict(**full, cache_lm_aux=1.0),
        "tfm": dict(model="transformer"),
        "tfm_cache_full": dict(model="transformer", **full),
        "tfm_cache_full_aux": dict(model="transformer", **full,
                                   cache_lm_aux=1.0),
    }
    if args.modes:
        wanted = set(args.modes.split(","))
        modes = {k: v for k, v in modes.items() if k in wanted}

    data = eps.put_corpus(corpus)
    split = jnp.asarray(corpus.splits["train"])
    steps, states = {}, {}
    for name, over in modes.items():
        cfg = Config(vocab_size=len(corpus.vocab), max_len=corpus.max_len,
                     embed_dim=256, hidden_dim=512, num_layers=2,
                     batch_size=32, support_size=5, query_size=5, lr=1e-3,
                     support_mode="mean_state", cell="pallas",
                     compute_dtype="bfloat16", steps_per_call=spc,
                     max_steps=100000, data_parallel=False, **over)
        st = training.init_train_state(cfg, len(corpus.vocab))
        step = training.make_multi_step(
            training.make_train_step(cfg, data, split), spc)
        t0 = time.perf_counter()
        for _ in range(2):                       # warm-twice (compile +
            st, met = step(st)                   # sharding settle)
        jax.block_until_ready(met["loss"])
        print(f"{name}: warm in {time.perf_counter() - t0:.1f}s",
              flush=True)
        steps[name], states[name] = step, st
    batch = 32

    # one untimed burn round per mode (the first timed round after a long
    # compile phase reads slow — gates_int8 r3 lesson)
    for name in modes:
        for _ in range(args.calls_per_round):
            states[name], met = steps[name](states[name])
        jax.block_until_ready(met["loss"])

    times: dict[str, list[float]] = {name: [] for name in modes}
    order = list(modes)
    for r in range(args.rounds):
        seq = order if r % 2 == 0 else order[::-1]
        for name in seq:
            t0 = time.perf_counter()
            for _ in range(args.calls_per_round):
                states[name], met = steps[name](states[name])
            jax.block_until_ready(met["loss"])
            dt = time.perf_counter() - t0
            times[name].append(args.calls_per_round * spc * batch / dt)

    med = {name: round(statistics.median(v), 1)
           for name, v in times.items()}
    out = {
        "protocol": {
            "corpus": args.corpus_dir,
            "shape": "flagship (B=32 K=Q=5 L=%d V=%d E=256 H=512 layers=2 "
                     "bf16 pallas mean_state, spc=10)"
                     % (corpus.max_len, len(corpus.vocab)),
            "timing": f"{args.rounds} interleaved rounds x "
                      f"{args.calls_per_round} chunked calls per mode, "
                      "true median eps/s; one fresh process, warm-twice "
                      "plus one untimed burn round per mode excluded",
            "question": "is the 29-39% calib-leg eps/s toll in the "
                        "(late-session) r3 scale_quality run real, or "
                        "tunnel degradation?  The device trace says the "
                        "whole cache stack costs ~6%.",
        },
        "eps_per_sec": med,
        "eps_all_rounds": {n: [round(x, 1) for x in v]
                           for n, v in times.items()},
        **({"relative_to_plain": {n: round(med[n] / med["plain"], 4)
                                  for n in modes}}
           if "plain" in modes else {}),
        **({"relative_to_cache_global": {
                n: round(med[n] / med["cache_global"], 4) for n in modes}}
           if "cache_global" in modes else {}),
    }
    Path(args.out).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
