#!/usr/bin/env python
"""int8 saved-gates study (ROADMAP r4 #4) -> benchmarks/gates_int8.json.

The BPTT backward kernel streams gates(4H)+cs(2H)+dys(H)+dzx(4H) per
row-step and sits near the HBM bandwidth floor at the flagship shape
(benchmarks/step_profile.json), so FEWSHOT_LSTM_GATES_INT8=1 affine-codes
the saved gate activations int8 (fewshot/ops/lstm_pallas.py), trimming
~18% of the backward stream bytes (and the same share of the forward's
gate-save write).  This script decides the flag on evidence:

  1. throughput: the bench.py flagship step, exact vs int8 gates, same
     process, interleaved A/B/A/B rounds (the in-context-delta protocol
     from CLAUDE.md — separate sessions are not comparable through the
     tunnel);
  2. convergence: N-step training runs at fixed seed for both modes on
     the bench corpus, comparing final val NLL (the dequant noise is a
     <=1/254-per-gate multiplicative perturbation of backward deltas —
     the gate must show it does not cost quality).

Interpret-mode/grad parity is pinned by tests/test_pallas.py
(test_gates_int8_interpret_parity_subprocess).

Run on the real chip:  python scripts/gates_int8_study.py
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


def make_warm_step(cfg, corpus, int8: bool, state):
    """Build AND WARM the chunked train step with the gate mode toggled.

    The flag is read at TRACE time, so the compile (triggered by the
    warmup calls) must happen while the flag is set; once compiled, the
    executable is frozen and A/B interleaving is safe."""
    import jax
    from fewshot import training
    from fewshot.data import episodes as eps
    from fewshot.ops import lstm_pallas as P

    P._GATES_INT8 = int8
    data = eps.put_corpus(corpus)
    split = jax.numpy.asarray(corpus.splits["train"])
    step = training.make_multi_step(
        training.make_train_step(cfg, data, split), cfg.steps_per_call)
    for _ in range(2):
        state, met = step(state)
    jax.block_until_ready(met["loss"])
    P._GATES_INT8 = False
    return step, state


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "benchmarks" /
                                         "gates_int8.json"))
    ap.add_argument("--rounds", type=int, default=6,
                    help="interleaved A/B timing rounds per mode")
    ap.add_argument("--calls_per_round", type=int, default=4)
    ap.add_argument("--conv_steps", type=int, default=2000)
    args = ap.parse_args(argv)

    import jax
    from fewshot.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from bench import ensure_corpus
    from fewshot import training
    from fewshot.config import Config
    from fewshot.data import episodes as eps

    corpus = ensure_corpus()
    spc = 10
    cfg = Config(vocab_size=5000, max_len=corpus.max_len, embed_dim=256,
                 hidden_dim=512, num_layers=2, batch_size=32,
                 support_size=5, query_size=5, cell="pallas",
                 support_mode="mean_state", compute_dtype="bfloat16",
                 data_parallel=True, steps_per_call=spc, log_interval=spc,
                 eval_interval=0, checkpoint_interval=0, max_steps=100000)

    # build + warm both compiles (and settle shardings) OUTSIDE the timed
    # region; each mode's compile runs while its flag is set
    steps, states = {}, {}
    for m, flag in (("exact", False), ("int8", True)):
        st = training.init_train_state(cfg, len(corpus.vocab))
        steps[m], states[m] = make_warm_step(cfg, corpus, flag, st)

    # One extra UNTIMED round per mode first: the warm-twice in
    # make_warm_step settles compiles, but the very first timed round
    # still read ~16% slow in the r3 run (residual device-side warmup),
    # so it is burned here instead of polluting the aggregate.
    for m in ("exact", "int8"):
        for _ in range(args.calls_per_round):
            states[m], met = steps[m](states[m])
        jax.block_until_ready(met["loss"])

    times: dict[str, list[float]] = {"exact": [], "int8": []}
    for r in range(args.rounds):
        for m in ("exact", "int8") if r % 2 == 0 else ("int8", "exact"):
            t0 = time.perf_counter()
            for _ in range(args.calls_per_round):
                states[m], met = steps[m](states[m])
            jax.block_until_ready(met["loss"])
            dt = time.perf_counter() - t0
            times[m].append(args.calls_per_round * spc * cfg.batch_size / dt)

    med = {m: statistics.median(v) for m, v in times.items()}

    # --- convergence gate: fixed-seed training, same corpus, both modes --
    conv = {}
    split = jax.numpy.asarray(corpus.splits["train"])
    val_split = jax.numpy.asarray(corpus.splits["val"])
    data = eps.put_corpus(corpus)
    eval_step = training.make_eval_step(cfg, data, val_split)
    for m in ("exact", "int8"):
        st = training.init_train_state(cfg, len(corpus.vocab))
        step = steps[m]
        for _ in range(args.conv_steps // spc):
            st, met = step(st)
        val = training.evaluate(cfg, st.params, data, val_split,
                                jax.random.PRNGKey(7), num_episodes=256,
                                eval_step=eval_step)
        conv[m] = {"train_loss": round(float(met["loss"]), 4),
                   "val_nll": round(float(val), 4)}

    out = {
        "protocol": {
            "shape": "bench.py flagship (B=32 K=Q=5 L=%d E=256 H=512 "
                     "layers=2 bf16 pallas mean_state, spc=10)"
                     % corpus.max_len,
            "throughput": f"{args.rounds} interleaved rounds x "
                          f"{args.calls_per_round} chunked calls per mode, "
                          "true median eps/s (one process; warm-twice plus "
                          "one untimed burn round per mode excluded)",
            "convergence": f"{args.conv_steps} steps at fixed seed per "
                           "mode, val NLL over 256 episodes — a "
                           "TRAJECTORY-EQUIVALENCE check on the "
                           "deliberately-overfit bench corpus (train << "
                           "val); compare the two modes to each other "
                           "only, it is NOT a healthy-convergence claim",
        },
        "eps_per_sec": {m: round(v, 1) for m, v in med.items()},
        "eps_all_rounds": {m: [round(x, 1) for x in v]
                           for m, v in times.items()},
        "speedup_int8": round(med["int8"] / med["exact"], 4),
        "convergence": conv,
        "val_nll_delta_int8": round(conv["int8"]["val_nll"]
                                    - conv["exact"]["val_nll"], 4),
    }
    Path(args.out).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
