#!/usr/bin/env python
"""Headline benchmark: episodes/sec of the flagship episodic LSTM train step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline divides by the faithful CPU reference implementation
(scripts/cpu_reference.py -> benchmarks/cpu_reference.json), per the
north-star target of >=50x episodes/sec at matched NLL (BASELINE.json:5).

The benched step is the REAL training step: on-device episode sampling fused
with forward+backward+Adam in one XLA program (fewshot/training.py), at the
reference's canonical 5-shot shape (K=Q=5, embed 256, hidden 512, 2 layers —
BASELINE.json:2,7) on the tight-packed L=96 bench corpus (see BENCH_CORPUS
note below).  Batch size 32 episodes/step on one chip.

Env knobs: BENCH_CELL=scan|pallas (default pallas), BENCH_STEPS, BENCH_BATCH,
BENCH_SPC (steps_per_call chunking, default 10; 1 = per-step dispatch),
BENCH_PROBE_WAIT_S (device-probe budget, default 300 — kept well under the
driver's timeout window so a down tunnel yields a diagnostic JSON line,
never an empty artifact; r4's BENCH_r04.json was rc=124/tail="" because
the old 1800s probe + compile outlasted the window).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path


REPO = Path(__file__).resolve().parent
# v2: packed at auto (tight) max_len — the recurrence runs max_len steps
# whether they are padding or not, so the loose 256 budget was pure waste
# for ~90-token songs.  The CPU reference is measured on the SAME corpus
# (scripts/cpu_reference.py --corpus data/bench_lyrics_v2) so vs_baseline
# stays apples-to-apples.
BENCH_CORPUS = REPO / "data" / "bench_lyrics_v2"


def ensure_corpus():
    from fewshot.data.corpus import PackedCorpus, build_lyrics_corpus
    from fewshot.data.synthetic import generate_lyrics_csv
    if (BENCH_CORPUS / "corpus.npz").exists():
        return PackedCorpus.load(BENCH_CORPUS)
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        csv = Path(tmp) / "lyrics.csv"
        generate_lyrics_csv(csv, num_artists=24, songs_per_artist=16, seed=0)
        return build_lyrics_corpus(csv, BENCH_CORPUS, vocab_size=5000,
                                   max_len=0, seed=0)


def wait_for_device(max_wait_s: int | None = None) -> bool:
    """Ride out transient TPU-tunnel outages (bounded).

    The axon relay occasionally reports UNAVAILABLE for a stretch (observed
    multi-hour outages); a failed backend init is cached for the process
    lifetime, so probe in SUBPROCESSES until one sees the device, then let
    the real import proceed.  No-op when the device is healthy (~2s).

    Returns True when a probe saw the device, False when the budget ran out
    — callers that must NEVER produce an empty artifact (the driver runs
    this script under its own timeout) emit a diagnostic record on False
    instead of letting the real jax init block for another ~25 min."""
    import subprocess
    if max_wait_s is None:
        max_wait_s = int(os.environ.get("BENCH_PROBE_WAIT_S", "300"))
    deadline = time.time() + max_wait_s
    probe = ("import jax, jax.numpy as jnp; "
             "x = jnp.ones((8, 8)); print(float((x @ x).sum()))")
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True,
                               timeout=max(60, min(600, max_wait_s)))
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            print("bench: device still unavailable after "
                  f"{max_wait_s}s of probing", file=sys.stderr)
            return False
        time.sleep(30)


def main() -> None:
    t_start = time.time()
    print(f"bench: start (probe budget "
          f"{os.environ.get('BENCH_PROBE_WAIT_S', '300')}s)",
          file=sys.stderr, flush=True)
    if not wait_for_device():
        # Explicit diagnostic line so the driver's parsed artifact is never
        # null without a reason it can read (r4 verdict item #2).
        print(json.dumps({
            "metric": "train_episodes_per_sec",
            "value": None,
            "unit": "episodes/sec",
            "vs_baseline": None,
            "device_unavailable": True,
            "probe_waited_s": round(time.time() - t_start, 1),
        }), flush=True)
        return
    import jax
    from fewshot.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from fewshot import training
    from fewshot.config import Config
    from fewshot.data import episodes as eps

    cell = os.environ.get("BENCH_CELL", "pallas")
    steps = int(os.environ.get("BENCH_STEPS", "40"))
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    support_mode = os.environ.get("BENCH_SUPPORT", "mean_state")

    spc = int(os.environ.get("BENCH_SPC", "10"))

    corpus = ensure_corpus()
    cfg = Config(vocab_size=5000, max_len=corpus.max_len, embed_dim=256,
                 hidden_dim=512,
                 num_layers=2, batch_size=batch, support_size=5,
                 query_size=5, cell=cell, support_mode=support_mode,
                 compute_dtype="bfloat16" if cell == "pallas" else "float32",
                 data_parallel=True, steps_per_call=spc,
                 log_interval=spc, eval_interval=0, checkpoint_interval=0,
                 max_steps=max(steps, spc))
    data = eps.put_corpus(corpus)
    split = jax.numpy.asarray(corpus.splits["train"])
    state = training.init_train_state(cfg, len(corpus.vocab))
    # The REAL train step, dispatched in steps_per_call chunks exactly as
    # the train CLI does (training.make_multi_step): same trajectory, one
    # host round trip per chunk.
    step = training.make_multi_step(
        training.make_train_step(cfg, data, split), spc)
    n_calls = max(1, steps // spc)

    print(f"bench: corpus+state ready at +{time.time() - t_start:.0f}s, "
          "compiling", file=sys.stderr, flush=True)
    # warmup: compile + settle
    for _ in range(2):
        state, metrics = step(state)
    jax.block_until_ready(metrics["loss"])
    print(f"bench: compiled at +{time.time() - t_start:.0f}s, timing",
          file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, metrics = step(state)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    eps_per_sec = n_calls * spc * cfg.batch_size / dt

    ref_path = REPO / "benchmarks" / "cpu_reference.json"
    vs = None
    if ref_path.exists():
        ref = json.loads(ref_path.read_text())
        vs = eps_per_sec / ref["episodes_per_sec"]

    rec = {
        "metric": "train_episodes_per_sec",
        "value": round(eps_per_sec, 2),
        "unit": f"episodes/sec (1 chip, B={batch}, K=Q=5, "
                f"L={cfg.max_len}, lstm512x2/{cell}/{support_mode})",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }
    # Quality half of the >=50x target (BASELINE.json:5 "at matched
    # per-token query NLL"): measured by scripts/matched_nll.py — wall
    # clock for CPU reference vs TPU path to reach the SAME val NLL with
    # the same concat-prime architecture and eval harness.
    matched = REPO / "benchmarks" / "matched_nll.json"
    if matched.exists():
        m = json.loads(matched.read_text())
        rec["matched_nll_target"] = m["target_val_nll"]
        rec["speedup_to_matched_nll"] = m["speedup_time_to_matched_nll"]
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
