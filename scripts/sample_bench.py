#!/usr/bin/env python
"""Pinned sampling-throughput benchmark -> benchmarks/sample_bench.json.

The reference's sampler did one sess.run + host softmax + numpy choice per
token (SURVEY.md §4.3) — latency-bound at host RPC speed.  Ours is a single
lax.scan program per batch.

PROTOCOL REV 2 (r5).  The rev-1 sessions recorded in rounds 2-4 (medians
14.6-43M tok/s) are RETIRED as relay timing artifacts: they are
physically impossible (one decode step is ~400 MFLOP — two 512-wide gate
matmuls plus a [32,512]@[512,5000] head — so 43M tok/s would need ~500
TF/s on a 197 TF/s-peak chip), they do not reproduce (the identical loop
re-run fresh in r5 reads 1.0-1.8M tok/s), and the r5 device trace pins
one 8192-token batch at ~1.93 ms on-chip (= 4.25M tok/s).  A sync probe
(scripts/sample_sync_probe*.py, benchmarks/sample_sync_probe*.json)
verified the primitives: dispatch is async (~0.8 ms), and a SINGLE
dispatch + block_until_ready does synchronize (tunnel-RTT ~24 ms +
device ~1.9 ms) — but under queue depth the relay acks readiness
optimistically: the first rev-2 session's 40-batch brackets still read
an impossible 32M tok/s wall while its device trace reproduced the
on-chip rate to 11 ppm (4,250,243 vs 4,250,289 tok/s).  So wall-bracket
numbers through this relay are NOT trustworthy at any bracket size;
rev 2 (a) records the device-trace tokens/device-second as the ONLY
quotable metric, (b) keeps the wall columns in the artifact purely as a
relay-behavior record, and (c) computes medians over rev-2 sessions
only, keeping the rev-1 rows under "sessions_retired_rev1" as the
record of the correction.

Env knobs: SB_BATCH (32), SB_TOKENS (256), SB_CELL (pallas|scan),
SB_REPEATS (5), SB_ITERS (40).  `--no_record` skips the artifact update.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ARTIFACT = REPO / "benchmarks" / "sample_bench.json"


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
    repeats = int(os.environ.get("SB_REPEATS", "5"))
    bracket_iters = int(os.environ.get("SB_ITERS", "40"))

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

    def measure(early_exit, iters=None):
        """Median-of-`repeats` timing; warm TWICE before the clock (the
        first post-compile call can recompile on a sharding change —
        CLAUDE.md benchmark hygiene).  The bracket is large so the one
        synchronizing tunnel round-trip (~24 ms) amortizes against the
        device work (~1.9 ms/batch) — rev-2 protocol."""
        iters = bracket_iters if iters is None else iters
        for _ in range(2):
            toks = run(0, early_exit)
        jax.block_until_ready(toks)
        samples = []
        for r in range(repeats):
            t0 = time.perf_counter()
            for i in range(iters):
                toks = run(1 + r * iters + i, early_exit)
            jax.block_until_ready(toks)
            samples.append(iters * batch * n_tokens
                           / (time.perf_counter() - t0))
        return samples

    # full-length batch throughput: lax.scan path (untrained params never
    # emit EOS, so the early-exit while_loop runs all n steps and measures
    # its own pipelining penalty — the worst case)
    tps_samples = measure(early_exit=False)
    ee_samples = measure(early_exit=True)
    session = {
        "protocol_rev": 2,
        "bracket_iters": bracket_iters,
        "scan_tps": [round(s, 0) for s in tps_samples],
        "scan_tps_median": round(statistics.median(tps_samples), 0),
        "early_exit_worst_case_tps_median": round(
            statistics.median(ee_samples), 0),
    }

    # HEADLINE metric since rev 2: tokens per DEVICE second from a profiler
    # trace — it cannot be faked by relay/dispatch behavior and it is what
    # the chip actually sustains; the wall medians above carry the tunnel
    # RTT and converge to it from below as the bracket grows.
    import tempfile
    from scripts.trace_audit import parse_trace
    trace_iters = 10
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for i in range(trace_iters):
                toks = run(1000 + i, False)
            jax.block_until_ready(toks)
        try:
            _, device_us = parse_trace(Path(td))
            session["device_tps"] = round(
                trace_iters * batch * n_tokens / (device_us / 1e6), 0)
            session["device_us_per_batch"] = round(device_us / trace_iters, 1)
        except FileNotFoundError:
            pass                          # profiler plugin unavailable

    if "--no_record" not in sys.argv:
        doc = json.loads(ARTIFACT.read_text()) if ARTIFACT.exists() else {}
        old = doc.get("sessions", [])
        rev1 = ([s for s in old if s.get("protocol_rev", 1) < 2]
                + doc.get("sessions_retired_rev1", []))
        doc = {
            "protocol": {
                "shape": f"B={batch} n_tokens={n_tokens} "
                         f"lstm512x2/{cell} support-primed top-k=40",
                "method": "REV 2 (r5): headline = tokens per device-second "
                          "from a profiler trace (10 batches, XLA-Ops lane, "
                          "self-time attribution); wall companion = fixed "
                          f"seeds, warm twice, {repeats} repeats x "
                          f"{bracket_iters}-batch brackets, "
                          "block_until_ready (verified synchronizing — "
                          "benchmarks/sample_sync_probe2.json), one ~24 ms "
                          "tunnel RTT amortized per bracket; medians over "
                          "rev-2 sessions only",
                "rev1_retirement": "rounds 2-4 wall sessions (medians "
                          "14.6-43M tok/s) retired: physically impossible "
                          "(>2.5x the 197 TF/s bf16 peak at ~400 MFLOP per "
                          "decode step), irreproducible (same loop fresh "
                          "in r5: 1.0-1.8M), contradicted by the device "
                          "trace (~1.93 ms per 8192-token batch); kept "
                          "below as the record of the correction",
            },
            "sessions": [s for s in old if s.get("protocol_rev", 1) >= 2],
            "sessions_retired_rev1": rev1,
        }
        doc["sessions"].append(session)
        meds = [s["scan_tps_median"] for s in doc["sessions"]]
        ee = [s["early_exit_worst_case_tps_median"]
              for s in doc["sessions"]]
        doc["wall_tokens_per_sec_median"] = statistics.median(meds)
        doc["wall_tokens_per_sec_band"] = [min(meds), max(meds)]
        doc["early_exit_worst_case_median"] = statistics.median(ee)
        dev = [s["device_tps"] for s in doc["sessions"] if "device_tps" in s]
        if dev:
            doc["device_tokens_per_sec_median"] = statistics.median(dev)
            doc["device_tokens_per_sec_sessions"] = dev
        doc["n_sessions"] = len(doc["sessions"])
        ARTIFACT.write_text(json.dumps(doc, indent=1))

    print(json.dumps({
        "metric": "sample_tokens_per_sec_device",
        "value": session.get("device_tps"),
        "unit": f"tokens/device-sec (1 chip, B={batch}, n={n_tokens}, "
                f"lstm512x2/{cell}, support-primed)",
        "per_stream_us_per_token_device": (
            round(1e6 * batch / session["device_tps"], 2)
            if "device_tps" in session else None),
        "wall_tps_median": session["scan_tps_median"],
        "early_exit_worst_case_tps": session[
            "early_exit_worst_case_tps_median"],
    }))


if __name__ == "__main__":
    main()
