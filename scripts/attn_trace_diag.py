#!/usr/bin/env python
"""Identify WHICH attention call the hot transformer backward op is.

The r5 trace (benchmarks/step_profile_v5000_tfm.json) shows one custom-VJP
backward — `transpose_jvp___.48`, 823 us, 13% of device — running ~2.3x its
~365 us siblings, but the parsed per-op table carries only the (anonymous)
HLO instruction names.  ROADMAP.md names the follow-up: one profiler
session with kernel-name attribution.  This script does that session:

  * runs the EXACT trace_audit transformer step (same corpus/Config),
  * dumps every XLA-Ops-lane event >= a cutoff WITH ITS FULL `args`
    payload (XLA attaches `long_name` / `tf_op` / source metadata that the
    step-profile parser intentionally drops), and
  * if the remote executable exposes optimized HLO (`compiled.as_text()`),
    greps the hot instruction names for their `metadata={op_name=...,
    source_file=..., source_line=...}` — the op_name carries the jax
    name_stack, the source line the exact pallas_call site.

Run on the real chip: python scripts/attn_trace_diag.py
"""

from __future__ import annotations

import glob
import gzip
import json
import re
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CUTOFF_US_PER_STEP = 30.0


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus_dir", default=None,
                    help="corpus to trace (default: the bench.py corpus; "
                         "the committed V=5000 profile used "
                         "data/scale_lyrics/plain — the fused head-CE "
                         "custom call only engages above ONEHOT_VOCAB_MAX, "
                         "so the bench corpus compiles a DIFFERENT head)")
    args = ap.parse_args()

    import jax
    from fewshot.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from bench import ensure_corpus
    from fewshot import training
    from fewshot.config import Config
    from fewshot.data import episodes as eps

    if args.corpus_dir:
        from fewshot.data.corpus import PackedCorpus
        corpus = PackedCorpus.load(args.corpus_dir)
    else:
        corpus = ensure_corpus()
    cfg = Config(vocab_size=max(5000, len(corpus.vocab)),
                 max_len=corpus.max_len, embed_dim=256,
                 hidden_dim=512, num_layers=2, batch_size=32,
                 support_size=5, query_size=5, cell="pallas",
                 model="transformer",
                 support_mode="mean_state", compute_dtype="bfloat16",
                 data_parallel=True, steps_per_call=10, log_interval=10,
                 eval_interval=0, checkpoint_interval=0, max_steps=100)
    data = eps.put_corpus(corpus)
    split = jax.numpy.asarray(corpus.splits["train"])
    state = training.init_train_state(cfg, len(corpus.vocab))
    spc = cfg.steps_per_call
    step = training.make_multi_step(
        training.make_train_step(cfg, data, split), spc)

    for _ in range(2):
        state, m = step(state)
    jax.block_until_ready(m["loss"])
    print("warmed; tracing", flush=True)

    trace_dir = Path(tempfile.mkdtemp(prefix="attn_diag_"))
    jax.profiler.start_trace(str(trace_dir))
    for _ in range(2):
        state, m = step(state)
    jax.block_until_ready(m["loss"])
    jax.profiler.stop_trace()
    n_steps = 2 * spc

    # --- dump XLA Ops events with full args ---------------------------------
    files = glob.glob(str(trace_dir / "plugins" / "profile" / "*" /
                          "*.trace.json.gz"))
    rows = {}
    for f in files:
        with gzip.open(f, "rt") as fh:
            doc = json.load(fh)
        events = doc.get("traceEvents", [])
        tpu_pids = {e["pid"] for e in events
                    if e.get("ph") == "M" and e.get("name") == "process_name"
                    and "TPU" in str(e.get("args", {}).get("name", ""))}
        op_tids = {(e["pid"], e["tid"]) for e in events
                   if e.get("ph") == "M" and e.get("name") == "thread_name"
                   and e["pid"] in tpu_pids
                   and e.get("args", {}).get("name") == "XLA Ops"}
        for e in events:
            if e.get("ph") != "X":
                continue
            if (e.get("pid"), e.get("tid")) not in op_tids:
                continue
            name = e.get("name", "?")
            r = rows.setdefault(name, {"us": 0.0, "args": {}})
            r["us"] += float(e.get("dur", 0.0))
            for k, v in (e.get("args") or {}).items():
                r["args"].setdefault(k, v)

    table = sorted(rows.items(), key=lambda kv: -kv[1]["us"])
    hot = []
    print(f"\n=== XLA Ops events >= {CUTOFF_US_PER_STEP} us/step "
          f"(of {len(table)} names) ===")
    for name, r in table:
        us = r["us"] / n_steps
        if us < CUTOFF_US_PER_STEP:
            continue
        hot.append(name)
        print(f"\n{us:9.1f} us/step  {name}")
        for k, v in sorted(r["args"].items()):
            print(f"    {k}: {str(v)[:300]}")

    # --- optimized-HLO metadata for the hot instructions --------------------
    print("\n=== optimized HLO metadata (if exposed) ===", flush=True)
    try:
        txt = step.lower(state).compile().as_text()
    except Exception as exc:  # remote executables may not expose HLO
        print(f"compiled.as_text() unavailable: {exc!r}")
        txt = ""
    if txt:
        Path("/tmp/attn_diag_hlo.txt").write_text(txt)
        print(f"optimized HLO: {len(txt)} chars -> /tmp/attn_diag_hlo.txt")
        for name in hot:
            pat = re.compile(r"%" + re.escape(name) + r" = .*")
            for mt in pat.finditer(txt):
                line = mt.group(0)
                print(f"\n--- {name}\n{line[:1200]}")
                break


if __name__ == "__main__":
    main()
