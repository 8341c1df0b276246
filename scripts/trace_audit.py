#!/usr/bin/env python
"""Device-trace audit of the flagship train step -> benchmarks/step_profile.json.

r2 verdict #2: the "~75% MFU / 85-95% MXU" claims cited a device-trace
audit that was never committed as an artifact.  This script reproduces it
reproducibly: run the exact bench.py step (same corpus, same Config) under
jax.profiler, parse the device trace (events on the TPU device track,
summed by op name — the CLAUDE.md recipe; per-op micro-timings of separate
jits are unreliable through the remote-device tunnel), and write the
per-op table, totals, the FLOP model (formulas spelled out), and the MFU
both ways:

  * hand model: exact-BPTT matmul FLOPs of the episodic LSTM step,
    each term written as a formula string in the JSON;
  * XLA cost analysis of the compiled program (includes the Pallas
    kernels' pl.CostEstimate), as a cross-check.

Run on the real chip:  python scripts/trace_audit.py
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# bf16 MXU peak per chip by device kind (TFLOP/s).  v5 lite == v5e.
PEAK_BF16 = {"TPU v5 lite": 197e12, "TPU v5e": 197e12, "TPU v4": 275e12,
             "TPU v6 lite": 918e12}


def parse_trace(trace_dir: Path) -> tuple[dict, float]:
    """Sum event durations (us) by op name over the TPU device track.

    Returns ({name: total_us}, device_total_us).  Only events on pids whose
    process_name mentions the TPU device are counted — host-side threads
    (dispatch, transfer) are excluded from device time."""
    files = glob.glob(str(trace_dir / "plugins" / "profile" / "*" /
                          "*.trace.json.gz"))
    if not files:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    by_name: dict[str, float] = defaultdict(float)
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            doc = json.load(fh)
        events = doc.get("traceEvents", [])
        tpu_pids = {e["pid"] for e in events
                    if e.get("ph") == "M" and e.get("name") == "process_name"
                    and "TPU" in str(e.get("args", {}).get("name", ""))}
        # Only the "XLA Ops" lane carries the non-overlapping per-op
        # timeline; "XLA Modules"/"Steps"/"Scalar Unit"/"TC Overlay" lanes
        # NEST over the same wall interval and would double count.
        op_tids = {(e["pid"], e["tid"]) for e in events
                   if e.get("ph") == "M" and e.get("name") == "thread_name"
                   and e["pid"] in tpu_pids
                   and e.get("args", {}).get("name") == "XLA Ops"}
        ops = sorted(((float(e["ts"]), float(e.get("dur", 0.0)),
                       e.get("name", "?")) for e in events
                      if e.get("ph") == "X"
                      and (e.get("pid"), e.get("tid")) in op_tids),
                     key=lambda r: (r[0], -r[1]))
        # Events NEST (flame graph in one lane): an umbrella `while`/call
        # op contains its body ops.  Attribute SELF time (dur minus direct
        # children) so totals equal device-busy time, not a multiple.
        stack: list[list] = []           # [end_ts, name, self_dur]
        for ts, dur, name in ops:
            while stack and stack[-1][0] <= ts + 1e-9:
                _, n, self_dur = stack.pop()
                by_name[n] += self_dur
                total += self_dur
            if stack:                    # nested: subtract from parent
                stack[-1][2] -= dur
            stack.append([ts + dur, name, dur])
        while stack:
            _, n, self_dur = stack.pop()
            by_name[n] += self_dur
            total += self_dur
    return dict(by_name), total


def flop_model(cfg, corpus_vocab: int) -> tuple[dict, float]:
    """Exact-BPTT matmul FLOPs per train step, term by term.

    Rows: every episode contributes K support + Q query songs; the query
    scores L-1 target positions.  All matmul FLOPs are 2*m*n*k.  Backward
    of a matmul costs 2x its forward (dX and dW contractions); the
    recurrence is differentiated exactly (no truncation), so train = 3x
    the forward matmul FLOPs plus the Adam elementwise (negligible)."""
    B, K, Q = cfg.batch_size, cfg.support_size, cfg.query_size
    T, E, H, V = cfg.max_len, cfg.embed_dim, cfg.hidden_dim, corpus_vocab
    rows = B * (K + Q)           # support rows run T steps, query rows T-1;
    # the model treats both as T (within ~1%: query uses L-1 of L).
    terms = {}

    def term(name, formula, flops):
        terms[name] = {"formula": formula, "gflops": round(flops / 1e9, 3)}
        return flops

    fwd = 0.0
    four_h = 4 * H
    # embedding folded into layer-0 projection: zx0 = onehot @ (embed@Wx0)
    # — mirror the models/lm.py _lstm_embed eligibility gate exactly
    folded = (four_h > E and V <= 1024
              and V < (E * four_h) // (four_h - E) and rows * T >= 512)
    if folded:
        fwd += term("l0_input_proj(folded)",
                    "2*rows*T*V*4H + 2*V*E*4H (precontract)",
                    2 * rows * T * V * four_h + 2 * V * E * four_h)
    else:
        fwd += term("l0_input_proj", "2*rows*T*E*4H",
                    2 * rows * T * E * four_h)
    if cfg.num_layers > 1:
        fwd += term("l1+_input_proj", "2*(L-1)*rows*T*H*4H",
                    2 * (cfg.num_layers - 1) * rows * T * H * four_h)
    fwd += term("recurrent_Wh", "2*L*rows*T*H*4H",
                2 * cfg.num_layers * rows * T * H * four_h)
    # tied head over the QUERY rows — mirror the lm.head_logits
    # pre-contract gate: small V pays H*E*V once then one [H,V] matmul
    qrows = B * Q * (T - 1)
    if H > E and V < (H * E) / (H - E) and qrows * (H - E) > H * E:
        fwd += term("head(precontracted)", "2*(H*E*V + B*Q*(T-1)*H*V)",
                    2 * (H * E * V + qrows * H * V))
    else:
        fwd += term("head", "2*B*Q*(T-1)*(H*E + E*V)",
                    2 * qrows * (H * E + E * V))
    total = 3.0 * fwd            # exact BPTT: bwd = 2x fwd matmul FLOPs
    terms["_total"] = {
        "formula": "3x forward matmul FLOPs (exact BPTT; bwd = dX + dW "
                   "= 2x fwd)",
        "gflops": round(total / 1e9, 3),
        "note": f"rows=B*(K+Q)={rows}, T={T}, V={V}, folded_embed={folded}",
    }
    return terms, total


def tfm_flop_model(cfg, corpus_vocab: int) -> tuple[dict, float]:
    """Exact matmul FLOPs per episodic-transformer train step (r4).

    Mirrors models/transformer.py transformer_prefix_forward exactly: the
    K-support concat forms a P=K*L prefix stream (causal self-attention,
    computed once per episode); each of the Q query songs (Lq=L-1 target
    positions) attends to prefix ++ itself.  Conventions shared with the
    LSTM model: all matmul FLOPs are 2*m*n*k; train = 3x forward (exact
    backward: dX + dW = 2x fwd).  Attention score/out FLOPs count the
    full rectangles the kernels actually sweep (ops/prefix_attention.py
    masks causal blocks in-kernel rather than skipping them), and the
    flash kernels' backward score RECOMPUTATION is deliberately NOT
    credited — same rule as the LSTM model's uncredited fused-head
    logit recompute — so MFU reads conservative (required work only)."""
    B, K, Q = cfg.batch_size, cfg.support_size, cfg.query_size
    T, E, V = cfg.max_len, cfg.embed_dim, corpus_vocab
    F = cfg.mlp_ratio * E
    nlayers = cfg.num_layers
    P = K * T                       # prefix tokens per episode
    Lq = T - 1                      # query target positions
    ptok = B * P                    # prefix-stream tokens
    qtok = B * Q * Lq               # query-stream tokens
    terms = {}

    def term(name, formula, flops):
        terms[name] = {"formula": formula, "gflops": round(flops / 1e9, 3)}
        return flops

    # The LAST layer's prefix-stream tail is DEAD CODE: only hq feeds the
    # head, and layer i's query stream consumes the prefix K/V projected
    # from hp at the layer INPUT — so the final layer's prefix
    # self-attention, its wo projection, and its MLP are never consumed,
    # and XLA deletes them (verified r5 on the compiled HLO: exactly ONE
    # causal-attention custom-call pair for nlayers=2 —
    # scripts/attn_trace_diag.py, benchmarks/attn_bwd_ident.json).  They
    # are therefore NOT required work and must not pad the MFU
    # denominator (the r4/early-r5 model counted them; the 25.8%/40.5%
    # MFU figures quoted from it are inflated by ~1.25x at this shape).
    live_p = nlayers - 1            # layers whose prefix tail is consumed
    fwd = 0.0
    fwd += term("qkv_proj", "2*L*(ptok+qtok)*E*3E  (fused QKV, both "
                "streams; the last layer's dead prefix q-slice is not "
                "separable from the fused matmul, so it stays counted)",
                2 * nlayers * (ptok + qtok) * E * 3 * E)
    fwd += term("prefix_self_attn", "2*(L-1)*2*B*P*P*E  (scores + "
                "probs@V, causal rectangle; last layer dead)",
                2 * live_p * 2 * B * P * P * E)
    fwd += term("query_prefix_attn", "2*L*2*B*Q*Lq*(P+Lq)*E  (scores + "
                "probs@V over prefix ++ self)",
                2 * nlayers * 2 * B * Q * Lq * (P + Lq) * E)
    fwd += term("attn_out_proj", "2*((L-1)*ptok + L*qtok)*E*E  (last "
                "layer's prefix wo dead)",
                2 * (live_p * ptok + nlayers * qtok) * E * E)
    fwd += term("mlp", "2*((L-1)*ptok + L*qtok)*2*E*F  (w1 + w2; last "
                "layer's prefix MLP dead)",
                2 * (live_p * ptok + nlayers * qtok) * 2 * E * F)
    fwd += term("head", "2*qtok*E*V  (tied embedding head, query "
                "positions only)", 2 * qtok * E * V)
    total = 3.0 * fwd
    terms["_total"] = {
        "formula": "3x forward matmul FLOPs (exact backward; flash "
                   "recompute and remat not credited; the last layer's "
                   "dead prefix tail not credited)",
        "gflops": round(total / 1e9, 3),
        "note": f"P=K*T={P}, Lq={Lq}, ptok={ptok}, qtok={qtok}, E={E}, "
                f"F={F}, V={V}, layers={nlayers}",
    }
    return terms, total


def main(argv=None) -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus_dir", default=None,
                    help="corpus to audit (default: the bench.py corpus)")
    ap.add_argument("--out", default=str(REPO / "benchmarks" /
                                         "step_profile.json"))
    ap.add_argument("--support_cache", action="store_true")
    ap.add_argument("--cache_stack", default=None,
                    choices=("global", "calib", "full", "freq"),
                    help="trace a specific cache-posterior stack "
                         "(implies --support_cache)")
    ap.add_argument("--model", default="lstm", choices=("lstm",
                                                        "transformer"),
                    help="which family to trace; each has its own exact "
                         "hand FLOP model (flop_model / tfm_flop_model)")
    args = ap.parse_args(argv)

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
    stacks = {
        None: {},
        "global": dict(cache_backoff="global"),
        "calib": dict(cache_backoff="global", cache_calib=True),
        "full": dict(cache_backoff="global", cache_calib=True,
                     cache_dynamic=True),
        "freq": dict(cache_backoff="global", cache_calib=True,
                     cache_dynamic=True, cache_calib_freq=True),
    }
    cfg = Config(vocab_size=max(5000, len(corpus.vocab)),
                 max_len=corpus.max_len, embed_dim=256,
                 hidden_dim=512, num_layers=2, batch_size=32,
                 support_size=5, query_size=5, cell="pallas",
                 model=args.model,
                 support_mode="mean_state", compute_dtype="bfloat16",
                 support_cache=args.support_cache or bool(args.cache_stack),
                 **stacks[args.cache_stack],
                 data_parallel=True, steps_per_call=10, log_interval=10,
                 eval_interval=0, checkpoint_interval=0, max_steps=100)
    data = eps.put_corpus(corpus)
    split = jax.numpy.asarray(corpus.splits["train"])
    state = training.init_train_state(cfg, len(corpus.vocab))
    spc = cfg.steps_per_call
    step = training.make_multi_step(
        training.make_train_step(cfg, data, split), spc)

    # warm twice: compile, then settle the state sharding (the first
    # post-compile call can RECOMPILE when the train state's sharding
    # changes — CLAUDE.md benchmark hygiene)
    for _ in range(2):
        state, m = step(state)
    jax.block_until_ready(m["loss"])

    n_calls = 2                   # 2 chunks x spc steps under the trace
    # A FRESH dir per run: the parser globs every plugins/profile/* session
    # under the dir, so a reused path would sum this run's trace with every
    # previous run's (which inflated the first two V=5000 audits until the
    # arithmetic said device > wall).
    import tempfile
    trace_dir = Path(tempfile.mkdtemp(prefix="trace_audit_"))
    jax.profiler.start_trace(str(trace_dir))
    for _ in range(n_calls):
        state, m = step(state)
    jax.block_until_ready(m["loss"])
    jax.profiler.stop_trace()
    n_steps = n_calls * spc

    # wall-clock of the same region, re-measured without the profiler on
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, m = step(state)
    jax.block_until_ready(m["loss"])
    wall_ms_per_step = (time.perf_counter() - t0) / n_steps * 1e3

    by_name, device_total_us = parse_trace(trace_dir)
    per_step_ms = device_total_us / n_steps / 1e3

    if args.model == "lstm":
        terms, flops_per_step = flop_model(cfg, len(corpus.vocab))
    else:
        terms, flops_per_step = tfm_flop_model(cfg, len(corpus.vocab))
    kind = jax.devices()[0].device_kind
    peak = PEAK_BF16.get(kind)
    mfu_device = (flops_per_step / (per_step_ms / 1e3)) / peak \
        if peak and flops_per_step else None
    mfu_wall = (flops_per_step / (wall_ms_per_step / 1e3)) / peak \
        if peak and flops_per_step else None

    # XLA cost-analysis cross-check (includes the Pallas CostEstimates)
    cost = step.lower(state).compile().cost_analysis()
    xla_flops_per_step = float(cost.get("flops", 0.0)) / spc if cost else None

    table = sorted(((n, round(us / n_steps, 1),
                     round(us / device_total_us * 100, 1))
                    for n, us in by_name.items()), key=lambda r: -r[1])
    out = {
        "protocol": {
            "shape": f"{args.model} B=32 K=Q=5 L={cfg.max_len} E=256 "
                     + ("H=512 " if args.model == "lstm"
                        else f"nh={cfg.num_heads} F={cfg.mlp_ratio * 256} ")
                     + f"layers=2 V={len(corpus.vocab)} bf16 pallas "
                     f"mean_state (bench.py flagship)",
            "method": "jax.profiler trace of 2x10-step chunked calls after "
                      "a 2-call warmup; device time = sum of op durations "
                      "on the TPU device track; wall time re-measured "
                      "without the profiler",
            "device_kind": kind,
            "peak_bf16_flops": peak,
        },
        "per_step_device_ms": round(per_step_ms, 3),
        "per_step_wall_ms": round(wall_ms_per_step, 3),
        "flop_model": terms,
        "mfu_vs_device_time": round(mfu_device, 4) if mfu_device else None,
        "mfu_vs_wall_time": round(mfu_wall, 4) if mfu_wall else None,
        "xla_cost_analysis_gflops_per_step": (
            round(xla_flops_per_step / 1e9, 3) if xla_flops_per_step
            else None),
        "xla_cost_analysis_note": "undercounts: XLA's TPU cost analysis "
            "does not include Pallas custom-call kernels (the LSTM "
            "recurrence fwd+bwd) and skips some fused contractions; the "
            "hand flop_model is the authoritative count for MFU",
        "per_op_us_per_step": [
            {"op": n, "us": us, "pct_of_device": pct}
            for n, us, pct in table[:25]],
        "ops_counted": len(table),
    }
    if args.support_cache:
        out["protocol"]["support_cache"] = \
            "on — adds VPU-side cache counting/mixing, no matmul FLOPs; " \
            "MFU is quoted against the same matmul FLOP model"
    path = Path(args.out)
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps({"per_step_device_ms": out["per_step_device_ms"],
                      "per_step_wall_ms": out["per_step_wall_ms"],
                      "mfu_vs_device_time": out["mfu_vs_device_time"],
                      "mfu_vs_wall_time": out["mfu_vs_wall_time"],
                      "written": str(path)}))


if __name__ == "__main__":
    main()
