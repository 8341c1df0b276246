#!/usr/bin/env python
"""Pallas LSTM envelope edge: pallas vs lax.scan just under/over the cap.

r2 verdict #8: the Wh-VMEM-residency cap (~H=1180 bf16) is documented and
the fallback is tested, but the advertised "supported" envelope had no
perf point near the edge — at H=1024 bf16 the tile picker degenerates to
small batch tiles and the kernel may stop paying.  This measures train-
mode (fwd+bwd, grad leaked into the output so XLA can't DCE the backward)
for pallas vs scan at:

  * H=512  (flagship; context row)
  * H=1024 (just under the bf16 cap: 4H^2*2 = 8MiB of 11MiB budget)
  * H=1280 (over the cap: pallas warns + falls back to scan — timed to
    confirm the fallback costs nothing over calling scan directly)

One process, round-robin over variants (in-context deltas; CLAUDE.md
measurement hygiene), batch-tile choices recorded.  Writes
benchmarks/pallas_envelope.json.

Run on the real chip:  python scripts/pallas_envelope.py
"""

from __future__ import annotations

import json
import sys
import time
import warnings
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from fewshot.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from fewshot.models import lstm as lstm_mod
    from fewshot.ops.lstm_pallas import _batch_tile

    rows, t_, e_ = 320, 96, 256           # flagship [B*(K+Q), L] shape
    layers = 2
    variants = []
    for hidden in (512, 1024, 1280):
        for cell in ("pallas", "scan"):
            variants.append((hidden, cell))

    fns = {}
    xs = {}
    for hidden, cell in variants:
        params = lstm_mod.init_lstm_params(jax.random.PRNGKey(0), e_,
                                           hidden, layers)
        x = jax.random.normal(jax.random.PRNGKey(1), (rows, t_, e_))
        mask = jnp.ones((rows, t_), bool)

        def make(cell=cell, mask=mask):
            def vg(lp, xx):
                val, g = jax.value_and_grad(
                    lambda p: jnp.sum(lstm_mod.lstm_forward(
                        p, xx, mask=mask, compute_dtype=jnp.bfloat16,
                        cell=cell)[0]))(lp)
                return val + 0.0 * g[0]["wh"][0, 0]   # keep bwd alive
            return jax.jit(vg)
        fns[(hidden, cell)] = make()
        xs[(hidden, cell)] = (params, x)

    # compile everything first (fallback warning captured for the record)
    fell_back = {}
    for key in fns:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = fns[key](*xs[key])
            fell_back[key] = any("falling back" in str(x.message)
                                 for x in w)
        jax.block_until_ready(out)
    # settle pass (warm twice)
    for key in fns:
        jax.block_until_ready(fns[key](*xs[key]))

    # round-robin timing: R rounds, each variant once per round, so
    # session drift hits all variants equally
    rounds, acc = 15, {key: 0.0 for key in fns}
    for _ in range(rounds):
        for key in fns:
            t0 = time.perf_counter()
            jax.block_until_ready(fns[key](*xs[key]))
            acc[key] += time.perf_counter() - t0

    out = {"protocol": {
        "shape": f"rows={rows} T={t_} E={e_} layers={layers} bf16 "
                 "train-mode fwd+bwd (grad leaked to defeat DCE)",
        "method": f"one process, round-robin x{rounds} after compile + "
                  "settle pass; per-variant mean ms/call",
        "cap": "pallas requires 4*H^2*itemsize <= 11MiB VMEM for Wh "
               "residency (ops/lstm_pallas.py); bf16 caps at H~1180",
    }, "rows": []}
    for hidden, cell in variants:
        ms = acc[(hidden, cell)] / rounds * 1e3
        row = {"hidden": hidden, "cell": cell, "ms_per_call": round(ms, 2),
               "batch_tile": (_batch_tile(rows, hidden, 2)
                              if cell == "pallas" else None),
               "fell_back_to_scan": fell_back[(hidden, cell)]}
        out["rows"].append(row)
        print(json.dumps(row), flush=True)
    for hidden in (512, 1024, 1280):
        p = next(r for r in out["rows"]
                 if r["hidden"] == hidden and r["cell"] == "pallas")
        s = next(r for r in out["rows"]
                 if r["hidden"] == hidden and r["cell"] == "scan")
        out[f"pallas_speedup_H{hidden}"] = round(
            s["ms_per_call"] / p["ms_per_call"], 3)
    path = REPO / "benchmarks" / "pallas_envelope.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps({"written": str(path),
                      **{k: v for k, v in out.items()
                         if k.startswith("pallas_speedup")}}))


if __name__ == "__main__":
    main()
