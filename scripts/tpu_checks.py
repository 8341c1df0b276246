#!/usr/bin/env python
"""On-chip checks: Pallas kernel parity + scan-vs-pallas micro-benchmarks.

The CI suite (tests/) runs on a virtual CPU mesh and skips Pallas; this
script is the TPU-side complement (SURVEY.md §5.3 "device tests").  Run on a
machine with a real TPU attached:

    python scripts/tpu_checks.py            # parity + micro-bench
    python scripts/tpu_checks.py --bench    # micro-bench only
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parity(shapes) -> bool:
    import jax
    import jax.numpy as jnp
    from fewshot.models import lstm as L
    from fewshot.ops.lstm_pallas import lstm_layer_pallas

    ok = True
    for (b, t, e, h) in shapes:
        params = L.init_lstm_params(jax.random.PRNGKey(0), e, h, 1)
        x = jax.random.normal(jax.random.PRNGKey(1), (b, t, e))
        lens = jnp.asarray(np.random.RandomState(0).randint(1, t + 1, b))
        mask = jnp.arange(t) < lens[:, None]
        h0c0 = L.zero_state(b, h, 1)[0]

        ys_r, (h_r, c_r) = L._layer_scan(params[0], x, mask, h0c0,
                                         jnp.float32)
        ys_p, (h_p, c_p) = lstm_layer_pallas(params[0], x, mask, h0c0,
                                             jnp.float32)
        fwd_err = float(jnp.abs(ys_p - ys_r).max())

        def loss(fn, p):
            ys, (hh, cc) = fn(p, x, mask, h0c0, jnp.float32)
            return jnp.sum(ys ** 2) + jnp.sum(hh * cc)

        gr = jax.grad(lambda p: loss(L._layer_scan, p))(params[0])
        gp = jax.grad(lambda p: loss(lstm_layer_pallas, p))(params[0])
        rels = {}
        for k in gr:
            scale = float(np.abs(np.asarray(gr[k])).max()) + 1e-12
            rels[k] = float(jnp.abs(gp[k] - gr[k]).max()) / scale
        # grad tolerance 1e-3 rel: accumulation order + TPU default-precision
        # XLA matmuls around the kernel dominate at meta-batch scale
        good = fwd_err < 1e-5 and all(r < 1e-3 for r in rels.values())
        ok &= good
        print(f"parity B={b} T={t} H={h}: fwd_err={fwd_err:.2e} "
              f"grad_rel={ {k: f'{v:.1e}' for k, v in rels.items()} } "
              f"{'OK' if good else 'FAIL'}", flush=True)
    return ok


def micro_bench(b=160, t=255, e=256, h=512, iters=20) -> None:
    """Train-like fwd+bwd through one LSTM layer: scan vs pallas."""
    import jax
    import jax.numpy as jnp
    from fewshot.models import lstm as L
    from fewshot.ops.lstm_pallas import lstm_layer_pallas

    params = L.init_lstm_params(jax.random.PRNGKey(0), e, h, 1)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, e))
    mask = jnp.ones((b, t), bool)
    h0c0 = L.zero_state(b, h, 1)[0]

    results = {}
    for name, fn, dt in [("scan/f32", L._layer_scan, jnp.float32),
                         ("scan/bf16", L._layer_scan, jnp.bfloat16),
                         ("pallas/f32", lstm_layer_pallas, jnp.float32),
                         ("pallas/bf16", lstm_layer_pallas, jnp.bfloat16)]:
        @jax.jit
        def step(p, fn=fn, dt=dt):
            def loss(pp):
                ys, (hh, cc) = fn(pp, x, mask, h0c0, dt)
                return jnp.sum(ys ** 2) + jnp.sum(hh * cc)
            return jax.grad(loss)(p)
        g = step(params[0])
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        for _ in range(iters):
            g = step(params[0])
        jax.block_until_ready(g)
        dt_s = (time.perf_counter() - t0) / iters
        # 2 matmuls/step fwd (zx is amortized) ~ recurrence flops:
        flops = 2 * b * t * h * 4 * h * 3       # fwd + ~2x bwd
        results[name] = dt_s
        print(f"{name}: {dt_s*1e3:.2f} ms/step "
              f"(~{flops/dt_s/1e12:.2f} TFLOP/s recurrence)", flush=True)
    if "scan/f32" in results and "pallas/bf16" in results:
        print(f"pallas/bf16 speedup over scan/f32: "
              f"{results['scan/f32']/results['pallas/bf16']:.2f}x",
              flush=True)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--bench", action="store_true", help="skip parity")
    args = p.parse_args(argv)
    import jax
    from fewshot.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    if jax.default_backend() not in ("tpu", "axon"):
        backend = jax.default_backend()
        print(f"warning: running on {backend}, not a TPU", flush=True)
    if not args.bench:
        ok = parity([(4, 12, 16, 128), (24, 9, 16, 128),
                     (160, 32, 256, 512)])
        if not ok:
            sys.exit(1)
    micro_bench()


if __name__ == "__main__":
    main()
