#!/usr/bin/env python
"""Component-level timing of the flagship bench train step.

Times, at the exact bench.py shape, separately-jitted pieces:
  - episode sampling alone
  - support-state fwd alone
  - full episodic loss fwd (support + query + head)
  - full train step (fwd+bwd+Adam, fused with sampling) = the headline
  - head-only matmul+log_softmax fwd at the query shape
  - raw 2-layer LSTM fwd / fwd+bwd at the [B*K, L] shape

The deltas locate the next optimization target (kernel vs head vs glue).
Run on the real chip: `python scripts/step_profile.py`.
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def timeit(fn, *args, n=30, warm=3):
    import jax
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from fewshot.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from bench import ensure_corpus
    from fewshot import training
    from fewshot.config import Config
    from fewshot.data import episodes as eps
    from fewshot.models import lm, lstm as lstm_mod

    corpus = ensure_corpus()
    cfg = Config(vocab_size=5000, max_len=corpus.max_len, embed_dim=256,
                 hidden_dim=512, num_layers=2, batch_size=32,
                 support_size=5, query_size=5, cell="pallas",
                 support_mode="mean_state", compute_dtype="bfloat16",
                 data_parallel=True)
    v = len(corpus.vocab)
    print(f"corpus: vocab={v}, max_len={corpus.max_len}", flush=True)
    data = eps.put_corpus(corpus)
    split = jnp.asarray(corpus.splits["train"])
    state = training.init_train_state(cfg, v)

    step = training.make_train_step(cfg, data, split)
    state, m = step(state)          # settle sharding (recompile guard)
    dt_full = timeit(lambda s: step(s)[1]["loss"], state)
    print(f"full train step:        {dt_full*1e3:8.3f} ms "
          f"({cfg.batch_size/dt_full:.0f} eps/s)", flush=True)

    key = jax.random.PRNGKey(0)
    sample = jax.jit(lambda k: eps.sample_episode(
        k, data, split, cfg.batch_size, k=cfg.support_size,
        q=cfg.query_size))
    ep = sample(key)
    dt = timeit(lambda k: sample(k).query, key)
    print(f"episode sampling only:  {dt*1e3:8.3f} ms", flush=True)

    loss_fn = jax.jit(lambda p, e: lm.episodic_nll_stats(p, e, cfg)[0])
    dt_fwd = timeit(loss_fn, state.params, ep)
    print(f"episodic loss fwd:      {dt_fwd*1e3:8.3f} ms", flush=True)

    # Return a leaf OF THE GRADS too — returning only the value lets XLA
    # dead-code-eliminate the whole backward pass (measured: "fwd+bwd"
    # faster than fwd).
    def mean_loss(p, e):
        tot, cnt = lm.episodic_nll_stats(p, e, cfg)
        return tot / jnp.maximum(cnt, 1.0)
    vg = jax.jit(lambda p, e: (
        lambda v, g: v + 0.0 * g["lstm"][0]["wh"][0, 0])(
            *jax.value_and_grad(mean_loss)(p, e)))
    dt_vg = timeit(vg, state.params, ep)
    print(f"loss fwd+bwd (no opt):  {dt_vg*1e3:8.3f} ms", flush=True)

    sup_fn = jax.jit(lambda p, e: lm.support_state(
        p, e.support, e.support_len, cfg)[0][0])
    dt_sup = timeit(sup_fn, state.params, ep)
    print(f"support-state fwd only: {dt_sup*1e3:8.3f} ms", flush=True)

    # head-only at the query shape [B*Q, L-1, H]
    bq, l1 = cfg.batch_size * cfg.query_size, cfg.max_len - 1
    hid = jnp.zeros((bq, l1, cfg.hidden_dim), jnp.float32)
    tgt = jnp.zeros((bq, l1), jnp.int32)
    msk = jnp.ones((bq, l1), jnp.float32)
    head_fn = jax.jit(lambda p, h: lm.token_nll(
        lm.head_logits(p, h, cfg), tgt, msk)[0])
    dt_head = timeit(head_fn, state.params, hid)
    head_vg = jax.jit(lambda p, h: (
        lambda v, g: v + 0.0 * g[0, 0, 0])(*jax.value_and_grad(
            lambda hh: lm.token_nll(lm.head_logits(p, hh, cfg), tgt,
                                    msk)[0] / (bq * l1))(h)))
    dt_head_vg = timeit(head_vg, state.params, hid)
    print(f"head fwd (V={v}):       {dt_head*1e3:8.3f} ms;  "
          f"head fwd+bwd: {dt_head_vg*1e3:8.3f} ms", flush=True)

    # raw LSTM fwd / fwd+bwd at the [B*K, L] support shape
    bk = cfg.batch_size * cfg.support_size
    x = jnp.zeros((bk, cfg.max_len, cfg.embed_dim), jnp.float32)
    xmask = jnp.ones((bk, cfg.max_len), bool)
    lstm_params = state.params["lstm"]
    fwd = jax.jit(lambda lp, xx: lstm_mod.lstm_forward(
        lp, xx, mask=xmask, compute_dtype=jnp.bfloat16, cell="pallas")[0])
    dt_l = timeit(fwd, lstm_params, x)
    lvg = jax.jit(lambda lp, xx: (
        lambda v, g: v + 0.0 * g[0]["wh"][0, 0])(*jax.value_and_grad(
            lambda l2: jnp.sum(lstm_mod.lstm_forward(
                l2, xx, mask=xmask, compute_dtype=jnp.bfloat16,
                cell="pallas")[0]))(lp)))
    dt_lvg = timeit(lvg, lstm_params, x)
    print(f"lstm2 fwd [{bk},{cfg.max_len}]:   {dt_l*1e3:8.3f} ms;  "
          f"fwd+bwd: {dt_lvg*1e3:8.3f} ms", flush=True)

    print("\nderived:", flush=True)
    print(f"  bwd+opt overhead (full - fwd - sample): "
          f"{(dt_full - dt_fwd - dt)*1e3:.3f} ms", flush=True)
    print(f"  2x lstm pair (sup fwd+bwd + qry fwd+bwd) estimate: "
          f"{2*dt_lvg*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
