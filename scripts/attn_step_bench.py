#!/usr/bin/env python
"""Config-4 (episodic transformer on MIDI) train-step timing: einsum vs
fused prefix-attention kernels.

The kernel-level micro-bench lives in scripts/tpu_checks.py; this times the
REAL train step (episode gather + full fwd/bwd + Adam) at the config-4
shape, the number ROADMAP.md's perf notes track.  Run on a TPU machine:

    python scripts/attn_step_bench.py [--iters 30] [--big]

--big uses the K=20/L=512 shape that the einsum path cannot compile
(score materialization OOM) — fused only.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def time_step(cfg, corpus, iters: int) -> float:
    import jax
    from fewshot import training
    from fewshot.data import episodes as eps

    data = eps.put_corpus(corpus)
    split = jax.numpy.asarray(corpus.splits["train"])
    state = training.init_train_state(cfg, len(corpus.vocab))
    step = training.make_train_step(cfg, data, split)
    state, _ = step(state)          # compile
    state, _ = step(state)          # re-steady sharding (CLAUDE.md warmup)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state)
    jax.block_until_ready(state.params)
    return (time.perf_counter() - t0) / iters


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--big", action="store_true",
                   help="K=20/L=512 shape (fused only; einsum cannot run)")
    p.add_argument("--corpus", default="data/midi")
    args = p.parse_args(argv)

    from fewshot.config import load_config
    from fewshot.data.corpus import PackedCorpus
    from fewshot.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    corpus = PackedCorpus.load(args.corpus)
    cfg = load_config(data="configs/data/midi.yaml",
                      model="configs/model/transformer.yaml",
                      task="configs/task/episodic.yaml",
                      overrides={"data_parallel": False,
                                 "eval_interval": 10 ** 9})
    if args.big:
        # K=20 needs >= K+Q songs per artist; build a dedicated corpus
        big_dir = Path("data/big_midi")
        if not (big_dir / "corpus.npz").exists():
            import subprocess
            subprocess.run([sys.executable, "scripts/prepare_data.py",
                            "--synthetic", "--dataset", "midi",
                            "--out", str(big_dir), "--artists", "12",
                            "--songs", "32", "--max_len", "512"],
                           check=True)
        corpus = PackedCorpus.load(big_dir)
        cfg = dataclasses.replace(cfg, support_size=20, query_size=5,
                                  batch_size=4, max_len=corpus.max_len,
                                  remat=True)
        dt = time_step(dataclasses.replace(cfg, prefix_flash=True),
                       corpus, args.iters)
        print(f"big-shape fused (K=20, L={corpus.max_len}, P="
              f"{20*corpus.max_len}): {dt*1e3:.2f} ms/step "
              f"({cfg.batch_size/dt:.1f} eps/s)", flush=True)
        return

    for name, flags in [("einsum", {"prefix_flash": False, "flash": False}),
                        ("fused", {"prefix_flash": True, "flash": False})]:
        c = dataclasses.replace(cfg, **flags)
        dt = time_step(c, corpus, args.iters)
        print(f"config-4 {name}: {dt*1e3:.2f} ms/step "
              f"({c.batch_size/dt:.1f} eps/s)", flush=True)


if __name__ == "__main__":
    main()
