#!/usr/bin/env python
"""Vocab-scale end-to-end test: prepare -> BPE -> train -> evaluate.

VERDICT r1 #5: everything measured so far ran on ~100-word-vocab toy
corpora; the behavioral contract is a scraped-lyrics-shaped corpus
(vocab ~5000, thousands of songs, millions of tokens — BASELINE.json:2,7).
This script builds one synthetically (2000 artists x 50 songs, ~5.9M words,
vocab cap 5000), pushes it through the full offline tier (native tokenizer,
BPE learn+encode at vocab scale) and both training pipelines on the real
chip, and records wall-clocks + throughput + NLL into
benchmarks/scale_test.json (summarized in BASELINE.md).

Run:  python scripts/scale_test.py [--artists 2000 --songs 50 ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default=str(REPO / "data" / "scale_lyrics"))
    p.add_argument("--out", default=str(REPO / "benchmarks" /
                                        "scale_test.json"))
    p.add_argument("--artists", type=int, default=2000)
    p.add_argument("--songs", type=int, default=50)
    p.add_argument("--extra_vocab", type=int, default=6000)
    p.add_argument("--vocab_size", type=int, default=5000)
    p.add_argument("--bpe_merges", type=int, default=500)
    p.add_argument("--train_steps", type=int, default=300)
    p.add_argument("--host_steps", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from fewshot.data.corpus import PackedCorpus, build_lyrics_corpus
    from fewshot.data.synthetic import generate_lyrics_csv
    from fewshot.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    root = Path(args.root)
    root.mkdir(parents=True, exist_ok=True)
    csv_path = root / "lyrics.csv"
    result: dict = {"artists": args.artists, "songs": args.songs,
                    "vocab_size": args.vocab_size,
                    "bpe_merges": args.bpe_merges}

    # ---- offline tier ----------------------------------------------------
    if not csv_path.exists():
        t0 = time.time()
        generate_lyrics_csv(csv_path, num_artists=args.artists,
                            songs_per_artist=args.songs, seed=args.seed,
                            extra_vocab=args.extra_vocab)
        result["generate_sec"] = round(time.time() - t0, 1)
    result["csv_mb"] = round(csv_path.stat().st_size / 2**20, 1)

    t0 = time.time()
    plain = build_lyrics_corpus(csv_path, root / "plain",
                                vocab_size=args.vocab_size, max_len=0,
                                seed=args.seed)
    result["pack_plain_sec"] = round(time.time() - t0, 1)
    result["n_songs"] = int(plain.songs.shape[0])
    result["total_tokens"] = int(plain.song_len.sum())
    result["max_len_plain"] = plain.max_len

    t0 = time.time()
    bpe_c = build_lyrics_corpus(csv_path, root / "bpe",
                                vocab_size=args.vocab_size, max_len=0,
                                seed=args.seed, bpe_merges=args.bpe_merges)
    result["pack_bpe_sec"] = round(time.time() - t0, 1)
    result["max_len_bpe"] = bpe_c.max_len
    result["bpe_compression"] = round(
        float(bpe_c.song_len.sum()) / float(plain.song_len.sum()), 3)
    print(json.dumps(result), flush=True)

    # ---- training tier (real chip) ----------------------------------------
    import jax
    import jax.numpy as jnp
    from fewshot import training
    from fewshot.config import Config
    from fewshot.data import episodes as eps

    for tag, corpus_dir in (("plain", root / "plain"), ("bpe", root / "bpe")):
        corpus = PackedCorpus.load(corpus_dir)
        cfg = Config(vocab_size=len(corpus.vocab), max_len=corpus.max_len,
                     embed_dim=256, hidden_dim=512, num_layers=2,
                     batch_size=32, support_size=5, query_size=5, lr=1e-3,
                     support_mode="mean_state", cell="pallas",
                     compute_dtype="bfloat16", eval_episodes=64,
                     data_parallel=False)
        data = eps.put_corpus(corpus)
        train_split = jnp.asarray(corpus.splits["train"])
        val_split = jnp.asarray(corpus.splits["val"])
        step = training.make_train_step(cfg, data, train_split)
        state = training.init_train_state(cfg, len(corpus.vocab))
        state, m = step(state)
        jax.block_until_ready(m["loss"])           # compile outside clock
        t0 = time.perf_counter()
        for _ in range(args.train_steps):
            state, m = step(state)
        jax.block_until_ready(m["loss"])
        dt = time.perf_counter() - t0
        nll = training.evaluate(cfg, state.params, data, val_split,
                                jax.random.PRNGKey(7))
        result[f"train_{tag}"] = {
            "episodes_per_sec": round(args.train_steps * cfg.batch_size / dt,
                                      1),
            "steps": args.train_steps + 1,
            "val_nll": round(float(nll), 4),
            "max_len": corpus.max_len,
            "vocab": len(corpus.vocab),
        }
        print(json.dumps({tag: result[f"train_{tag}"]}), flush=True)

    # ---- host pipeline at scale -------------------------------------------
    from fewshot.data.host_pipeline import HostEpisodePipeline
    corpus = PackedCorpus.load(root / "plain")
    cfg = Config(vocab_size=len(corpus.vocab), max_len=corpus.max_len,
                 embed_dim=256, hidden_dim=512, num_layers=2,
                 batch_size=32, support_size=5, query_size=5, lr=1e-3,
                 support_mode="mean_state", cell="pallas",
                 compute_dtype="bfloat16", pipeline="host",
                 data_parallel=False)
    pipe = HostEpisodePipeline(corpus, "train", cfg.batch_size,
                               cfg.support_size, cfg.query_size,
                               seed=args.seed)
    fed = training.make_fed_train_step(cfg)
    state = training.init_train_state(cfg, len(corpus.vocab))
    state, m = fed(state, next(pipe))
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(args.host_steps):
        state, m = fed(state, next(pipe))
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    pipe.close()
    result["train_host_pipeline"] = {
        "episodes_per_sec": round(args.host_steps * cfg.batch_size / dt, 1),
        "steps": args.host_steps + 1,
    }

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
