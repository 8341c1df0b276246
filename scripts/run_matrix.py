#!/usr/bin/env python
"""Run the reference's experiment matrix end-to-end and record results.

The five configs pinned by the north star (BASELINE.json:7-11):
  1. plain word-LSTM LM on lyrics (single split)
  2. 5-shot episodic lyrics LSTM (support-conditioned)
  3. MIDI event-token LSTM, 5-shot episodes
  4. transformer-decoder on MIDI episodes
  5. full meta-training + on-device top-k sampling, episode-sharded

Each run: train `--steps`, evaluate test NLL/token, compare against the
episodic unigram floor, and (config 5) generate samples.  Writes RESULTS.md.

Synthetic corpora are built on demand (data/matrix_{lyrics,midi}).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def ensure(dataset: str, out: Path):
    from fewshot.data.corpus import (PackedCorpus, build_lyrics_corpus,
                                     build_midi_corpus)
    from fewshot.data.synthetic import (generate_lyrics_csv,
                                        generate_midi_corpus)
    import tempfile
    if (out / "corpus.npz").exists():
        return PackedCorpus.load(out)
    with tempfile.TemporaryDirectory() as tmp:
        # Meta-generalization needs artist DIVERSITY: with two dozen
        # artists an LSTM memorizes the train split and test NLL blows past
        # the unigram floor.  ~100 artists fixes it (styles recur across
        # splits by construction, so held-out artists are learnable).
        if dataset == "lyrics":
            csv = Path(tmp) / "l.csv"
            generate_lyrics_csv(csv, num_artists=96, songs_per_artist=24,
                                seed=0)
            return build_lyrics_corpus(csv, out, vocab_size=5000,
                                       max_len=0, seed=0)   # tight packing
        generate_midi_corpus(tmp, num_artists=96, songs_per_artist=24,
                             seed=0)
        return build_midi_corpus(tmp, out, max_len=0, seed=0)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--out", default="RESULTS.md")
    p.add_argument("--only", type=str, default=None,
                   help="substring filter: run only matching configs and "
                        "print their rows (no RESULTS.md rewrite)")
    args = p.parse_args(argv)

    import jax
    from fewshot.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from fewshot import training
    from fewshot.config import Config
    from fewshot.data import episodes as eps
    from fewshot.models.unigram import evaluate_unigram

    lyrics = ensure("lyrics", REPO / "data" / "matrix_lyrics")
    midi = ensure("midi", REPO / "data" / "matrix_midi")

    base = dict(vocab_size=5000, max_len=256,   # max_len overridden below
                embed_dim=256, hidden_dim=512,
                num_layers=2, batch_size=32, support_size=5, query_size=5,
                lr=2e-3, cell="pallas", compute_dtype="bfloat16",
                support_mode="mean_state", max_steps=args.steps,
                dropout=0.1, data_parallel=True, eval_episodes=128)

    matrix = [
        ("1. plain word-LSTM LM, lyrics", lyrics,
         Config(**{**base, "task": "lm", "support_mode": "none"})),
        ("2. 5-shot episodic lyrics LSTM", lyrics,
         Config(**base)),
        ("3. 5-shot episodic MIDI LSTM", midi,
         Config(**{**base, "dataset": "midi", "vocab_size": 204})),
        # smaller meta-batch: the prefix-attention score tensors are the
        # HBM hog ([B,Q,h,L,P+L] fp32 per layer through the backward)
        ("4. transformer decoder, MIDI episodes", midi,
         Config(**{**base, "dataset": "midi", "vocab_size": 204,
                   "model": "transformer", "num_layers": 2,
                   "batch_size": 16, "cell": "scan", "lr": 1e-3})),
        ("5. meta-train + on-device top-k sampling (episode-sharded)",
         lyrics, Config(**base)),
        # fine-tune variant (SURVEY.md: LSTM baseline + fine-tune): per-
        # episode inner SGD, vmapped; FOMAML.  Smaller batch: B parameter
        # copies adapt in parallel.
        ("6. fine-tune episodic lyrics (inner SGD, FOMAML)", lyrics,
         Config(**{**base, "support_mode": "finetune", "batch_size": 16,
                   "inner_steps": 2, "inner_lr": 0.05, "cell": "scan"})),
    ]
    if args.only:
        matrix = [m for m in matrix if args.only in m[0]]

    rows = []
    for name, corpus, cfg in matrix:
        import dataclasses
        cfg = dataclasses.replace(cfg, max_len=corpus.max_len)
        data = eps.put_corpus(corpus)
        def split_arg(split):
            return (jnp.asarray(corpus.splits[split])
                    if cfg.task == "episodic"
                    else jnp.asarray(eps.split_song_pool(corpus, split)))
        train_split = split_arg("train")
        val_split = split_arg("val")
        test_split = split_arg("test")
        state = training.init_train_state(cfg, len(corpus.vocab))
        step = training.make_train_step(cfg, data, train_split)
        val_step = training.make_eval_step(cfg, data, val_split)

        # Val-based model selection: small models on small corpora overfit
        # held-out artists fast; report test NLL at the best-val snapshot
        # (standard early-stopping methodology).
        best_val, best_params, best_step = float("inf"), state.params, 0
        eval_every = max(50, cfg.max_steps // 15)
        # Warm the compiles OUTSIDE the clock (the remote-compile tunnel
        # takes minutes for the transformer's fused kernels; r1's numbers
        # silently amortized that into eps/s).  A throwaway state keeps the
        # timed run's optimizer trajectory starting from step 0.
        warm_state, _m = step(training.init_train_state(
            cfg, len(corpus.vocab), seed=123))
        training.evaluate(cfg, warm_state.params, data, val_split,
                          jax.random.PRNGKey(7), eval_step=val_step)
        jax.block_until_ready(_m["loss"])
        del warm_state, _m
        # Train-ONLY wall clock (the north-star metric): the clock stops
        # around periodic evals (VERDICT r1: report both conventions —
        # total-loop eps/s was what round 1 published).
        train_sec = 0.0
        t_all = time.perf_counter()
        t0 = time.perf_counter()
        for i in range(cfg.max_steps):
            state, m = step(state)
            if (i + 1) % eval_every == 0 or i + 1 == cfg.max_steps:
                jax.block_until_ready(m["loss"])
                train_sec += time.perf_counter() - t0
                v = training.evaluate(cfg, state.params, data, val_split,
                                      jax.random.PRNGKey(7),
                                      eval_step=val_step)
                if v < best_val:
                    best_val, best_step = v, i + 1
                    best_params = jax.tree.map(lambda x: x, state.params)
                t0 = time.perf_counter()
        jax.block_until_ready(m["loss"])
        train_sec += time.perf_counter() - t0
        dt = time.perf_counter() - t_all
        eps_sec = cfg.max_steps * cfg.batch_size / train_sec
        eps_sec_loop = cfg.max_steps * cfg.batch_size / dt
        test_nll = training.evaluate(cfg, best_params, data, test_split,
                                     jax.random.PRNGKey(99))
        state = state._replace(params=best_params)
        uni = (evaluate_unigram(cfg, corpus, data, test_split,
                                jax.random.PRNGKey(99))
               if cfg.task == "episodic" else None)
        extra = ""
        if name.startswith("5."):
            from fewshot import sampling
            ep = eps.sample_episode(jax.random.PRNGKey(1), data, test_split,
                                    8, k=cfg.support_size, q=cfg.query_size)
            toks = sampling.generate(state.params, ep.support,
                                     ep.support_len, jax.random.PRNGKey(2),
                                     cfg, n_tokens=64)
            jax.block_until_ready(toks)
            extra = f"; sampled 8x64 tokens on device"
        uni_s = f" (unigram floor {uni:.3f})" if uni is not None else ""
        row = (f"| {name} | {float(m['loss']):.3f} | {test_nll:.3f}{uni_s} "
               f"@ step {best_step} | {eps_sec:.0f} ({eps_sec_loop:.0f} "
               f"incl. eval) |{extra}")
        rows.append(row)
        print(row, flush=True)

    hdr = [
        "# RESULTS — experiment matrix (synthetic corpora)",
        "",
        f"Trained {args.steps} steps each on 1x TPU v5 lite, B=32 episodes"
        f" (or songs for config 1), K=Q=5, tight-packed corpora.",
        "",
        "Test NLL reported at the best-val checkpoint (early stopping);",
        "episodes/sec is train-only wall clock (the parenthesized number",
        "also counts periodic eval time).",
        "",
        "| Config | final train NLL | test NLL/token (best-val ckpt) | episodes/sec |",
        "|---|---|---|---|",
    ]
    if args.only:
        print("(--only: rows printed above; RESULTS.md not rewritten)",
              flush=True)
    else:
        Path(args.out).write_text("\n".join(hdr + rows) + "\n")
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
