#!/usr/bin/env python
"""attn_state decision, round 2 of 2 (r2 verdict #10).

Round-1/2 studies showed attn_state ~tying mean_state on HOMOGENEOUS
support sets (every song equally informative — uniform pooling is already
optimal there).  This experiment builds the regime learned pooling exists
for: every artist's song set is half SHORT STYLE-FREE FILLER (one global
word distribution, no signature words — synthetic.generate_lyrics_csv
generic_frac=0.5), so a K=5 support set mixes informative and
uninformative songs and uniform averaging dilutes the artist signal.

Decision rule (set in the r1 verdict): keep attn_state only if it beats
mean_state somewhere; after this round, a tie or loss in its own
designed-for regime deletes the mode.  Writes
benchmarks/attn_state_round2.json.

Run on the real chip:  python scripts/attn_state_round2.py
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
    p.add_argument("--root", default=str(REPO / "data" / "hetero_lyrics"))
    p.add_argument("--out", default=str(REPO / "benchmarks" /
                                        "attn_state_round2.json"))
    p.add_argument("--artists", type=int, default=48)
    p.add_argument("--songs", type=int, default=20)
    p.add_argument("--generic_frac", type=float, default=0.5)
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--seeds", type=int, default=2,
                   help="train seeds per mode (tie-break noise)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from fewshot import training
    from fewshot.config import Config
    from fewshot.data import episodes as eps
    from fewshot.data.corpus import PackedCorpus, build_lyrics_corpus
    from fewshot.data.synthetic import generate_lyrics_csv
    from fewshot.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    root = Path(args.root)
    if not (root / "corpus" / "corpus.npz").exists():
        root.mkdir(parents=True, exist_ok=True)
        generate_lyrics_csv(root / "l.csv", num_artists=args.artists,
                            songs_per_artist=args.songs, seed=0,
                            generic_frac=args.generic_frac)
        build_lyrics_corpus(root / "l.csv", root / "corpus",
                            vocab_size=512, max_len=0)
    corpus = PackedCorpus.load(root / "corpus")

    result = {"protocol": {
        "corpus": f"{args.artists} artists x {args.songs} songs, "
                  f"generic_frac={args.generic_frac} (short style-free "
                  "filler songs from one global distribution)",
        "why": "heterogeneous support sets are the regime learned "
               "pooling is FOR; homogeneous-corpus studies "
               "(attn_state_study.json) tie by construction",
        "steps": args.steps, "seeds_per_mode": args.seeds,
        "decision_rule": "keep attn_state iff mean test NLL over seeds "
                         "beats mean_state's in this regime",
    }}
    data = eps.put_corpus(corpus)
    tr = jnp.asarray(corpus.splits["train"])
    va = jnp.asarray(corpus.splits["val"])
    te = jnp.asarray(corpus.splits["test"])
    eval_every = max(200, args.steps // 20)

    for mode in ("mean_state", "attn_state"):
        runs = []
        for seed in range(args.seeds):
            cfg = Config(vocab_size=len(corpus.vocab),
                         max_len=corpus.max_len, embed_dim=256,
                         hidden_dim=512, num_layers=2, batch_size=32,
                         support_size=5, query_size=5, lr=2e-3,
                         dropout=0.1, cell="pallas",
                         compute_dtype="bfloat16", support_mode=mode,
                         eval_episodes=256, seed=seed,
                         data_parallel=False)
            step = training.make_train_step(cfg, data, tr)
            val_step = training.make_eval_step(cfg, data, va)
            state = training.init_train_state(cfg, len(corpus.vocab),
                                              seed=seed)
            best_val, best_params, best_step = float("inf"), \
                state.params, 0
            t0 = time.perf_counter()
            for i in range(args.steps):
                state, m = step(state)
                if (i + 1) % eval_every == 0 or i + 1 == args.steps:
                    v = training.evaluate(cfg, state.params, data, va,
                                          jax.random.PRNGKey(7),
                                          eval_step=val_step)
                    if v < best_val:
                        best_val, best_step = v, i + 1
                        best_params = state.params
            jax.block_until_ready(m["loss"])
            test = training.evaluate(cfg, best_params, data, te,
                                     jax.random.PRNGKey(99))
            runs.append({"seed": seed, "best_val": round(float(best_val), 4),
                         "best_step": best_step,
                         "test_nll": round(float(test), 4),
                         "wall_sec": round(time.perf_counter() - t0, 1)})
            print(json.dumps({mode: runs[-1]}), flush=True)
        result[mode] = {"runs": runs,
                        "mean_test_nll": round(
                            sum(r["test_nll"] for r in runs) / len(runs),
                            4)}
        Path(args.out).write_text(json.dumps(result, indent=1))

    delta = (result["mean_state"]["mean_test_nll"]
             - result["attn_state"]["mean_test_nll"])
    result["attn_state_advantage_nll"] = round(delta, 4)
    result["verdict"] = (
        "keep attn_state (wins in its designed-for regime)" if delta > 0.005
        else "delete attn_state (fails to beat mean_state even on "
             "heterogeneous support sets)")
    Path(args.out).write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
