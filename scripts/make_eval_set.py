#!/usr/bin/env python
"""Freeze an eval episode set (continuous-eval harness, ROADMAP r1 #5).

Draws N episodes' exact (artist, song) indices from a packed corpus split
and saves them to an npz.  `evaluate.py --eval_set <file>` then scores a
checkpoint on precisely these episodes — the number is reproducible across
runs, batch sizes, pipelines, and future sampler changes, so checkpoint
series stay comparable over the project's lifetime.

    python scripts/make_eval_set.py --corpus data/matrix_lyrics \
        --split test --episodes 512 --k 5 --q 5 --out eval_set.npz
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True)
    p.add_argument("--split", default="test",
                   choices=("train", "val", "test"))
    p.add_argument("--episodes", type=int, default=512)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--q", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    from fewshot.data.corpus import PackedCorpus
    from fewshot.data.episodes import save_episode_set

    corpus = PackedCorpus.load(args.corpus)
    save_episode_set(args.out, corpus, args.split, args.episodes,
                     args.k, args.q, args.seed)
    print(f"wrote {args.episodes} {args.split} episodes "
          f"(K={args.k}, Q={args.q}) to {args.out}")


if __name__ == "__main__":
    main()
