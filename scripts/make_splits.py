#!/usr/bin/env python
"""Regenerate artist-level train/val/test splits for a packed corpus.

Reference equivalent (SURVEY.md §2 "Split generator"): the script that
partitions artists into train/val/test lists.  Splits are stored inside
corpus.npz; this re-partitions in place with a new seed/fractions and also
writes human-readable per-split artist CSVs next to the corpus.
"""

from __future__ import annotations

import argparse
import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fewshot.data.corpus import PackedCorpus, make_splits


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True, help="packed corpus dir")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--train_frac", type=float, default=0.8)
    p.add_argument("--val_frac", type=float, default=0.1)
    args = p.parse_args(argv)

    corpus = PackedCorpus.load(args.corpus)
    fracs = {"train": args.train_frac, "val": args.val_frac,
             "test": max(0.0, 1.0 - args.train_frac - args.val_frac)}
    corpus.splits = make_splits(corpus.num_artists, args.seed, fracs)
    corpus.save(args.corpus)

    for name, ids in corpus.splits.items():
        path = Path(args.corpus) / f"split_{name}.csv"
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            for a in ids:
                label = (corpus.artist_names[int(a)]
                         if corpus.artist_names else str(int(a)))
                w.writerow([int(a), label])
        print(f"{name}: {len(ids)} artists -> {path}")


if __name__ == "__main__":
    main()
