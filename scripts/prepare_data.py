#!/usr/bin/env python
"""Offline data preparation: acquisition (synthetic) + tokenize + pack.

Reference equivalent (SURVEY.md §2 L0 + §4.4): the scrape scripts' artifacts
(lyrics CSV, per-artist `.mid` dirs) followed by the first Loader run's
tokenize/vocab/cache pass.  There is no network in this environment
(SURVEY.md §9), so `--synthetic` generates a deterministic corpus with real
per-artist styles; `--lyrics_csv` / `--midi_root` pack user-provided data of
the same shape the reference scrapers produced.

Examples:
    python scripts/prepare_data.py --synthetic --dataset lyrics \
        --out data/lyrics --artists 24 --songs 16
    python scripts/prepare_data.py --synthetic --dataset midi --out data/midi
    python scripts/prepare_data.py --lyrics_csv my.csv --out data/lyrics
    python scripts/prepare_data.py --midi_root my_mids/ --out data/midi
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fewshot.data.corpus import build_lyrics_corpus, build_midi_corpus
from fewshot.data.synthetic import generate_lyrics_csv, generate_midi_corpus


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True, help="packed corpus output dir")
    p.add_argument("--dataset", default="lyrics", choices=("lyrics", "midi"))
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--lyrics_csv", type=str, default=None)
    p.add_argument("--midi_root", type=str, default=None)
    p.add_argument("--artists", type=int, default=24)
    p.add_argument("--songs", type=int, default=16)
    p.add_argument("--vocab_size", type=int, default=5000)
    p.add_argument("--max_len", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bpe_merges", type=int, default=0,
                   help="learn N byte-pair merges at pack time (shortens "
                        "sequences; see fewshot/data/bpe.py)")
    args = p.parse_args(argv)

    if args.lyrics_csv:
        corpus = build_lyrics_corpus(args.lyrics_csv, args.out,
                                     args.vocab_size, args.max_len, args.seed,
                                     args.bpe_merges)
    elif args.midi_root:
        corpus = build_midi_corpus(args.midi_root, args.out, args.max_len,
                                   args.seed, args.bpe_merges)
    elif args.synthetic and args.dataset == "lyrics":
        with tempfile.TemporaryDirectory() as tmp:
            csv_path = Path(tmp) / "lyrics.csv"
            generate_lyrics_csv(csv_path, args.artists, args.songs, args.seed)
            corpus = build_lyrics_corpus(csv_path, args.out, args.vocab_size,
                                         args.max_len, args.seed,
                                         args.bpe_merges)
    elif args.synthetic and args.dataset == "midi":
        with tempfile.TemporaryDirectory() as tmp:
            generate_midi_corpus(tmp, args.artists, args.songs, args.seed)
            corpus = build_midi_corpus(tmp, args.out, args.max_len, args.seed,
                                       args.bpe_merges)
    else:
        sys.exit("need --synthetic, --lyrics_csv, or --midi_root")

    print(f"packed {corpus.songs.shape[0]} songs / "
          f"{corpus.num_artists} artists -> {args.out} "
          f"(vocab={len(corpus.vocab)}, max_len={corpus.max_len}, "
          f"splits={ {k: len(v) for k, v in corpus.splits.items()} })")


if __name__ == "__main__":
    main()
