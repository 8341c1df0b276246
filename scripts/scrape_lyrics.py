#!/usr/bin/env python
"""Lyrics acquisition (L0): build the (artist, song, lyrics) CSV.

Reference equivalent (SURVEY.md §2 L0): the scrape scripts that download a
lyrics corpus and emit the CSV the Loader consumes.  This sandbox has ZERO
network egress (SURVEY.md §0), so live scraping is gated: with --url-list the
script fetches and parses pages if the network allows; otherwise use
--from-dir to assemble the CSV from local per-artist text files, or
scripts/prepare_data.py --synthetic for a generated corpus.  Both halves are
tested: the live fetch/parse path against a loopback HTTP fixture server
(tests/test_scrapers.py), so only the egress itself is unexercised here.

Local layout for --from-dir (one file per song):
    <root>/<artist name>/<song name>.txt
"""

from __future__ import annotations

import argparse
import csv
import sys
from pathlib import Path


def assemble_from_dir(root: Path, out_csv: Path) -> int:
    rows = 0
    out_csv.parent.mkdir(parents=True, exist_ok=True)
    with open(out_csv, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["artist", "song", "lyrics"])
        for adir in sorted(p for p in root.iterdir() if p.is_dir()):
            for txt in sorted(adir.glob("*.txt")):
                lyrics = txt.read_text(encoding="utf-8", errors="replace")
                w.writerow([adir.name, txt.stem, " / ".join(
                    line.strip() for line in lyrics.splitlines()
                    if line.strip())])
                rows += 1
    return rows


def scrape_urls(url_list: Path, out_csv: Path) -> int:
    """Fetch (artist, song, url) rows; requires network egress."""
    try:
        from urllib.request import urlopen
    except ImportError:  # pragma: no cover
        sys.exit("urllib unavailable")
    import html.parser

    class TextExtractor(html.parser.HTMLParser):
        def __init__(self):
            super().__init__()
            self.chunks: list[str] = []
            self._skip = 0

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                self._skip += 1

        def handle_endtag(self, tag):
            if tag in ("script", "style") and self._skip:
                self._skip -= 1

        def handle_data(self, data):
            if not self._skip and data.strip():
                self.chunks.append(data.strip())

    rows = 0
    out_csv.parent.mkdir(parents=True, exist_ok=True)
    with open(url_list) as f, \
            open(out_csv, "w", newline="", encoding="utf-8") as out:
        w = csv.writer(out)
        w.writerow(["artist", "song", "lyrics"])
        for line in f:
            parts = [p.strip() for p in line.split(",", 2)]
            if len(parts) != 3:
                continue
            artist, song, url = parts
            try:
                page = urlopen(url, timeout=20).read().decode(
                    "utf-8", errors="replace")
            except OSError as e:
                print(f"skip {url}: {e}", file=sys.stderr)
                continue
            ex = TextExtractor()
            ex.feed(page)
            w.writerow([artist, song, " / ".join(ex.chunks)])
            rows += 1
    return rows


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True, help="output CSV path")
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--from-dir", type=Path,
                   help="assemble from local <artist>/<song>.txt tree")
    g.add_argument("--url-list", type=Path,
                   help="CSV of artist,song,url rows to fetch (needs network)")
    args = p.parse_args(argv)
    if args.from_dir:
        n = assemble_from_dir(args.from_dir, Path(args.out))
    else:
        n = scrape_urls(args.url_list, Path(args.out))
    print(f"wrote {n} songs -> {args.out}")


if __name__ == "__main__":
    main()
