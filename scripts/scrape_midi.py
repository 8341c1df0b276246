#!/usr/bin/env python
"""MIDI acquisition (L0): build the per-artist `.mid` directory tree.

Reference equivalent (SURVEY.md §2 L0): the freemidi-style scraper that
downloads per-artist MIDI files.  No network egress exists in this sandbox
(SURVEY.md §0), so fetching is gated behind --url-list; --from-dir organizes
an existing flat collection into the per-artist layout the tokenizer expects
(`<root>/<artist>/<song>.mid`), inferring artist from `Artist - Title.mid`
file names or an explicit index CSV.  The live fetch path is tested against
a loopback HTTP fixture server (tests/test_scrapers.py), so only the egress
itself is unexercised here.
"""

from __future__ import annotations

import argparse
import csv
import re
import shutil
import sys
from pathlib import Path


def _safe(name: str) -> str:
    return re.sub(r"[^\w.-]+", "_", name).strip("_") or "untitled"


def organize(src: Path, out_root: Path, index: Path | None) -> int:
    mapping: dict[str, str] = {}
    if index:
        with open(index) as f:
            for row in csv.reader(f):
                if len(row) >= 2:
                    mapping[row[0].strip()] = row[1].strip()
    n = 0
    for mid in sorted(src.rglob("*.mid")):
        if mid.name in mapping:
            artist = mapping[mid.name]
            title = mid.stem
        else:
            m = re.match(r"(.+?)\s*-\s*(.+)", mid.stem)
            if not m:
                print(f"skip {mid.name}: no 'Artist - Title' pattern and no "
                      f"index entry", file=sys.stderr)
                continue
            artist, title = m.group(1), m.group(2)
        dest = out_root / _safe(artist)
        dest.mkdir(parents=True, exist_ok=True)
        shutil.copy2(mid, dest / f"{_safe(title)}.mid")
        n += 1
    return n


def fetch(url_list: Path, out_root: Path) -> int:
    """url_list rows: artist,song,url — requires network egress."""
    from urllib.request import urlopen
    n = 0
    with open(url_list) as f:
        for row in csv.reader(f):
            if len(row) != 3:
                continue
            artist, song, url = (c.strip() for c in row)
            dest = out_root / _safe(artist)
            dest.mkdir(parents=True, exist_ok=True)
            try:
                data = urlopen(url, timeout=30).read()
            except OSError as e:
                print(f"skip {url}: {e}", file=sys.stderr)
                continue
            (dest / f"{_safe(song)}.mid").write_bytes(data)
            n += 1
    return n


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True, help="per-artist output root")
    p.add_argument("--index", type=Path, default=None,
                   help="CSV filename,artist mapping for --from-dir")
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--from-dir", type=Path,
                   help="organize an existing flat .mid collection")
    g.add_argument("--url-list", type=Path,
                   help="CSV of artist,song,url rows (needs network)")
    args = p.parse_args(argv)
    if args.from_dir:
        n = organize(args.from_dir, Path(args.out), args.index)
    else:
        n = fetch(args.url_list, Path(args.out))
    print(f"placed {n} midi files under {args.out}")


if __name__ == "__main__":
    main()
