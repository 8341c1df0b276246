"""Offline lyrics tokenizer: (artist, song, lyrics) CSV -> word tokens.

Reference equivalent (SURVEY.md §2 L1 "LyricsLoader"): CSV rows -> regex word
tokens -> int ids with pad/<s>/</s>/unk specials.  This runs ONCE, offline,
feeding the packed corpus (`fewshot.data.corpus`); nothing here is on any hot
path.
"""

from __future__ import annotations

import csv
import re
from collections import Counter
from pathlib import Path

from fewshot.data.vocab import Vocab

# Word-level tokenization: lowercase words (with internal apostrophes) or a
# single punctuation mark per token — the reference's regex-word scheme.
_TOKEN_RE = re.compile(r"[a-z0-9]+(?:'[a-z]+)?|[^\sa-z0-9]")


def tokenize_line(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


def read_lyrics_csv(path: str | Path) -> list[tuple[str, str, str]]:
    """Read (artist, song, lyrics) rows.  Header row optional."""
    rows: list[tuple[str, str, str]] = []
    for chunk in iter_lyrics_csv(path, chunk_rows=0):
        rows.extend(chunk)
    return rows


def iter_lyrics_csv(path: str | Path, chunk_rows: int = 50_000):
    """Stream (artist, song, lyrics) rows in chunks of chunk_rows.

    chunk_rows <= 0 yields everything as one chunk.  The streaming builder
    (corpus.build_lyrics_corpus(streaming_chunk_rows=...)) uses this so
    raw text never has to fit in host RAM all at once."""
    chunk: list[tuple[str, str, str]] = []
    with open(path, newline="", encoding="utf-8") as f:
        reader = csv.reader(f)
        for row in reader:
            if len(row) < 3:
                continue
            artist, song, lyric = row[0], row[1], ",".join(row[2:])
            if (artist.strip().lower(), song.strip().lower()) == \
                    ("artist", "song"):
                continue  # header
            chunk.append((artist.strip(), song.strip(), lyric))
            if chunk_rows > 0 and len(chunk) >= chunk_rows:
                yield chunk
                chunk = []
    if chunk:
        yield chunk


def count_corpus(rows: list[tuple[str, str, str]],
                 native: bool = True) -> Counter:
    """Token counts over rows (one pass; no encoded output).  Used by the
    streaming builder's vocab pass."""
    if native:
        from fewshot.data import native as native_mod
        if native_mod.available():
            c = native_mod.count_corpus(rows)
            if c is not None:
                return c
    counter: Counter = Counter()
    for _, _, text in rows:
        counter.update(tokenize_line(text))
    return counter


def encode_corpus(rows: list[tuple[str, str, str]], vocab: Vocab,
                  native: bool = True) -> list[tuple[str, str, list[int]]]:
    """Encode rows against a FIXED vocab (streaming builder's second pass)."""
    if native:
        from fewshot.data import native as native_mod
        if native_mod.available():
            return native_mod.encode_corpus(rows, vocab)
    return [(a, s, vocab.encode(tokenize_line(t))) for a, s, t in rows]


def tokenize_corpus(
    rows: list[tuple[str, str, str]], vocab_size: int, native: bool = True
) -> tuple[Vocab, list[tuple[str, str, list[int]]]]:
    """Tokenize all songs, build the top-N vocab, encode to int ids.

    Returns (vocab, [(artist, song, ids)]) where ids exclude BOS/EOS —
    the packer adds framing so max_len accounting lives in one place.
    Uses the native tokenizer (fewshot.data.native) when built — byte-exact,
    just faster on large corpora.  `native=False` forces the pure-Python
    reference path (used as the native tier's capacity-overflow fallback).
    """
    if native:
        from fewshot.data import native as native_mod
        if native_mod.available():
            return native_mod.tokenize_corpus(rows, vocab_size)
    tokenized = [(a, s, tokenize_line(t)) for a, s, t in rows]
    counter: Counter = Counter()
    for _, _, toks in tokenized:
        counter.update(toks)
    vocab = Vocab.build(counter, vocab_size)
    return vocab, [(a, s, vocab.encode(t)) for a, s, t in tokenized]


def detokenize(tokens: list[str]) -> str:
    """Best-effort inverse of tokenize_line for human-readable samples."""
    out: list[str] = []
    for t in tokens:
        if out and re.fullmatch(r"[^\w']+", t):
            out[-1] += t
        else:
            out.append(t)
    return " ".join(out)
