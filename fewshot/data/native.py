"""ctypes bindings for the native offline-data library (native/fastdata.cpp).

Pure-Python implementations in fewshot.data.lyrics / fewshot.data.midi are
the reference semantics; these bindings are drop-in accelerations for the
corpus cold start (the reference's first-run hot spot, SURVEY.md §4.4) and
are verified byte-for-byte against the Python paths in tests/test_native.py.

If the .so is missing (scripts/build_native.sh not run), `LIB` is None and
callers fall back silently.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_REPO = Path(__file__).resolve().parent.parent.parent
_SO = _REPO / "native" / "libfastdata.so"

if not _SO.exists():
    # one-shot best-effort build (g++ is in the image); fall back silently
    import subprocess
    try:
        subprocess.run(["sh", str(_REPO / "scripts" / "build_native.sh")],
                       capture_output=True, timeout=120, check=False)
    except (OSError, subprocess.TimeoutExpired):
        pass

LIB = None
if _SO.exists():
    LIB = ctypes.CDLL(str(_SO))
    LIB.fd_tokenize.restype = ctypes.c_int
    LIB.fd_tokenize.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32]
    LIB.fd_parse_smf.restype = ctypes.c_int
    LIB.fd_parse_smf.argtypes = [
        ctypes.c_char_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32]


if LIB is not None:
    LIB.fd_count_corpus.restype = ctypes.c_int
    LIB.fd_count_corpus.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32]
    LIB.fd_encode_corpus.restype = ctypes.c_int
    LIB.fd_encode_corpus.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]


def available() -> bool:
    return LIB is not None


def _i32(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _rows_blob(rows):
    """Normalized UTF-8 blob + [start, end) byte offsets per row."""
    texts = [_normalize(t).encode("utf-8") for _, _, t in rows]
    blob = b"".join(texts)
    row_starts = np.zeros(len(rows), np.int32)
    row_ends = np.zeros(len(rows), np.int32)
    pos = 0
    for i, t in enumerate(texts):
        row_starts[i] = pos
        pos += len(t)
        row_ends[i] = pos
    return blob, row_starts, row_ends


def count_corpus(rows):
    """Pass 1 alone: token Counter over rows (streaming builder's vocab
    pass merges these per chunk).  Returns None on (theoretically
    impossible) capacity overflow so callers can fall back."""
    from collections import Counter

    blob, row_starts, row_ends = _rows_blob(rows)
    n = len(blob)
    lowered = ctypes.create_string_buffer(max(1, n))
    cap_unique = max(1024, n // 2 + 16)
    tok_buf = ctypes.create_string_buffer(max(1, n + 16))
    for cap in (cap_unique, n + 16):
        tok_offsets = np.zeros(cap + 1, np.int32)
        counts = np.zeros(cap, np.int64)
        n_unique = LIB.fd_count_corpus(
            blob, n, lowered, _i32(row_starts), _i32(row_ends), len(rows),
            tok_buf, n + 16, _i32(tok_offsets),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cap)
        if n_unique >= 0:
            raw = tok_buf.raw
            return Counter({
                raw[tok_offsets[i]:tok_offsets[i + 1]].decode(
                    "utf-8", errors="replace"): int(counts[i])
                for i in range(n_unique)})
    return None  # pragma: no cover - n+16 bounds the capacity


def encode_corpus(rows, vocab):
    """Pass 2 alone: encode rows against a FIXED vocab.  Ids come back as
    int32 numpy views (no Python int lists — the streaming builder keeps
    ~4 bytes/token resident instead of ~28)."""
    from fewshot.data.vocab import UNK

    blob, row_starts, row_ends = _rows_blob(rows)
    n = len(blob)
    lowered = ctypes.create_string_buffer(max(1, n))
    vtoks = [t.encode("utf-8") for t in vocab.tokens]
    vocab_buf = b"".join(vtoks)
    vocab_offsets = np.zeros(len(vtoks) + 1, np.int32)
    p = 0
    for i, t in enumerate(vtoks):
        vocab_offsets[i] = p
        p += len(t)
    vocab_offsets[len(vtoks)] = p
    total_cap = n + 16        # every token is >= 1 byte
    out_ids = np.zeros(total_cap, np.int32)
    row_counts = np.zeros(len(rows), np.int32)
    total = LIB.fd_encode_corpus(
        blob, n, lowered, _i32(row_starts), _i32(row_ends), len(rows),
        vocab_buf, _i32(vocab_offsets), len(vtoks), UNK, _i32(out_ids),
        total_cap, _i32(row_counts))
    if total < 0:  # pragma: no cover - n+16 bounds the capacity
        raise RuntimeError("fd_encode_corpus: capacity exceeded")

    items = []
    pos = 0
    for (artist, song, _), cnt in zip(rows, row_counts):
        items.append((artist, song, out_ids[pos:pos + cnt]))
        pos += cnt
    return items


def tokenize_corpus(rows, vocab_size: int):
    """Fully-native corpus pass: count -> vocab -> encode to int ids.

    Matches fewshot.data.lyrics.tokenize_corpus exactly (same tokens, same
    top-N tie-breaking) but Python never materializes per-token strings —
    only the unique-token table crosses the boundary once.
    """
    from fewshot.data.vocab import Vocab

    counter = count_corpus(rows)
    if counter is None:  # pragma: no cover
        from fewshot.data import lyrics
        return lyrics.tokenize_corpus(rows, vocab_size, native=False)
    vocab = Vocab.build(counter, vocab_size)
    items = [(a, s, ids.tolist())
             for a, s, ids in encode_corpus(rows, vocab)]
    return vocab, items


import re

_WS = re.compile(r"\s")


def _normalize(text: str) -> str:
    r"""Unicode-fold BEFORE crossing into C: Python str.lower() handles
    non-ASCII case (the C side only folds ASCII), and Python \s includes
    Unicode whitespace like U+00A0 (the C side only knows ASCII spaces).
    Byte-exact parity with the pure-Python path requires doing both here."""
    return _WS.sub(" ", text.lower())


def tokenize_line(text: str) -> list[str]:
    """Native fewshot.data.lyrics.tokenize_line (byte-exact)."""
    raw = _normalize(text).encode("utf-8")
    n = len(raw)
    cap = max(16, n + 1)
    lowered = ctypes.create_string_buffer(cap)
    starts = (ctypes.c_int32 * cap)()
    ends = (ctypes.c_int32 * cap)()
    count = LIB.fd_tokenize(raw, n, lowered, starts, ends, cap)
    if count < 0:  # pragma: no cover - cap == len guards this
        raise RuntimeError("fd_tokenize: token buffer overflow")
    low = lowered.raw[:n]
    return [low[starts[i]:ends[i]].decode("utf-8", errors="replace")
            for i in range(count)]


def parse_midi(path) -> list:
    """Native fewshot.data.midi.parse_midi (same Note list)."""
    from fewshot.data.midi import Note
    data = Path(path).read_bytes()
    cap = max(64, len(data))        # a note needs >= 6 bytes of events
    starts = np.zeros(cap, np.float64)
    ends = np.zeros(cap, np.float64)
    pitches = np.zeros(cap, np.int32)
    vels = np.zeros(cap, np.int32)
    n = LIB.fd_parse_smf(
        data, len(data),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ends.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        pitches.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
    if n == -3:
        raise ValueError(f"{path}: SMPTE time division unsupported")
    if n < 0:
        raise ValueError(f"{path}: malformed SMF (code {n})")
    return [Note(float(starts[i]), float(ends[i]), int(pitches[i]),
                 int(vels[i])) for i in range(n)]
