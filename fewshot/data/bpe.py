"""Byte-pair encoding over token streams (lyrics words or MIDI events).

Motivated by "Byte Pair Encoding for Symbolic Music" (PAPERS.md): recurrent
and attention models on this workload are bound by SEQUENCE LENGTH (the
recurrence is inherently serial — see docs/DESIGN.md §3), so merging
frequent adjacent pairs into single tokens buys wall-clock almost linearly
in the compression ratio, on top of any modeling gains from multi-event
tokens (e.g. a PITCH+DUR+VEL chord fragment becoming one symbol).

Offline-only: merges are learned once (`learn_bpe`), applied at corpus pack
time (`encode`), and inverted after sampling (`expand`).  The merge table
serializes next to the vocab (bpe.json).  Merged tokens get readable names
("w1+w2"); `expand` recursively restores base ids so MIDI decoding and
detokenization keep working unchanged.  NOTE: per-token NLL under BPE is per
BPE-token — compare like with like.
"""

from __future__ import annotations

import json
from collections import Counter
from pathlib import Path

from fewshot.data.vocab import SPECIALS, Vocab


def learn_bpe(sequences: list[list[int]], vocab: Vocab,
              num_merges: int, min_count: int = 2
              ) -> tuple[Vocab, list[tuple[int, int, int]]]:
    """Learn merges over int sequences; returns (extended vocab, merges).

    merges: ordered [(left_id, right_id, new_id)].  Specials never merge.
    """
    seqs = [list(s) for s in sequences]
    tokens = list(vocab.tokens)
    merges: list[tuple[int, int, int]] = []
    n_special = len(SPECIALS)

    for _ in range(num_merges):
        pairs: Counter = Counter()
        for s in seqs:
            for a, b in zip(s, s[1:]):
                if a >= n_special and b >= n_special:
                    pairs[(a, b)] += 1
        if not pairs:
            break
        (a, b), count = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        if count < min_count:
            break
        new_id = len(tokens)
        tokens.append(f"{tokens[a]}+{tokens[b]}")
        merges.append((a, b, new_id))
        for i, s in enumerate(seqs):
            seqs[i] = _merge_pair(s, a, b, new_id)
    return Vocab(tokens), merges


def _merge_pair(seq: list[int], a: int, b: int, new_id: int) -> list[int]:
    out: list[int] = []
    i = 0
    n = len(seq)
    while i < n:
        if i + 1 < n and seq[i] == a and seq[i + 1] == b:
            out.append(new_id)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def encode(seq: list[int], merges: list[tuple[int, int, int]]) -> list[int]:
    """Apply merges in learned order (standard BPE encode)."""
    s = list(seq)
    for a, b, new_id in merges:
        s = _merge_pair(s, a, b, new_id)
    return s


def expand(seq, merges: list[tuple[int, int, int]]) -> list[int]:
    """Invert merges: recursively restore base token ids."""
    table = {new_id: (a, b) for a, b, new_id in merges}

    def rec(tid: int, out: list[int]) -> None:
        pair = table.get(tid)
        if pair is None:
            out.append(tid)
        else:
            rec(pair[0], out)
            rec(pair[1], out)

    out: list[int] = []
    for t in seq:
        rec(int(t), out)
    return out


def save_merges(merges, path: str | Path) -> None:
    Path(path).write_text(json.dumps(merges))


def load_merges(path: str | Path) -> list[tuple[int, int, int]]:
    return [tuple(m) for m in json.loads(Path(path).read_text())]
