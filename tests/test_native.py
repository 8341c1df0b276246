"""Native fastdata library vs the pure-Python reference implementations.

Builds native/libfastdata.so on the fly (g++ is baked into the image); the
whole module skips if a compiler is unavailable.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def native():
    so = REPO / "native" / "libfastdata.so"
    if not so.exists():
        try:
            subprocess.run(["sh", str(REPO / "scripts" / "build_native.sh")],
                           check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError) as e:
            pytest.skip(f"cannot build native lib: {e}")
    import importlib
    import fewshot.data.native as native_mod
    importlib.reload(native_mod)
    if not native_mod.available():
        pytest.skip("native lib not loadable")
    return native_mod


TEXTS = [
    "Don't stop! 99 red balloons",
    "  multiple   spaces\tand\nnewlines ",
    "UPPER lower MiXeD",
    "hyphen-ated and semi;colons, quotes 'round words'",
    "",
    "unicode café — naïve…",
    "a'b'c can't won't 'tis o'clock'",
    "!!!???...",
]


def test_tokenizer_matches_python(native):
    from fewshot.data.lyrics import tokenize_line
    for text in TEXTS:
        assert native.tokenize_line(text) == tokenize_line(text), text


def test_tokenizer_matches_on_synthetic_corpus(native, tmp_path):
    from fewshot.data.lyrics import read_lyrics_csv, tokenize_line
    from fewshot.data.synthetic import generate_lyrics_csv
    generate_lyrics_csv(tmp_path / "l.csv", num_artists=4,
                        songs_per_artist=4, seed=0)
    for _, _, text in read_lyrics_csv(tmp_path / "l.csv"):
        assert native.tokenize_line(text) == tokenize_line(text)


def test_smf_parser_matches_python(native, tmp_path):
    from fewshot.data import midi as M
    from fewshot.data.synthetic import generate_midi_corpus
    generate_midi_corpus(tmp_path, num_artists=3, songs_per_artist=3, seed=1)
    n_files = 0
    for mid in sorted(tmp_path.rglob("*.mid")):
        want = M.parse_midi(mid)
        got = native.parse_midi(mid)
        assert len(got) == len(want), mid
        for a, b in zip(got, want):
            assert a.pitch == b.pitch and a.velocity == b.velocity
            assert abs(a.start - b.start) < 1e-9
            assert abs(a.end - b.end) < 1e-9
        n_files += 1
    assert n_files == 9


def test_smf_parser_tempo_change(native, tmp_path):
    """Tempo meta events mid-stream must produce the same tempo map."""
    import struct
    from fewshot.data import midi as M
    # hand-build: note on, tempo change, note off
    body = bytearray()
    body += M._varlen(0) + bytes([0x90, 60, 90])
    body += M._varlen(240) + bytes([0xFF, 0x51, 0x03]) + \
        (250000).to_bytes(3, "big")
    body += M._varlen(240) + bytes([0x80, 60, 0])
    body += M._varlen(0) + bytes([0xFF, 0x2F, 0x00])
    data = b"MThd" + struct.pack(">IHHH", 6, 0, 1, 480) + \
        b"MTrk" + struct.pack(">I", len(body)) + bytes(body)
    p = tmp_path / "tempo.mid"
    p.write_bytes(data)
    want = M.parse_midi(p)
    got = native.parse_midi(p)
    assert len(want) == len(got) == 1
    assert abs(got[0].end - want[0].end) < 1e-9


def test_smf_parser_multichannel_parity(native, tmp_path):
    """(channel, pitch)-keyed note pairing must match between C++ and Python."""
    import struct
    from fewshot.data import midi as M
    body = bytearray()
    body += M._varlen(0) + bytes([0x90, 60, 100])
    body += M._varlen(240) + bytes([0x91, 60, 80])
    body += M._varlen(240) + bytes([0x81, 60, 0])
    body += M._varlen(480) + bytes([0x80, 60, 0])
    body += M._varlen(0) + bytes([0xFF, 0x2F, 0x00])
    data = b"MThd" + struct.pack(">IHHH", 6, 0, 1, 480) + \
        b"MTrk" + struct.pack(">I", len(body)) + bytes(body)
    p = tmp_path / "mc.mid"
    p.write_bytes(data)
    want = M.parse_midi(p)
    got = native.parse_midi(p)
    assert len(want) == len(got) == 2
    for a, b in zip(got, want):
        assert a.pitch == b.pitch and a.velocity == b.velocity
        assert abs(a.start - b.start) < 1e-9
        assert abs(a.end - b.end) < 1e-9


def test_smf_parser_rejects_garbage(native, tmp_path):
    p = tmp_path / "bad.mid"
    p.write_bytes(b"not a midi file at all")
    with pytest.raises(ValueError):
        native.parse_midi(p)


def test_corpus_pass_matches_python(native, tmp_path):
    """Fully-native count+encode == the pure-Python tokenize_corpus."""
    import fewshot.data.lyrics as L
    from fewshot.data.synthetic import generate_lyrics_csv
    generate_lyrics_csv(tmp_path / "l.csv", num_artists=5,
                        songs_per_artist=4, seed=2)
    rows = L.read_lyrics_csv(tmp_path / "l.csv")
    rows.append(("odd", "unicode", "café — naïve… can't STOP!"))

    # pure python (bypass the native dispatch in tokenize_corpus)
    tokenized = [(a, s, L.tokenize_line(t)) for a, s, t in rows]
    from collections import Counter
    from fewshot.data.vocab import Vocab
    counter = Counter()
    for _, _, toks in tokenized:
        counter.update(toks)
    vocab_py = Vocab.build(counter, 80)
    items_py = [(a, s, vocab_py.encode(t)) for a, s, t in tokenized]

    vocab_nat, items_nat = native.tokenize_corpus(rows, 80)
    assert vocab_nat.tokens == vocab_py.tokens
    assert len(items_nat) == len(items_py)
    for (a1, s1, ids1), (a2, s2, ids2) in zip(items_nat, items_py):
        assert (a1, s1) == (a2, s2)
        assert ids1 == ids2


def test_unicode_case_and_whitespace_parity(native):
    """Non-ASCII uppercase + exotic whitespace must match the Python path."""
    from fewshot.data.lyrics import tokenize_line
    texts = ["CAFÉ Déjà VU", "non breaking space", "İstanbul Ärger ß",
             "mixed em space and\ttabs"]
    for t in texts:
        assert native.tokenize_line(t) == tokenize_line(t), t
    rows = [("a", "s", t) for t in texts]
    v_nat, items_nat = native.tokenize_corpus(rows, 64)
    import fewshot.data.lyrics as L
    from collections import Counter
    from fewshot.data.vocab import Vocab
    toks = [L.tokenize_line(t) for t in texts]
    c = Counter()
    for tk in toks:
        c.update(tk)
    v_py = Vocab.build(c, 64)
    assert v_nat.tokens == v_py.tokens
    for (_, _, ids), tk in zip(items_nat, toks):
        assert ids == v_py.encode(tk)
