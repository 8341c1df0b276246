"""Data tier unit tests: vocab, lyrics tokenizer, MIDI parser/writer,
packed corpus (SURVEY.md §5.2)."""

from collections import Counter

import numpy as np
import pytest

from fewshot.data import midi as M
from fewshot.data.corpus import (PackedCorpus, build_lyrics_corpus,
                                 build_midi_corpus, make_splits)
from fewshot.data.lyrics import detokenize, read_lyrics_csv, tokenize_line
from fewshot.data.synthetic import generate_lyrics_csv, generate_midi_corpus
from fewshot.data.vocab import BOS, EOS, PAD, UNK, Vocab


# -- vocab -------------------------------------------------------------------

def test_vocab_build_topn():
    c = Counter({"a": 5, "b": 3, "c": 3, "d": 1})
    v = Vocab.build(c, max_size=6)   # 4 specials + 2 words
    assert len(v) == 6
    assert v.tokens[4:] == ["a", "b"]          # count desc, alpha tiebreak
    assert v.encode(["a", "zzz"]) == [4, UNK]


def test_vocab_roundtrip(tmp_path):
    v = Vocab.build(Counter({"x": 1}), 5)
    v.save(tmp_path / "v.json")
    v2 = Vocab.load(tmp_path / "v.json")
    assert v2.tokens == v.tokens
    assert v2.content_hash() == v.content_hash()


# -- lyrics ------------------------------------------------------------------

def test_tokenize_line():
    assert tokenize_line("Don't stop! 99 red") == \
        ["don't", "stop", "!", "99", "red"]


def test_csv_roundtrip(tmp_path):
    generate_lyrics_csv(tmp_path / "l.csv", num_artists=3,
                        songs_per_artist=2, seed=1)
    rows = read_lyrics_csv(tmp_path / "l.csv")
    assert len(rows) == 6
    assert all(len(r) == 3 for r in rows)
    # deterministic across calls
    generate_lyrics_csv(tmp_path / "l2.csv", num_artists=3,
                        songs_per_artist=2, seed=1)
    assert (tmp_path / "l.csv").read_text() == (tmp_path / "l2.csv").read_text()


def test_detokenize():
    assert detokenize(["hello", ",", "world", "!"]) == "hello, world!"


# -- midi --------------------------------------------------------------------

def test_midi_write_parse_roundtrip(tmp_path):
    notes = [M.Note(0.0, 0.5, 60, 80), M.Note(0.5, 1.0, 64, 90),
             M.Note(0.5, 1.5, 67, 70)]
    M.write_midi(notes, tmp_path / "t.mid")
    parsed = M.parse_midi(tmp_path / "t.mid")
    assert len(parsed) == 3
    for orig, got in zip(sorted(notes, key=lambda n: (n.start, n.pitch)),
                         parsed):
        assert got.pitch == orig.pitch
        assert abs(got.start - orig.start) < 0.01
        assert abs(got.end - orig.end) < 0.01
        assert got.velocity == orig.velocity


def test_multichannel_note_pairing(tmp_path):
    """A note-off on one channel must NOT close a same-pitch note-on from
    another channel (pretty_midi pairs per instrument; advisor finding r1)."""
    import struct
    body = bytearray()
    body += M._varlen(0) + bytes([0x90, 60, 100])    # ch0 on  @ t=0
    body += M._varlen(240) + bytes([0x91, 60, 80])   # ch1 on  @ t=240
    body += M._varlen(240) + bytes([0x81, 60, 0])    # ch1 off @ t=480
    body += M._varlen(480) + bytes([0x80, 60, 0])    # ch0 off @ t=960
    body += M._varlen(0) + bytes([0xFF, 0x2F, 0x00])
    data = b"MThd" + struct.pack(">IHHH", 6, 0, 1, 480) + \
        b"MTrk" + struct.pack(">I", len(body)) + bytes(body)
    p = tmp_path / "mc.mid"
    p.write_bytes(data)
    notes = M.parse_midi(p)
    # 480 ticks @ 120bpm/tpq480 = 0.5s; sorted by (start, pitch)
    assert len(notes) == 2
    assert notes[0].velocity == 100
    assert abs(notes[0].start - 0.0) < 1e-9
    assert abs(notes[0].end - 1.0) < 1e-9      # ch0 note spans the full 960
    assert notes[1].velocity == 80
    assert abs(notes[1].start - 0.25) < 1e-9
    assert abs(notes[1].end - 0.5) < 1e-9      # ch1 note closed by ch1 off


def test_event_roundtrip():
    notes = [M.Note(0.0, 0.25, 60, 80), M.Note(0.5, 1.0, 72, 100)]
    events = M.notes_to_events(notes)
    assert len(events) == 8
    back = M.events_to_notes(events)
    assert [n.pitch for n in back] == [60, 72]
    # times quantized to the grid
    assert abs(back[1].start - 0.5) <= M.TIME_GRID / 2


def test_event_vocab_closed():
    ev = M.full_event_vocab()
    assert len(ev) == 32 + 128 + 32 + 8
    assert len(set(ev)) == len(ev)


def test_events_to_notes_tolerates_garbage():
    events = ["PITCH_60", "SHIFT_0", "PITCH_62", "DUR_3", "VEL_4"]
    assert M.events_to_notes(events) == [
        M.Note(0.0, 4 * M.TIME_GRID, 62, 72)]


# -- packed corpus -----------------------------------------------------------

def test_pack_framing(tiny_corpus):
    c = tiny_corpus
    for i in range(c.songs.shape[0]):
        ln = int(c.song_len[i])
        assert c.songs[i, 0] == BOS
        assert c.songs[i, ln - 1] == EOS
        assert (c.songs[i, ln:] == PAD).all()
        a = int(c.song_artist[i])
        assert i in c.artist_song_ids[a][: int(c.artist_num_songs[a])]


def test_splits_partition(tiny_corpus):
    all_ids = np.concatenate(list(tiny_corpus.splits.values()))
    assert len(np.unique(all_ids)) == len(all_ids)      # disjoint
    assert set(all_ids) <= set(range(tiny_corpus.num_artists))
    assert make_splits(8, seed=0)["train"].tolist() == \
        make_splits(8, seed=0)["train"].tolist()        # deterministic


def test_corpus_save_load(tiny_corpus, tmp_path):
    tiny_corpus.save(tmp_path / "c")
    c2 = PackedCorpus.load(tmp_path / "c")
    np.testing.assert_array_equal(c2.songs, tiny_corpus.songs)
    np.testing.assert_array_equal(c2.artist_song_ids,
                                  tiny_corpus.artist_song_ids)
    assert c2.splits.keys() == tiny_corpus.splits.keys()
    assert c2.vocab.tokens == tiny_corpus.vocab.tokens


def test_build_lyrics_corpus_e2e(tmp_path):
    generate_lyrics_csv(tmp_path / "l.csv", num_artists=4,
                        songs_per_artist=3, seed=0)
    c = build_lyrics_corpus(tmp_path / "l.csv", tmp_path / "out",
                            vocab_size=100, max_len=32)
    assert c.songs.shape == (12, 32)
    assert (tmp_path / "out" / "corpus.npz").exists()


def test_streaming_build_identical(tmp_path):
    """Chunked (streaming) ingestion must produce byte-identical corpus
    arrays + vocab to the in-memory path, across uneven chunk boundaries."""
    from fewshot.data.corpus import build_lyrics_corpus
    from fewshot.data.synthetic import generate_lyrics_csv
    generate_lyrics_csv(tmp_path / "l.csv", num_artists=6,
                        songs_per_artist=5, seed=1)
    ref = build_lyrics_corpus(tmp_path / "l.csv", tmp_path / "ref",
                              vocab_size=128, max_len=0)
    got = build_lyrics_corpus(tmp_path / "l.csv", tmp_path / "stream",
                              vocab_size=128, max_len=0,
                              streaming_chunk_rows=7)   # uneven chunks
    assert got.vocab.tokens == ref.vocab.tokens
    np.testing.assert_array_equal(got.songs, ref.songs)
    np.testing.assert_array_equal(got.song_len, ref.song_len)
    np.testing.assert_array_equal(got.artist_song_ids, ref.artist_song_ids)
    assert got.artist_names == ref.artist_names


def test_build_midi_corpus_e2e(tmp_path):
    generate_midi_corpus(tmp_path / "mid", num_artists=3,
                         songs_per_artist=2, seed=0)
    c = build_midi_corpus(tmp_path / "mid", tmp_path / "out", max_len=64)
    assert c.songs.shape[0] == 6
    assert len(c.vocab) == 4 + 200  # specials + closed event vocab
    # tokens decode back into events of the closed vocab
    ids = c.songs[0][1: int(c.song_len[0]) - 1]
    toks = [c.vocab.tokens[i] for i in ids]
    assert all(t.split("_")[0] in ("SHIFT", "PITCH", "DUR", "VEL")
               for t in toks)
