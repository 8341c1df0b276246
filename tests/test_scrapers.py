"""L0 acquisition scripts, offline paths (SURVEY.md §2 L0).

Live fetching is network-gated (this sandbox has no egress); the tested
contract is the assembly half: local trees -> the exact artifacts the
L1 tokenizers consume (lyrics CSV; per-artist .mid tree), proven by
feeding the output straight into the corpus builders.
"""

import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


def test_lyrics_assemble_from_dir(tmp_path):
    from scrape_lyrics import assemble_from_dir

    root = tmp_path / "raw"
    (root / "The Beatles").mkdir(parents=True)
    (root / "The Beatles" / "Yesterday.txt").write_text(
        "all my troubles\n\nseemed so far away\n")
    (root / "The Beatles" / "Help.txt").write_text("help me if you can\n")
    (root / "Queen?!").mkdir()
    (root / "Queen?!" / "song.txt").write_text("is this real life\n")
    (root / "Abba").mkdir()
    (root / "Abba" / "sos.txt").write_text("so when you are near me\n")

    out = tmp_path / "lyrics.csv"
    n = assemble_from_dir(root, out)
    assert n == 4

    with open(out, newline="", encoding="utf-8") as f:
        rows = list(csv.DictReader(f))
    by_key = {(r["artist"], r["song"]): r["lyrics"] for r in rows}
    # blank lines dropped, lines joined with the reference's " / " form
    assert by_key[("The Beatles", "Yesterday")] == \
        "all my troubles / seemed so far away"
    assert ("Queen?!", "song") in by_key

    # the CSV feeds the L1 builder directly
    from fewshot.data.corpus import build_lyrics_corpus
    corpus = build_lyrics_corpus(out, tmp_path / "packed", vocab_size=64,
                                 max_len=16)
    assert len(corpus.song_len) == 4


def test_midi_organize_from_flat_dir(tmp_path):
    from scrape_midi import organize

    from fewshot.data.midi import parse_midi, write_midi

    src = tmp_path / "flat"
    src.mkdir()
    from fewshot.data.midi import Note
    notes = [Note(0.0, 0.5, 60, 90), Note(0.5, 1.0, 64, 80)]
    write_midi(notes, src / "Miles Davis - So What.mid")
    write_midi(notes, src / "Miles Davis - Blue in Green.mid")
    write_midi(notes, src / "nameless.mid")        # no pattern, no index
    write_midi(notes, src / "indexed.mid")
    write_midi(notes, src / "Bill Evans - Peace Piece.mid")

    index = tmp_path / "index.csv"
    index.write_text("indexed.mid,Herbie Hancock\n")

    out = tmp_path / "tree"
    n = organize(src, out, index)
    assert n == 4                                   # nameless.mid skipped
    assert sorted(p.name for p in out.iterdir()) == \
        ["Bill_Evans", "Herbie_Hancock", "Miles_Davis"]
    davis = sorted(p.name for p in (out / "Miles_Davis").glob("*.mid"))
    assert davis == ["Blue_in_Green.mid", "So_What.mid"]

    # organized tree is parseable and feeds the L1 MIDI builder
    parsed = parse_midi(out / "Miles_Davis" / "So_What.mid")
    assert len(parsed) == 2
    from fewshot.data.corpus import build_midi_corpus
    corpus = build_midi_corpus(out, tmp_path / "packed_midi", max_len=32)
    assert len(corpus.song_len) == 4
