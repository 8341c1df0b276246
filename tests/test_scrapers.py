"""L0 acquisition scripts (SURVEY.md §2 L0) — both halves.

The assembly half is tested on local trees -> the exact artifacts the
L1 tokenizers consume (lyrics CSV; per-artist .mid tree), proven by
feeding the output straight into the corpus builders.  The LIVE half
(urlopen fetch + HTML text extraction / binary download) is tested
against a loopback HTTP fixture server — no egress required — covering
the parse, the per-URL error skip, and the same L1 hand-off.
"""

import csv
import sys
import threading
from contextlib import contextmanager
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


@contextmanager
def _fixture_server(routes):
    """Serve {path: (status, bytes)} on 127.0.0.1:<ephemeral>."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            status, body = routes.get(self.path, (404, b"not found"))
            self.send_response(status)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):                      # keep pytest quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        srv.server_close()


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


def test_lyrics_scrape_urls_live_loopback(tmp_path, capsys):
    from scrape_lyrics import scrape_urls

    page = (b"<html><head><style>body{color:red}</style>"
            b"<script>var x = 'not lyrics';</script></head>"
            b"<body><div>all my troubles</div>\n"
            b"<p>seemed so far away</p></body></html>")
    page2 = b"<html><body>help me if you can</body></html>"
    routes = {"/yesterday": (200, page), "/help": (200, page2),
              "/sos": (200, b"<html><body>so when you are near</body></html>"),
              "/gone": (500, b"boom")}
    with _fixture_server(routes) as base:
        url_list = tmp_path / "urls.csv"
        url_list.write_text(
            f"The Beatles, Yesterday, {base}/yesterday\n"
            f"Queen, Help, {base}/help\n"
            f"Abba, SOS, {base}/sos\n"
            f"malformed line with no commas\n"
            f"Nobody, Gone, {base}/gone\n"
            f"Nobody, Missing, {base}/nope\n")
        out = tmp_path / "lyrics.csv"
        n = scrape_urls(url_list, out)

    assert n == 3                       # 500 + 404 + malformed all skipped
    assert "skip" in capsys.readouterr().err
    with open(out, newline="", encoding="utf-8") as f:
        rows = {(r["artist"], r["song"]): r["lyrics"]
                for r in csv.DictReader(f)}
    # script/style stripped, visible text joined with the " / " form
    assert rows[("The Beatles", "Yesterday")] == \
        "all my troubles / seemed so far away"
    assert "not lyrics" not in rows[("The Beatles", "Yesterday")]

    from fewshot.data.corpus import build_lyrics_corpus
    corpus = build_lyrics_corpus(out, tmp_path / "packed", vocab_size=32,
                                 max_len=16)
    assert len(corpus.song_len) == 3


def test_midi_fetch_live_loopback(tmp_path, capsys):
    from scrape_midi import fetch

    from fewshot.data.midi import Note, parse_midi, write_midi

    notes = [Note(0.0, 0.5, 60, 90), Note(0.5, 1.0, 64, 80)]
    blob = tmp_path / "fixture.mid"
    write_midi(notes, blob)
    payload = blob.read_bytes()
    routes = {"/sowhat.mid": (200, payload), "/peace.mid": (200, payload),
              "/maiden.mid": (200, payload)}
    with _fixture_server(routes) as base:
        url_list = tmp_path / "urls.csv"
        url_list.write_text(
            f"Miles Davis,So What,{base}/sowhat.mid\n"
            f"Bill Evans,Peace Piece,{base}/peace.mid\n"
            f"Herbie Hancock,Maiden Voyage,{base}/maiden.mid\n"
            f"Bill Evans,Lost,{base}/missing.mid\n"
            f"short,row\n")
        out = tmp_path / "tree"
        n = fetch(url_list, out)

    assert n == 3                        # 404 + malformed skipped
    assert "skip" in capsys.readouterr().err
    assert sorted(p.name for p in out.iterdir()) == \
        ["Bill_Evans", "Herbie_Hancock", "Miles_Davis"]
    parsed = parse_midi(out / "Miles_Davis" / "So_What.mid")
    assert len(parsed) == 2

    from fewshot.data.corpus import build_midi_corpus
    corpus = build_midi_corpus(out, tmp_path / "packed_midi", max_len=32)
    assert len(corpus.song_len) == 3
