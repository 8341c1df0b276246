"""Generator refactor pins + oracle-entropy scorer sanity.

The oracle scorer (scripts/oracle_entropy.py) replays the generator's
latent ArtistStyle stream; these tests pin that (a) the refactored
stream-based generator is byte-identical to the pre-refactor CSV writer
(golden hashes recorded before the refactor), (b) the stream's text
re-encodes to exactly the packed corpus ids, and (c) the oracle NLL is
a genuine conditional-entropy floor: a proper distribution, and below
the empirical marginal entropy of the same tokens."""

from __future__ import annotations

import hashlib
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

from fewshot.data import synthetic
from fewshot.data.corpus import PackedCorpus, build_lyrics_corpus
from fewshot.data.lyrics import tokenize_line
from fewshot.data.synthetic import generate_lyrics_csv
from fewshot.data.vocab import BOS, EOS, PAD

GOLDEN = {
    (6, 5, 3, 0, 0.0): "08f0ae79e382401e",
    (5, 4, 1, 300, 0.0): "573afdca32f7534c",
    (8, 6, 0, 200, 0.34): "a29f22bc55035986",
}


def test_lyrics_csv_golden_hashes():
    """Refactor-proof: the stream-based writer is byte-identical to the
    original single-loop generator (hashes captured pre-refactor)."""
    for (na, spa, seed, ev, gf), want in GOLDEN.items():
        with tempfile.TemporaryDirectory() as tmp:
            p = Path(tmp) / "l.csv"
            generate_lyrics_csv(p, num_artists=na, songs_per_artist=spa,
                                seed=seed, extra_vocab=ev, generic_frac=gf)
            got = hashlib.sha256(p.read_bytes()).hexdigest()[:16]
        assert got == want, (na, spa, seed, ev, gf)


def _small_corpus(tmp, na=30, spa=12, ev=400, vs=600):
    csv = Path(tmp) / "l.csv"
    generate_lyrics_csv(csv, num_artists=na, songs_per_artist=spa, seed=0,
                        extra_vocab=ev)
    return build_lyrics_corpus(csv, Path(tmp) / "c", vocab_size=vs,
                               max_len=0)


def test_stream_matches_packed_corpus():
    """Every song in the replayed stream re-encodes to the packed ids."""
    with tempfile.TemporaryDirectory() as tmp:
        corpus = _small_corpus(tmp, na=8, spa=5)
        name_to_idx = {n: i for i, n in enumerate(corpus.artist_names)}
        for artist, _style, songs in synthetic.lyrics_stream(
                8, 5, seed=0, extra_vocab=400):
            aidx = name_to_idx[artist]
            for s, (_name, text, _g) in enumerate(songs):
                sid = int(corpus.artist_song_ids[aidx, s])
                ids = corpus.vocab.encode(tokenize_line(text))
                row = corpus.songs[sid, :corpus.song_len[sid]].tolist()
                assert row == [BOS] + ids + [EOS], (artist, s)


def test_oracle_floor_below_marginal_entropy():
    """The oracle distribution normalizes, and its NLL sits strictly
    below the empirical marginal entropy of the same tokens (conditional
    entropy <= marginal entropy; the gap here is large)."""
    import oracle_entropy as oe

    with tempfile.TemporaryDirectory() as tmp:
        corpus = _small_corpus(tmp)
        out = Path(tmp) / "oracle.json"
        oe.main(["--corpus_dir", str(Path(tmp) / "c"), "--artists", "30",
                 "--songs", "12", "--seed", "0", "--extra_vocab", "400",
                 "--splits", "train", "--out", str(out)])
        res = json.loads(out.read_text())["train"]

        # normalization of one artist's word distribution
        rng = np.random.RandomState(0)
        pool, pool_p = synthetic.make_pool(400, rng)
        V = len(corpus.vocab)
        pool_vec = np.zeros(V)
        np.add.at(pool_vec,
                  np.asarray(corpus.vocab.encode(pool), np.int64), pool_p)
        common_ids = np.asarray(
            corpus.vocab.encode(synthetic._COMMON), np.int64)
        _, style, _ = next(iter(synthetic.lyrics_stream(
            30, 12, seed=0, extra_vocab=400)))
        dist = oe.word_dist(style, pool_vec, common_ids, corpus.vocab)
        assert abs(float(dist.sum()) - 1.0) < 1e-9

        # empirical marginal entropy over the same split's target tokens
        train_artists = set(int(a) for a in corpus.splits["train"])
        mask = np.isin(corpus.song_artist, list(train_artists))
        toks = corpus.songs[mask]
        toks = toks[(toks != PAD) & (toks != BOS)]
        counts = np.bincount(toks, minlength=V).astype(np.float64)
        p = counts / counts.sum()
        marginal = float(-(p[p > 0] * np.log(p[p > 0])).sum())

        assert res["n_tokens"] == int(toks.size)
        assert 0.0 < res["oracle_nll_per_token"] < marginal - 0.2
