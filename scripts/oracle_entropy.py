#!/usr/bin/env python
"""Exact oracle NLL of the synthetic lyrics generator on a packed corpus.

The vocab-scale quality story (benchmarks/scale_quality.json, RESULTS.md)
compares model test NLL against the episodic-unigram floor, but the
remaining claw-able gap was unknown (ROADMAP r4 candidate 1: "the corpus's
true conditional entropy (unknown)").  This script closes that: the corpus
is OUR generator (fewshot/data/synthetic.py), so the token-level
conditional distribution is computable exactly.  For each song of each
requested split's artists it replays the latent ArtistStyle (same seeded
RNG stream — synthetic.lyrics_stream) and scores every target position
under the true process:

  state (i lines emitted+1, j words in current line); next token is
    '/'   with prob h_j * (1 - g_i)
    </s>  with prob h_j * g_i
    word w with prob (1 - h_j) * P_word(w)
  where h_j = P(line length = j | >= j)  (uniform WORDS_RANGE hazard),
        g_i = P(num lines  = i | >= i)   (uniform LINE_RANGE hazard),
        P_word = theta*theme_w + rho*pool_zipf + (1-theta-rho)*common_mix
  mapped through the corpus Vocab (out-of-vocab mass aggregates onto UNK
  exactly as packing does).

The resulting token-weighted mean NLL over a split is the
information-theoretic FLOOR for any predictor that knows the artist's
latent parameters.  A K-shot learner sees only K support songs, so its
Bayes-optimal NLL lies ABOVE this floor (the posterior over theme_w /
signature words / mix given ~K*55 words is not degenerate); the floor is
still the honest "speed of light" to report the model gap against.

Targets counted = (len-1) per song ([BOS, w.., EOS]; CLAUDE.md invariant)
— identical to the eval harness's masked count.  The walk asserts no
song was truncated at pack time (max_len=0 tight packing guarantees it).

Run: python scripts/oracle_entropy.py            # scale corpus defaults
Writes benchmarks/oracle_entropy.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from fewshot.data import synthetic
from fewshot.data.corpus import PackedCorpus
from fewshot.data.lyrics import tokenize_line
from fewshot.data.vocab import EOS


def _hazard(lo: int, hi: int) -> dict[int, float]:
    """P(X = j | X >= j) for X ~ uniform integers [lo, hi)."""
    return {j: 1.0 / (hi - j) for j in range(lo, hi)}


def word_dist(style, pool_vec: np.ndarray, common_ids: np.ndarray,
              vocab) -> np.ndarray:
    """The artist's per-word-position distribution over vocab ids."""
    theta, rho = style.theme_rate, style.pool_rate
    dist = rho * pool_vec
    theme_ids = np.asarray(vocab.encode(style.theme), np.int64)
    np.add.at(dist, theme_ids, theta * style.theme_w)
    np.add.at(dist, common_ids, (1.0 - theta - rho) * style.mix)
    return dist


def score_artist(style, songs, vocab, pool_vec, common_ids, V,
                 h_word, h_line, slash_id, k_support: int = 5) -> dict:
    """Exact oracle NLL sums for one artist, decomposed.

    Beyond the word/structural split, word positions are further split by
    EXPECTED support membership under the eval sampler's episode draw
    (support = k_support songs uniform from the artist's others): for a
    query song q, P(target id unseen) = C(n-1-m, k)/C(n-1, k) with m =
    number of OTHER songs whose targets contain the id — the same
    by-vocab-id "seen" condition scripts/gap_analysis.py measures on the
    model, so the two decompositions are directly comparable."""
    from math import comb

    dist = word_dist(style, pool_vec, common_ids, vocab)
    logp = np.full(V, -np.inf)
    nz = dist > 0
    logp[nz] = np.log(dist[nz])

    song_ids = []
    for _name, text, generic in songs:
        assert not generic, "generic filler songs need their own hazards"
        song_ids.append(vocab.encode(tokenize_line(text)))
    n = len(song_ids)
    id_sets = [set(ids) for ids in song_ids]
    in_songs: dict[int, int] = {}
    for s in id_sets:
        for t in s:
            in_songs[t] = in_songs.get(t, 0) + 1
    # P(id unseen | m of the n-1 other songs contain it)
    denom = comb(n - 1, k_support)
    p_unseen_by_m = [comb(n - 1 - m, k_support) / denom
                     if n - 1 - m >= k_support else 0.0
                     for m in range(n)]

    acc = dict(w_nll=0.0, w_cnt=0, slash_nll=0.0, slash_cnt=0,
               eos_nll=0.0, eos_cnt=0,
               seen_nll=0.0, seen_w=0.0, unseen_nll=0.0, unseen_w=0.0)
    for q, ids in enumerate(song_ids):
        i, j = 1, 0
        for t in ids + [EOS]:
            assert j <= max(h_word) and i <= max(h_line), (i, j)
            hj = h_word.get(j, 0.0)   # 0 below the min line length
            gi = h_line.get(i, 0.0)   # 0 below the min line count
            if t == EOS:
                acc["eos_nll"] -= np.log(hj * gi)
                acc["eos_cnt"] += 1
            elif t == slash_id:
                acc["slash_nll"] -= np.log(hj * (1.0 - gi))
                acc["slash_cnt"] += 1
                i += 1
                j = 0
            else:
                nll = -(np.log1p(-hj) + logp[t])
                acc["w_nll"] += nll
                acc["w_cnt"] += 1
                m = in_songs[t] - (1 if t in id_sets[q] else 0)
                pu = p_unseen_by_m[m]
                acc["unseen_nll"] += pu * nll
                acc["unseen_w"] += pu
                acc["seen_nll"] += (1.0 - pu) * nll
                acc["seen_w"] += 1.0 - pu
                j += 1
    return acc


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus_dir",
                   default=str(REPO / "data" / "scale_lyrics" / "plain"))
    p.add_argument("--artists", type=int, default=2000)
    p.add_argument("--songs", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--extra_vocab", type=int, default=6000)
    p.add_argument("--splits", default="test,val")
    p.add_argument("--k_support", type=int, default=5,
                   help="support size for the expected seen/unseen "
                        "decomposition (matches the eval sampler)")
    p.add_argument("--out",
                   default=str(REPO / "benchmarks" / "oracle_entropy.json"))
    args = p.parse_args(argv)

    t0 = time.time()
    corpus = PackedCorpus.load(args.corpus_dir)
    vocab = corpus.vocab
    V = len(vocab)
    slash_id = vocab.index["/"]
    name_to_idx = {n: i for i, n in enumerate(corpus.artist_names)}
    wanted: dict[str, set[int]] = {
        s: set(int(a) for a in corpus.splits[s])
        for s in args.splits.split(",")}
    wanted_idx = set().union(*wanted.values())

    # the shared zipf pool, binned once onto vocab ids (OOV -> UNK)
    rng = np.random.RandomState(args.seed)
    pool, pool_p = synthetic.make_pool(args.extra_vocab, rng)
    pool_vec = np.zeros(V)
    if pool:
        np.add.at(pool_vec, np.asarray(vocab.encode(pool), np.int64), pool_p)
    common_ids = np.asarray(vocab.encode(synthetic._COMMON), np.int64)

    lo_w, hi_w = synthetic.WORDS_RANGE
    lo_l, hi_l = synthetic.LINE_RANGE
    h_word = _hazard(lo_w, hi_w)        # h_word[hi_w-1] == 1.0
    h_line = _hazard(lo_l, hi_l)

    keys = ("w_nll", "w_cnt", "slash_nll", "slash_cnt", "eos_nll",
            "eos_cnt", "seen_nll", "seen_w", "unseen_nll", "unseen_w")
    per_split = {s: dict({k: 0.0 for k in keys}, artists=0) for s in wanted}
    checked = 0
    for artist, style, songs in synthetic.lyrics_stream(
            args.artists, args.songs, args.seed, args.extra_vocab):
        aidx = name_to_idx.get(artist)
        if aidx is None:
            raise SystemExit(f"artist {artist} not in corpus — wrong "
                             f"--artists/--seed for this corpus_dir?")
        # cross-check stream/corpus alignment on the first few artists:
        # the regenerated text must re-encode to the packed ids exactly.
        if checked < 3:
            sid = int(corpus.artist_song_ids[aidx, 0])
            ids = vocab.encode(tokenize_line(songs[0][1]))
            packed = corpus.songs[sid, 1:corpus.song_len[sid] - 1].tolist()
            assert ids == packed, f"stream/corpus mismatch for {artist}"
            assert int(corpus.song_len[sid]) == len(ids) + 2, "truncated"
            checked += 1
        if aidx not in wanted_idx:
            continue
        acc = score_artist(style, songs, vocab, pool_vec, common_ids, V,
                           h_word, h_line, slash_id, args.k_support)
        for s, idxs in wanted.items():
            if aidx in idxs:
                d = per_split[s]
                for k in keys:
                    d[k] += acc[k]
                d["artists"] += 1

    result = {
        "corpus_dir": str(args.corpus_dir),
        "protocol": "exact generator conditionals (ArtistStyle replay) on "
                    "every song of each split's artists; targets = (len-1) "
                    "per song incl. EOS, matching the eval mask; "
                    "OOV mass aggregated on UNK as packing does",
        "caveat": "floor assumes KNOWN artist params; the K-shot "
                  "Bayes-optimal NLL lies above it",
        "wall_sec": None,
    }
    for s, d in per_split.items():
        s_nll = d["slash_nll"] + d["eos_nll"]
        s_cnt = d["slash_cnt"] + d["eos_cnt"]
        n = d["w_cnt"] + s_cnt
        result[s] = {
            "oracle_nll_per_token": round((d["w_nll"] + s_nll) / n, 4),
            "word_positions_nll": round(d["w_nll"] / d["w_cnt"], 4),
            "structural_positions_nll": round(s_nll / s_cnt, 4),
            "slash_nll": round(d["slash_nll"] / d["slash_cnt"], 4),
            "eos_nll": round(d["eos_nll"] / d["eos_cnt"], 4),
            # expected decomposition under K-support episode sampling,
            # same by-id "seen" condition as scripts/gap_analysis.py
            "word_seen_nll": round(d["seen_nll"] / d["seen_w"], 4),
            "word_unseen_nll": round(d["unseen_nll"] / d["unseen_w"], 4),
            "word_unseen_fraction": round(
                d["unseen_w"] / d["w_cnt"], 4),
            "k_support": args.k_support,
            "word_fraction": round(d["w_cnt"] / int(n), 4),
            "n_tokens": int(n),
            "n_artists": d["artists"],
        }
    result["wall_sec"] = round(time.time() - t0, 1)
    Path(args.out).write_text(json.dumps(result, indent=1))
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
