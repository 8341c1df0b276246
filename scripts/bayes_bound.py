#!/usr/bin/env python
"""Achievable K-shot bound: MC posterior predictive from support songs only.

benchmarks/oracle_entropy.json pins the KNOWN-PARAMS floor of the scale
corpus (test 4.4535 NLL/token) and RESULTS.md argues the K-shot
Bayes-optimal NLL lies strictly above it — but by an unknown amount, so
"how much of the model's remaining gap is claw-able" was open (ROADMAP r4
candidate 1).  This script closes the sandwich from the other side with an
ACHIEVABLE upper bound on the Bayes-optimal K-shot NLL:

  oracle (known params)  <=  Bayes-optimal K-shot  <=  THIS script's NLL

because the predictive scored here is a genuine function of ONLY the
episode's K=5 support songs plus the generator's known structure (which an
unboundedly-trained meta-learner could learn from training artists): any
such predictive's NLL is attainable in principle, so the optimum is at or
below it.  The model's truly claw-able headroom is (model - bound), not
(model - oracle).

Inference per episode (numpy Gibbs, exact conjugacy where it exists):
the latent ArtistStyle (fewshot/data/synthetic.py) factors into
  - the 10-word base theme list: one of 6 known lists; base words occur in
    no other branch, so observed base tokens identify the list exactly
    (posterior over surviving lists is otherwise uniform);
  - S: 12 signature words uniform w/o replacement from the known 6000-word
    zipf pool — sampled by 12 slot-identity Gibbs moves over {observed
    pool words} + "anonymous" (an unobserved word), with the slot's
    Dirichlet weight held fixed (blocked with the word's branch split);
  - tw ~ Dir(2*1_22) over [10 base + 12 slots]: conjugate given per-slot
    theme-branch counts;
  - per-token branch of an observed pool word w in S: theme (r*tw) vs
    zipf pool (0.35*zipf_w): Binomial split given (tw, r);
  - r = theme_rate ~ U[0.35, 0.55]: 1-D grid posterior ~ r^Ct (0.65-r)^Cc;
  - mix ~ Dir(2*1_40) over _COMMON: exact conjugate (common words occur in
    no other branch) — Rao-Blackwellized, never sampled.

The predictive averages Rao-Blackwellized per-sample distributions (tw
posterior MEAN given the sampled assignments, grid-exact E[r]); anonymous
slots spread their mass uniformly over unobserved pool words (the S prior
is uniform, and unobserved identities are likelihood-free), with OOV pool
words aggregated onto UNK exactly as corpus packing does.  Structural
positions ('/' and EOS) are artist-independent, so the Bayes predictive
equals the oracle hazards there (scripts/oracle_entropy.py).

Protocol: for each test artist, R seeded episodes (K support + Q query
songs w/o replacement, mirroring the eval sampler); every query target
position is scored once per episode; seen/unseen = support-target count
of the id > 0, identical to scripts/gap_analysis.py.  The oracle is also
scored on the SAME query positions (episode-matched floor).

Writes benchmarks/bayes_bound.json.  Pure CPU/numpy; no TPU needed.
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
from fewshot.data.vocab import EOS

ALPHA = 2.0          # Dirichlet concentration of theme_w and mix (known)
POOL_RATE = 0.35     # fixed pool branch rate (known)
N_SIG = 12           # signature slots per artist (known)
R_LO, R_HI = 0.35, 0.55


def _hazard_vec(lo: int, hi: int, size: int) -> np.ndarray:
    """h[j] = P(X == j | X >= j) for X ~ U{lo..hi-1}, 0 below lo."""
    h = np.zeros(size)
    for j in range(lo, hi):
        h[j] = 1.0 / (hi - j)
    return h


class CorpusSide:
    """Known-structure constants binned onto vocab ids (OOV -> UNK)."""

    def __init__(self, corpus: PackedCorpus, extra_vocab: int, seed: int):
        vocab = corpus.vocab
        self.V = len(vocab)
        self.unk = vocab.index["<unk>"] if "<unk>" in vocab.index else 1
        # specials: rely on encode() of an unknown word for the UNK id
        self.unk = vocab.encode(["zzz_not_a_word_zzz"])[0]
        self.slash = vocab.index["/"]
        rng = np.random.RandomState(seed)
        pool, pool_p = synthetic.make_pool(extra_vocab, rng)
        self.zipf = np.zeros(self.V)
        self.mult = np.zeros(self.V)          # pool words per id
        ids = np.asarray(vocab.encode(pool), np.int64)
        np.add.at(self.zipf, ids, pool_p)
        np.add.at(self.mult, ids, 1.0)
        self.n_pool = len(pool)
        self.common_ids = np.asarray(vocab.encode(synthetic._COMMON),
                                     np.int64)
        assert not (set(self.common_ids.tolist()) & {self.unk}), \
            "a _COMMON word fell out of the vocab"
        self.base_lists = []
        for theme in synthetic._THEMES:
            bids = np.asarray(vocab.encode(theme), np.int64)
            assert self.unk not in bids, "a base theme word is OOV"
            self.base_lists.append(bids)
        self.is_common = np.zeros(self.V, bool)
        self.is_common[self.common_ids] = True
        self.is_base = np.zeros(self.V, bool)
        for b in self.base_lists:
            self.is_base[b] = True
        self.is_pool = self.zipf > 0
        # mix posterior prior part and the word-emission hazards
        lo_w, hi_w = synthetic.WORDS_RANGE
        lo_l, hi_l = synthetic.LINE_RANGE
        self.h_word = _hazard_vec(lo_w, hi_w, 512)
        self.h_line = _hazard_vec(lo_l, hi_l, 512)
        self.r_grid = np.linspace(R_LO + 1e-4, R_HI - 1e-4, 201)


def gibbs_predictive(cs: CorpusSide, sup_word_ids: np.ndarray,
                     rng: np.random.Generator, burn: int, keep: int,
                     thin: int, chains: int) -> np.ndarray:
    """[V] posterior-predictive word distribution given support word ids."""
    ids, counts = np.unique(sup_word_ids, return_counts=True)
    counts = counts.astype(np.float64)
    com_sel = cs.is_common[ids]
    base_sel = cs.is_base[ids]
    pool_sel = cs.is_pool[ids] & ~base_sel & ~com_sel
    assert np.all(com_sel | base_sel | pool_sel), (
        "unclassifiable support word ids", ids[~(com_sel | base_sel
                                                 | pool_sel)])
    C_common = counts[com_sel].sum()

    # --- theme list identification (exact posterior; ties ~ never) -------
    obs_base = set(ids[base_sel].tolist())
    lists = [b for b in cs.base_lists if obs_base <= set(b.tolist())]
    if not lists:                      # degenerate; cannot happen w/ data
        lists = cs.base_lists
    mix_mean = np.zeros(cs.V)
    cnt_common = np.zeros(cs.V)
    cnt_common[ids[com_sel]] = counts[com_sel]
    mix_mean[cs.common_ids] = (ALPHA + cnt_common[cs.common_ids]) / (
        ALPHA * len(cs.common_ids) + C_common)

    # observed pool words (incl UNK aggregate); anon spread over unobserved
    O_ids = ids[pool_sel]
    cw = counts[pool_sel]
    zw = cs.zipf[O_ids] * POOL_RATE              # absolute pool-branch prob
    prior_mult = np.maximum(cs.mult[O_ids], 1.0)  # UNK bundles OOV words
    n_obs_words = float(prior_mult.sum())
    N_u = max(cs.n_pool - n_obs_words, 1.0)
    spread = np.where(cs.is_pool, cs.mult, 0.0)
    spread[O_ids] = 0.0
    su = spread.sum()
    spread = spread / su if su > 0 else spread

    P_bar = np.zeros(cs.V)
    n_acc = 0
    for base_ids in lists:
        cnt_base = np.zeros(len(base_ids))
        for i, b in enumerate(base_ids):
            got = counts[ids == b]
            cnt_base[i] = got[0] if len(got) else 0.0
        n_O = len(O_ids)
        T = len(base_ids) + N_SIG                 # 22 theme slots
        for _c in range(chains):
            slot_word = np.full(N_SIG, -1, np.int64)   # index into O, -1=anon
            zc = np.zeros(n_O)                         # theme-branch counts
            # init: top words by count excess over expected pool draws
            if n_O:
                W_tot = counts.sum()
                excess = cw - zw * W_tot
                order = np.argsort(-excess)[:N_SIG]
                for k, widx in enumerate(order):
                    if excess[widx] > 0:
                        slot_word[k] = widx
            r = 0.45
            tw = np.full(T, 1.0 / T)
            for sweep in range(burn + keep * thin):
                # z | tw, r  (branch split of assigned words)
                zc[:] = 0.0
                for k in range(N_SIG):
                    w = slot_word[k]
                    if w >= 0:
                        p_t = r * tw[len(base_ids) + k]
                        p = p_t / (p_t + zw[w])
                        zc[w] = rng.binomial(int(cw[w]), p)
                # tw | z  (conjugate Dirichlet)
                cnt22 = np.concatenate([
                    cnt_base,
                    [zc[slot_word[k]] if slot_word[k] >= 0 else 0.0
                     for k in range(N_SIG)]])
                tw = rng.dirichlet(ALPHA + cnt22)
                # r | z  (1-D grid posterior, uniform prior on [0.35,0.55])
                C_t = cnt_base.sum() + zc.sum()
                lw = C_t * np.log(cs.r_grid) + \
                    C_common * np.log(0.65 - cs.r_grid)
                lw -= lw.max()
                wgt = np.exp(lw)
                wgt /= wgt.sum()
                r = float(rng.choice(cs.r_grid, p=wgt))
                r_mean = float((cs.r_grid * wgt).sum())
                # slot identities | tw, r  (z of the occupant marginalized)
                if n_O:
                    assigned = np.zeros(n_O, bool)
                    for k in range(N_SIG):
                        if slot_word[k] >= 0:
                            assigned[slot_word[k]] = True
                    for k in range(N_SIG):
                        w_old = slot_word[k]
                        if w_old >= 0:
                            assigned[w_old] = False
                            zc[w_old] = 0.0
                        tw_k = r * tw[len(base_ids) + k]
                        cand = np.nonzero(~assigned)[0]
                        lr = cw[cand] * np.log1p(tw_k / zw[cand]) \
                            + np.log(prior_mult[cand])
                        lr = np.append(lr, np.log(N_u))   # anon
                        lr -= lr.max()
                        p = np.exp(lr)
                        p /= p.sum()
                        pick = rng.choice(len(p), p=p)
                        if pick == len(cand):
                            slot_word[k] = -1
                        else:
                            w_new = int(cand[pick])
                            slot_word[k] = w_new
                            assigned[w_new] = True
                            p_t = tw_k
                            pr = p_t / (p_t + zw[w_new])
                            zc[w_new] = rng.binomial(int(cw[w_new]), pr)
                if sweep >= burn and (sweep - burn) % thin == 0:
                    # Rao-Blackwellized predictive for this sample
                    cnt22 = np.concatenate([
                        cnt_base,
                        [zc[slot_word[k]] if slot_word[k] >= 0 else 0.0
                         for k in range(N_SIG)]])
                    tw_m = (ALPHA + cnt22) / (ALPHA * T + cnt22.sum())
                    P = POOL_RATE * cs.zipf + (0.65 - r_mean) * mix_mean
                    np.add.at(P, base_ids, r_mean * tw_m[:len(base_ids)])
                    anon_mass = 0.0
                    for k in range(N_SIG):
                        m = r_mean * tw_m[len(base_ids) + k]
                        if slot_word[k] >= 0:
                            P[O_ids[slot_word[k]]] += m
                        else:
                            anon_mass += m
                    P += anon_mass * spread
                    P_bar += P / P.sum()
                    n_acc += 1
    return P_bar / n_acc


def score_song(cs: CorpusSide, tok: np.ndarray, logP: np.ndarray,
               seen: np.ndarray, acc: dict, o_logp: np.ndarray) -> None:
    """Oracle-style state machine over one query song's targets."""
    i, j = 1, 0
    for t in tok:
        hj, gi = cs.h_word[j], cs.h_line[i]
        if t == EOS:
            nll = -np.log(hj * gi)
            acc["eos"][0] += nll
            acc["eos"][1] += 1
            acc["eos"][2] += nll          # oracle identical (structural)
        elif t == cs.slash:
            nll = -np.log(hj * (1.0 - gi))
            acc["slash"][0] += nll
            acc["slash"][1] += 1
            acc["slash"][2] += nll
            i += 1
            j = 0
            continue
        else:
            emit = np.log1p(-hj)
            key = "word_seen" if seen[t] else "word_unseen"
            acc[key][0] += -(emit + logP[t])
            acc[key][1] += 1
            acc[key][2] += -(emit + o_logp[t])
            j += 1
            continue


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus_dir",
                   default=str(REPO / "data" / "scale_lyrics" / "plain"))
    p.add_argument("--artists", type=int, default=2000)
    p.add_argument("--songs", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--extra_vocab", type=int, default=6000)
    p.add_argument("--split", default="test")
    p.add_argument("--episodes_per_artist", type=int, default=3)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--q", type=int, default=5)
    p.add_argument("--burn", type=int, default=30)
    p.add_argument("--samples", type=int, default=30)
    p.add_argument("--thin", type=int, default=2)
    p.add_argument("--chains", type=int, default=2)
    p.add_argument("--episode_seed", type=int, default=123)
    p.add_argument("--limit_artists", type=int, default=0,
                   help="debug: only the first N split artists")
    p.add_argument("--out",
                   default=str(REPO / "benchmarks" / "bayes_bound.json"))
    args = p.parse_args(argv)

    t0 = time.time()
    corpus = PackedCorpus.load(args.corpus_dir)
    cs = CorpusSide(corpus, args.extra_vocab, args.seed)
    name_to_idx = {n: i for i, n in enumerate(corpus.artist_names)}
    split_idx = set(int(a) for a in corpus.splits[args.split])

    # per-artist oracle word distributions for the episode-matched floor
    from fewshot.data.lyrics import tokenize_line
    oracle_logp: dict[int, np.ndarray] = {}
    checked = 0
    for artist, style, songs in synthetic.lyrics_stream(
            args.artists, args.songs, args.seed, args.extra_vocab):
        aidx = name_to_idx[artist]
        if checked < 2:       # stream/corpus alignment guard
            sid = int(corpus.artist_song_ids[aidx, 0])
            ids = corpus.vocab.encode(tokenize_line(songs[0][1]))
            assert ids == corpus.songs[
                sid, 1:corpus.song_len[sid] - 1].tolist(), "stream mismatch"
            checked += 1
        if aidx not in split_idx:
            continue
        dist = POOL_RATE * cs.zipf.copy()
        tids = np.asarray(corpus.vocab.encode(style.theme), np.int64)
        np.add.at(dist, tids, style.theme_rate * style.theme_w)
        np.add.at(dist, cs.common_ids,
                  (1.0 - style.theme_rate - POOL_RATE) * style.mix)
        lp = np.full(cs.V, -np.inf)
        nz = dist > 0
        lp[nz] = np.log(dist[nz])
        oracle_logp[aidx] = lp

    artists = sorted(split_idx)
    if args.limit_artists:
        artists = artists[:args.limit_artists]

    acc = {k: [0.0, 0, 0.0] for k in
           ("word_seen", "word_unseen", "slash", "eos")}
    per_episode = []
    rng_ep = np.random.default_rng(args.episode_seed)
    n_songs_per = corpus.artist_song_ids.shape[1]
    for aidx in artists:
        o_logp = oracle_logp[aidx]
        for e in range(args.episodes_per_artist):
            pick = rng_ep.choice(n_songs_per, size=args.k + args.q,
                                 replace=False)
            sids = corpus.artist_song_ids[aidx][pick]
            sup, qry = sids[:args.k], sids[args.k:]
            # support target positions (1..len-1), as lm.support_counts
            seen = np.zeros(cs.V, bool)
            sup_words = []
            for sid in sup:
                tgt = corpus.songs[sid, 1:corpus.song_len[sid]]
                seen[tgt] = True
                w = tgt[(tgt != EOS) & (tgt != cs.slash)]
                sup_words.append(w)
            sup_words = np.concatenate(sup_words)
            rng = np.random.default_rng(
                args.episode_seed * 100003 + aidx * 131 + e)
            P = gibbs_predictive(cs, sup_words, rng, args.burn,
                                 args.samples, args.thin, args.chains)
            logP = np.full(cs.V, -np.inf)
            nz = P > 0
            logP[nz] = np.log(P[nz])
            ep_acc = {k: [0.0, 0, 0.0] for k in acc}
            for sid in qry:
                tok = corpus.songs[sid, 1:corpus.song_len[sid]]
                score_song(cs, tok, logP, seen, ep_acc, o_logp)
            for k in acc:
                for z in range(3):
                    acc[k][z] += ep_acc[k][z]
            n = sum(ep_acc[k][1] for k in ep_acc)
            per_episode.append(
                sum(ep_acc[k][0] for k in ep_acc) / n)
        done = artists.index(aidx) + 1
        if done % 25 == 0:
            tot = sum(acc[k][0] for k in acc) / sum(acc[k][1] for k in acc)
            print(json.dumps({"artists_done": done,
                              "bound_nll_so_far": round(tot, 4),
                              "sec": round(time.time() - t0, 1)}),
                  flush=True)

    n_tok = sum(acc[k][1] for k in acc)
    bound = sum(acc[k][0] for k in acc) / n_tok
    oracle_matched = sum(acc[k][2] for k in acc) / n_tok
    w_nll = acc["word_seen"][0] + acc["word_unseen"][0]
    w_cnt = acc["word_seen"][1] + acc["word_unseen"][1]
    s_nll = acc["slash"][0] + acc["eos"][0]
    s_cnt = acc["slash"][1] + acc["eos"][1]
    ep = np.asarray(per_episode)
    result = {
        "protocol": __doc__.split("\n")[0] + " — see module docstring; "
                    f"{args.episodes_per_artist} episodes/artist, K={args.k} "
                    f"Q={args.q}, {args.chains} chains x ({args.burn} burn + "
                    f"{args.samples} kept/{args.thin} thin) Gibbs sweeps",
        "split": args.split,
        "n_artists": len(artists),
        "n_episodes": len(per_episode),
        "n_tokens": int(n_tok),
        "bayes_bound_nll_per_token": round(bound, 4),
        "episode_stderr": round(float(ep.std(ddof=1) / np.sqrt(len(ep))), 4),
        "oracle_episode_matched": round(oracle_matched, 4),
        "word_positions_nll": round(w_nll / w_cnt, 4),
        "structural_positions_nll": round(s_nll / s_cnt, 4),
        "bins": {k: {"nll": round(acc[k][0] / max(acc[k][1], 1), 4),
                     "count": int(acc[k][1]),
                     "oracle_nll": round(acc[k][2] / max(acc[k][1], 1), 4)}
                 for k in acc},
        "interpretation": "oracle <= Bayes-optimal K-shot <= bound; the "
                          "model's claw-able headroom is (model_nll - "
                          "bound), the rest of (model_nll - oracle) is "
                          "irreducible at K=5",
        "wall_sec": round(time.time() - t0, 1),
    }
    Path(args.out).write_text(json.dumps(result, indent=1))
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
