#!/usr/bin/env python
"""MIDI at scale, end-to-end (r2 verdict #4): generate a hundreds-of-artists
synthetic MIDI corpus with LONG event streams, push it through the whole
stack — SMF parse -> event tokens -> BPE -> converged episodic training ->
evaluation in BASE-token NLL vs the episodic-unigram floor ->
grammar-constrained sampling with SMF-validity re-parse — and record one
JSON artifact (benchmarks/midi_scale.json).

Everything before training is offline/CPU (the reference's modality
contract, BASELINE.json:9); training/eval/sampling run on the real chip.
The converged-training leg reuses scripts/scale_quality.py's harness so
lyrics and MIDI quality numbers share one protocol.

Run:  python scripts/midi_scale.py [--artists 300 ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.scale_quality import run_leg        # noqa: E402


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default=str(REPO / "data" / "scale_midi"))
    p.add_argument("--out", default=str(REPO / "benchmarks" /
                                        "midi_scale.json"))
    p.add_argument("--artists", type=int, default=300)
    p.add_argument("--songs", type=int, default=24)
    p.add_argument("--notes_lo", type=int, default=60)
    p.add_argument("--notes_hi", type=int, default=100)
    p.add_argument("--bpe_merges", type=int, default=300)
    p.add_argument("--max_steps", type=int, default=20000)
    p.add_argument("--eval_every", type=int, default=500)
    p.add_argument("--steps_per_call", type=int, default=10)
    p.add_argument("--patience", type=int, default=6)
    p.add_argument("--eval_episodes", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--prepare_only", action="store_true",
                   help="stop after the offline tier (no TPU work)")
    p.add_argument("--legs", type=str, default="plain,bpe,sampling",
                   help="comma list: any of plain, bpe, plain_cache, "
                        "plain_cache_aux, tfm, tfm_cache, tfm_cache_aux, "
                        "bpe_cache, bpe_cache_aux, plain_cache_floor, "
                        "plain_cache_floor_s1, sampling")
    p.add_argument("--keep_existing", action="store_true",
                   help="merge with the existing artifact instead of "
                        "overwriting (re-run a subset of legs)")
    args = p.parse_args(argv)
    wanted = set(args.legs.split(","))

    from fewshot.data.corpus import PackedCorpus, build_midi_corpus
    from fewshot.data.synthetic import generate_midi_corpus
    from fewshot.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    root = Path(args.root)
    raw = root / "raw"
    result: dict = {"artists": args.artists, "songs": args.songs,
                    "notes_per_song": [args.notes_lo, args.notes_hi],
                    "bpe_merges": args.bpe_merges}
    if args.keep_existing and Path(args.out).exists():
        result = {**json.loads(Path(args.out).read_text()), **result}

    # ---- offline tier: .mid files -> packed corpora ----------------------
    if not raw.exists():
        t0 = time.time()
        generate_midi_corpus(raw, num_artists=args.artists,
                             songs_per_artist=args.songs, seed=args.seed,
                             notes_range=(args.notes_lo, args.notes_hi))
        result["generate_sec"] = round(time.time() - t0, 1)
    result["n_mid_files"] = sum(1 for _ in raw.rglob("*.mid"))

    t0 = time.time()
    plain = build_midi_corpus(raw, root / "plain", max_len=0,
                              seed=args.seed)
    result["pack_plain_sec"] = round(time.time() - t0, 1)
    result["n_songs"] = int(plain.songs.shape[0])
    result["total_events"] = int(plain.song_len.sum())
    result["max_len_plain"] = plain.max_len

    t0 = time.time()
    bpe_c = build_midi_corpus(raw, root / "bpe", max_len=0, seed=args.seed,
                              bpe_merges=args.bpe_merges)
    result["pack_bpe_sec"] = round(time.time() - t0, 1)
    result["max_len_bpe"] = bpe_c.max_len
    result["bpe_compression"] = round(
        float(bpe_c.song_len.sum()) / float(plain.song_len.sum()), 3)
    print(json.dumps(result), flush=True)
    Path(args.out).write_text(json.dumps(result, indent=1))
    if args.prepare_only:
        return

    # ---- converged training + floors (same harness as scale_quality) ----
    for tag, sub in (("plain", "plain"), ("bpe", "bpe")):
        if tag in wanted:
            result[tag] = run_leg(f"midi_{tag}", root / sub, args)
            Path(args.out).write_text(json.dumps(result, indent=1))
    if "plain_cache" in wanted:
        # the cache-posterior stack on MIDI events (r3 verdict missing
        # #3): plain events already beat the floor by 1.45 nats, so the
        # question is whether a K=5 event-vocab signature signal exists
        # at all — the lyrics result (cache flips lose->win at V=5000)
        # says the answer is not guessable from the plain margin
        result["plain_cache"] = run_leg(
            "midi_plain_cache", root / "plain", args, support_cache=True,
            cache_backoff="global", cache_calib=True, cache_dynamic=True)
        Path(args.out).write_text(json.dumps(result, indent=1))
    for tag, seed in (("plain_cache_aux", 0), ("plain_cache_aux_s1", 1)):
        if tag in wanted:
            # r4: the plain_cache leg above COLLAPSED to the unigram floor
            # (mixture gradient starvation — at V=204 the count posterior
            # is near-optimal at init, the gate routes to it, and the LM
            # branch's gradient is scaled to ~1% by its responsibility;
            # RESULTS.md).  cache_lm_aux=1.0 gives the LM branch its own
            # full-strength CE.  Two seeds (r4 hardening).
            result[tag] = run_leg(
                f"midi_{tag}", root / "plain", args, seed=seed,
                support_cache=True, cache_backoff="global", cache_calib=True,
                cache_dynamic=True, cache_lm_aux=1.0)
            Path(args.out).write_text(json.dumps(result, indent=1))
    if "tfm" in wanted:
        # config #4 is literally "transformer-decoder baseline on MIDI
        # episodes" (BASELINE.json:10) — the last unmeasured cell of the
        # model x modality x scale matrix (r4 verdict missing #3)
        result["tfm"] = run_leg("midi_tfm", root / "plain", args,
                                model="transformer")
        Path(args.out).write_text(json.dumps(result, indent=1))
    if "tfm_cache" in wanted:
        # the starvation probe on the OTHER architecture: the full cache
        # stack with NO aux fix — the exact configuration that froze the
        # LSTM at the unigram floor (plain_cache leg, 2.739).  Does the
        # attention model's faster early optimization outrun the
        # responsibility-scaled (~1%) LM-branch gradient?
        result["tfm_cache"] = run_leg(
            "midi_tfm_cache", root / "plain", args, model="transformer",
            support_cache=True, cache_backoff="global", cache_calib=True,
            cache_dynamic=True)
        Path(args.out).write_text(json.dumps(result, indent=1))
    if "tfm_cache_aux" in wanted:
        # does the mixture-starvation pathology (and its cache_lm_aux fix)
        # behave the same when the sequence model is attention rather than
        # a recurrence?  Same stack as plain_cache_aux, transformer LM.
        result["tfm_cache_aux"] = run_leg(
            "midi_tfm_cache_aux", root / "plain", args, model="transformer",
            support_cache=True, cache_backoff="global", cache_calib=True,
            cache_dynamic=True, cache_lm_aux=1.0)
        Path(args.out).write_text(json.dumps(result, indent=1))
    if "bpe_cache" in wanted:
        # second measured point for the starvation regime boundary (r4
        # verdict weak #6): BPE MIDI sits at V=504 with 0.99 measured
        # support coverage — the mechanism says it should collapse like
        # plain MIDI (V=204, coverage 1.00) despite the bigger vocab
        result["bpe_cache"] = run_leg(
            "midi_bpe_cache", root / "bpe", args, support_cache=True,
            cache_backoff="global", cache_calib=True, cache_dynamic=True)
        Path(args.out).write_text(json.dumps(result, indent=1))
    if "bpe_cache_aux" in wanted:
        result["bpe_cache_aux"] = run_leg(
            "midi_bpe_cache_aux", root / "bpe", args, support_cache=True,
            cache_backoff="global", cache_calib=True, cache_dynamic=True,
            cache_lm_aux=1.0)
        Path(args.out).write_text(json.dumps(result, indent=1))
    for tag, seed in (("plain_cache_floor", 0), ("plain_cache_floor_s1", 1)):
        if tag in wanted:
            # responsibility floor, STARVED half of the pre-registered
            # 2-seed x 2-regime study (ROADMAP.md r5 ledger #2): does
            # max(r_lm, 0.25) on the LM branch's gradient multiplier
            # escape the collapse the no-aux leg measured (2.739 at the
            # 2.751 floor) the way cache_lm_aux=1.0 did (1.328 +/- 0.010)?
            result[tag] = run_leg(
                f"midi_{tag}", root / "plain", args, seed=seed,
                support_cache=True, cache_backoff="global",
                cache_calib=True, cache_dynamic=True, cache_resp_floor=0.25)
            Path(args.out).write_text(json.dumps(result, indent=1))
    if "sampling" not in wanted:
        print(json.dumps(result))
        return

    # ---- grammar-constrained sampling + SMF validity ---------------------
    import jax
    import numpy as np
    import jax.numpy as jnp
    from fewshot import sampling as sampling_mod, training
    from fewshot.config import Config
    from fewshot.data import bpe, episodes as eps, midi as midi_mod

    corpus = PackedCorpus.load(root / "plain")
    cfg = Config(dataset="midi", vocab_size=len(corpus.vocab),
                 max_len=corpus.max_len, embed_dim=256, hidden_dim=512,
                 num_layers=2, batch_size=32, support_size=5, query_size=5,
                 support_mode="mean_state", cell="pallas",
                 compute_dtype="bfloat16", sample_tokens=256,
                 data_parallel=False)
    # fresh short-trained params are fine here: this leg proves the
    # grammar mask + SMF writer pipeline at scale, not model quality
    data = eps.put_corpus(corpus)
    split = jnp.asarray(corpus.splits["test"])
    state = training.init_train_state(cfg, len(corpus.vocab))
    ep = eps.sample_episode(jax.random.PRNGKey(5), data, split, 8,
                            k=5, q=5)
    masks = jnp.asarray(midi_mod.grammar_masks(corpus.vocab))
    t0 = time.perf_counter()
    toks = sampling_mod.generate(state.params, ep.support, ep.support_len,
                                 jax.random.PRNGKey(6), cfg,
                                 token_masks=masks)
    toks = np.asarray(jax.device_get(toks))
    sample_sec = time.perf_counter() - t0
    n_notes = []
    for i in range(toks.shape[0]):
        words = corpus.vocab.decode(toks[i])
        notes = midi_mod.events_to_notes(words)
        path = root / f"sample_{i}.mid"
        midi_mod.write_midi(notes, path)
        n_notes.append(len(midi_mod.parse_midi(path)))   # SMF round-trip
    result["grammar_sampling"] = {
        "streams": int(toks.shape[0]), "tokens_per_stream": 256,
        "notes_reparsed_per_stream": n_notes,
        "all_smf_valid": bool(all(n > 0 for n in n_notes)),
        "wall_sec_incl_compile": round(sample_sec, 1),
    }
    Path(args.out).write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
