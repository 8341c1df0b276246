#!/usr/bin/env python
"""Where does the 0.28-nat gap to the oracle floor live?

benchmarks/oracle_entropy.json puts the known-params conditional-entropy
floor of the V=5000 scale corpus at 4.454 test NLL/token (word positions
5.001, structural 1.164); the best model (cache_backoff=global,
scale_quality.json) scores 4.735.  This script retrains that leg (same
hyperparameters; it converges in ~2k steps) and decomposes its test NLL
per position type, against the oracle's decomposition:

  - structural positions ('/' and EOS: the artist-independent line/song
    hazards) — if the model matches the oracle here, the whole gap is on
    word positions and the lever is better count-posterior modeling;
  - word positions, split by whether the target word occurs in the
    episode's support set (the cache can only spike on seen words);
  - the mean cache-gate value per bin (is the gate routing correctly?);
  - word-position NLL by position index (does within-song context help?).

Writes benchmarks/gap_analysis.json.  Run on the real chip (~5 min warm).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def make_decomposed_eval(cfg, data, split, slash_id: int):
    """Jitted (params, key) -> per-bin (nll_sum, count, gate_sum) stacks
    + per-position word-NLL sums.  Mirrors lm.episodic_nll_stats'
    mean_state + support_cache (+ fused head) eval path exactly, for
    either model family (cfg.model: the LSTM state path or the
    transformer prefix-attention path)."""
    import jax
    import jax.numpy as jnp
    from fewshot.data import episodes as eps
    from fewshot.models import lm
    from fewshot.models import transformer as tfm_mod
    from fewshot.data.vocab import EOS

    @jax.jit
    def step(params, key):
        ep = eps.sample_episode(key, data, split, cfg.batch_size,
                                k=cfg.support_size, q=cfg.query_size)
        b, q_, l_ = ep.query.shape
        inputs, targets, mask = lm.shift_targets(ep.query, ep.query_len)
        flat_inputs = inputs.reshape(b * q_, l_ - 1)
        flat_mask = mask.reshape(b * q_, l_ - 1)
        flat_targets = targets.reshape(b * q_, l_ - 1)
        v_total = params["embed"].shape[0]
        fused = lm.fused_head_eligible(params, cfg, v_total)

        if cfg.model == "transformer":
            bk, k_, sl = ep.support.shape
            prefix = ep.support.reshape(b, k_ * sl)
            prefix_mask = (jnp.arange(sl) <
                           ep.support_len[..., None]).reshape(b, k_ * sl)
            hidden = tfm_mod.transformer_prefix_forward(
                params["transformer"], lm.embed(params, prefix),
                prefix_mask,
                lm.embed(params, flat_inputs).reshape(b, q_, l_ - 1, -1),
                mask, cfg)
            hidden = hidden.reshape(b * q_, l_ - 1, -1)
            logits = None if fused else lm.head_logits(params, hidden, cfg)
        else:
            state = lm.support_state(params, ep.support, ep.support_len,
                                     cfg, eval_mode=True)
            state = [(jnp.repeat(h, q_, axis=0),
                      jnp.repeat(c, q_, axis=0)) for h, c in state]
            logits, _, hidden = lm.lm_logits(params, flat_inputs, cfg,
                                             mask=flat_mask, state=state,
                                             eval_mode=True,
                                             with_hidden=True,
                                             no_head=fused)
        counts = lm.support_counts(ep.support, ep.support_len, v_total)
        log_cache = lm.support_log_cache(params, ep.support,
                                         ep.support_len, v_total)
        counts = jnp.repeat(counts, q_, axis=0)
        log_cache = jnp.repeat(log_cache, q_, axis=0)

        if fused:
            lse, tl = lm.head_lse_target(params, hidden, flat_targets, cfg)
            lm_t = tl - lse
        else:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            lm_t = jnp.take_along_axis(logp, flat_targets[..., None],
                                       axis=-1)[..., 0]
        cache_t = jnp.take_along_axis(log_cache, flat_targets, axis=-1)
        z = (jnp.tensordot(hidden.astype(jnp.float32),
                           params["cache_gate"]["w"], axes=([-1], [0]))
             + params["cache_gate"]["b"])
        g = jax.nn.sigmoid(z)
        mixed_t = jnp.logaddexp(jax.nn.log_sigmoid(-z) + lm_t,
                                jax.nn.log_sigmoid(z) + cache_t)
        nll = -mixed_t                                      # [rows, T]

        seen = jnp.take_along_axis(counts, flat_targets, axis=-1) > 0
        is_slash = flat_targets == slash_id
        is_eos = flat_targets == EOS
        is_word = ~(is_slash | is_eos)
        bins = {
            "slash": is_slash,
            "eos": is_eos,
            "word_seen": is_word & seen,
            "word_unseen": is_word & ~seen,
        }
        out = {}
        for name, sel in bins.items():
            m = (sel & flat_mask).astype(jnp.float32)
            out[name] = (jnp.sum(nll * m), jnp.sum(m), jnp.sum(g * m))
        wm = (is_word & flat_mask).astype(jnp.float32)
        out["word_by_pos"] = (jnp.sum(nll * wm, axis=0), jnp.sum(wm, axis=0))
        return out

    return step


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus_dir",
                   default=str(REPO / "data" / "scale_lyrics" / "plain"))
    p.add_argument("--out",
                   default=str(REPO / "benchmarks" / "gap_analysis.json"))
    p.add_argument("--oracle_json",
                   default=str(REPO / "benchmarks" / "oracle_entropy.json"))
    p.add_argument("--max_steps", type=int, default=8000)
    p.add_argument("--eval_every", type=int, default=500)
    p.add_argument("--steps_per_call", type=int, default=10)
    p.add_argument("--patience", type=int, default=6)
    p.add_argument("--eval_episodes", type=int, default=512)
    p.add_argument("--cache_calib", action="store_true",
                   help="decompose the learned count-calibration leg")
    p.add_argument("--model", default="lstm",
                   choices=("lstm", "transformer"),
                   help="model family to retrain + decompose (r4: the "
                        "transformer cache stack is the best model — "
                        "where do ITS remaining nats live?)")
    args = p.parse_args(argv)

    from fewshot.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from fewshot import training
    from fewshot.config import Config
    from fewshot.data import episodes as eps
    from fewshot.data.corpus import PackedCorpus

    t_start = time.time()
    corpus = PackedCorpus.load(args.corpus_dir)
    cfg = Config(vocab_size=len(corpus.vocab), max_len=corpus.max_len,
                 embed_dim=256, hidden_dim=512, num_layers=2,
                 model=args.model,
                 batch_size=32, support_size=5, query_size=5, lr=1e-3,
                 support_mode="mean_state", cell="pallas",
                 support_cache=True, cache_backoff="global",
                 cache_calib=args.cache_calib,
                 compute_dtype="bfloat16",
                 eval_episodes=args.eval_episodes, max_steps=args.max_steps,
                 data_parallel=False)
    data = eps.put_corpus(corpus)
    train_split = jnp.asarray(corpus.splits["train"])
    val_split = jnp.asarray(corpus.splits["val"])
    test_split = jnp.asarray(corpus.splits["test"])

    # -- retrain the cache-global leg (scale_quality.json hyperparams) ----
    step_fn = training.make_train_step(cfg, data, train_split)
    chunk = training.make_multi_step(step_fn, args.steps_per_call)
    eval_step = training.make_eval_step(cfg, data, val_split)
    state = training.init_train_state(cfg, len(corpus.vocab))
    state, m = chunk(state)
    jax.block_until_ready(m["loss"])
    best = {"val": float("inf"), "step": 0, "params": state.params}
    stale, done = 0, args.steps_per_call
    while done < args.max_steps and stale < args.patience:
        target = min(done + args.eval_every, args.max_steps)
        while done < target:
            state, m = chunk(state)
            done += args.steps_per_call
        val = training.evaluate(cfg, state.params, data, val_split,
                                jax.random.PRNGKey(7),
                                num_episodes=args.eval_episodes,
                                eval_step=eval_step)
        print(json.dumps({"step": done, "val_nll": round(val, 4)}),
              flush=True)
        if val < best["val"] - 1e-4:
            best = {"val": val, "step": done, "params": state.params}
            stale = 0
        else:
            stale += 1

    # -- decomposed test eval --------------------------------------------
    slash_id = corpus.vocab.index["/"]
    dstep = make_decomposed_eval(cfg, data, test_split, slash_id)
    key = jax.random.PRNGKey(99)
    n_batches = max(1, args.eval_episodes // cfg.batch_size)
    outs = [dstep(best["params"], jax.random.fold_in(key, i))
            for i in range(n_batches)]
    outs = jax.device_get(outs)

    bins = {}
    for name in ("slash", "eos", "word_seen", "word_unseen"):
        s = sum(float(o[name][0]) for o in outs)
        c = sum(float(o[name][1]) for o in outs)
        gs = sum(float(o[name][2]) for o in outs)
        bins[name] = {"nll": round(s / c, 4), "count": int(c),
                      "mean_gate": round(gs / c, 4)}
    import numpy as np
    wp_s = np.sum([o["word_by_pos"][0] for o in outs], axis=0)
    wp_c = np.sum([o["word_by_pos"][1] for o in outs], axis=0)
    by_pos = [round(float(s / c), 3) if c >= 50 else None
              for s, c in zip(wp_s, wp_c)]

    total_nll = sum(float(o[n][0]) for o in outs
                    for n in ("slash", "eos", "word_seen", "word_unseen"))
    total_cnt = sum(float(o[n][1]) for o in outs
                    for n in ("slash", "eos", "word_seen", "word_unseen"))
    w_nll = bins["word_seen"]["nll"] * bins["word_seen"]["count"] \
        + bins["word_unseen"]["nll"] * bins["word_unseen"]["count"]
    w_cnt = bins["word_seen"]["count"] + bins["word_unseen"]["count"]
    s_nll = bins["slash"]["nll"] * bins["slash"]["count"] \
        + bins["eos"]["nll"] * bins["eos"]["count"]
    s_cnt = bins["slash"]["count"] + bins["eos"]["count"]

    oracle = {}
    op = Path(args.oracle_json)
    if op.exists():
        oracle = json.loads(op.read_text()).get("test", {})

    result = {
        "protocol": "retrained cache_backoff=global leg (scale_quality "
                    "hyperparams, early stopping), decomposed test eval "
                    "over the same episode sampler; gate = mean "
                    "sigmoid(cache gate) over the bin",
        "model_family": args.model,
        "cache_calib": args.cache_calib,
        "best_val_nll": round(best["val"], 4),
        "best_step": best["step"],
        "test_nll_total": round(total_nll / total_cnt, 4),
        "model": {
            "word_positions_nll": round(w_nll / w_cnt, 4),
            "structural_positions_nll": round(s_nll / s_cnt, 4),
            "bins": bins,
            "word_nll_by_position": by_pos,
        },
        "oracle": {
            "nll_per_token": oracle.get("oracle_nll_per_token"),
            "word_positions_nll": oracle.get("word_positions_nll"),
            "structural_positions_nll": oracle.get(
                "structural_positions_nll"),
        },
        "wall_sec": round(time.time() - t_start, 1),
    }
    Path(args.out).write_text(json.dumps(result, indent=1))
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
