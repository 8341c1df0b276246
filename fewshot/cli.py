"""Experiment drivers: train / evaluate / sample.

Reference equivalent (SURVEY.md §2 L4, §4.1-4.3): `train.py`, `evaluate.py`,
`sample.py` at the repo root, each invoked as
``python train.py --data=<yaml> --model=<yaml> --task=<yaml>
[--checkpt_dir=...]``.  The repo-root scripts here are thin wrappers over
these mains, so the reference command lines work unchanged.

Differences from the reference are all on the inside: the step loop issues
ONE device dispatch per step (episode sampling is fused into the train step),
eval aggregates exact (ce_sum, token_count) pairs, and sampling is a single
jitted program per batch of continuations.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from fewshot import sampling as sampling_mod
from fewshot import training
from fewshot.config import add_config_flags, load_config, parse_overrides
from fewshot.data import episodes as eps
from fewshot.data.corpus import PackedCorpus
from fewshot.data.lyrics import detokenize
from fewshot.data import midi as midi_mod
from fewshot.utils.ckpt import (hparams_of, recover_or_init,
                                 save_checkpoint, wait_for_checkpoints)
from fewshot.utils.metrics import MetricsLogger, Throughput


def _setup(argv, extra_flags=None):
    from fewshot.parallel.distributed import maybe_initialize
    from fewshot.utils.cache import enable_compilation_cache
    maybe_initialize()
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    add_config_flags(parser)
    if extra_flags:
        extra_flags(parser)
    args = parser.parse_args(argv)
    cfg = load_config(args.data, args.model, args.task,
                      parse_overrides(args.set))
    corpus_dir = Path(cfg.corpus_dir)
    if not (corpus_dir / "corpus.npz").exists():
        sys.exit(f"no packed corpus at {corpus_dir} — run "
                 f"scripts/prepare_data.py first (see README)")
    corpus = PackedCorpus.load(corpus_dir)
    if corpus.max_len != cfg.max_len:
        print(f"warning: corpus max_len={corpus.max_len} != config "
              f"max_len={cfg.max_len}; the packed corpus wins "
              f"(re-run scripts/prepare_data.py to change it)", flush=True)
    if corpus.vocab is not None and len(corpus.vocab) > cfg.vocab_size:
        sys.exit(f"corpus vocab ({len(corpus.vocab)}) exceeds config "
                 f"vocab_size ({cfg.vocab_size}); re-pack or raise the cap")
    return args, cfg, corpus


def _split_arg(cfg, corpus, split: str):
    """The sampler's index array: artist ids (episodic) or song pool (lm)."""
    if cfg.task == "episodic":
        return jnp.asarray(corpus.splits[split])
    return jnp.asarray(eps.split_song_pool(corpus, split))


def train_main(argv=None) -> None:
    def flags(p):
        p.add_argument("--profile_dir", type=str, default=None,
                       help="capture a jax.profiler trace of steps 10-20 "
                            "into this dir (view with TensorBoard)")
        p.add_argument("--debug_nans", action="store_true",
                       help="enable jax_debug_nans (SURVEY.md §6 sanitizer "
                            "analogue); fails fast on the first NaN")
        p.add_argument("--tensorboard", action="store_true",
                       help="also write TensorBoard scalars under "
                            "<checkpt_dir>/tb (SURVEY.md §6 observability)")
    args, cfg, corpus = _setup(argv, flags)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if (cfg.support_cache and cfg.cache_lm_aux == 0
            and cfg.cache_resp_floor == 0 and corpus.vocab is not None):
        # Measured starvation regime (benchmarks/midi_scale.json leg
        # plain_cache, RESULTS.md): when the K support songs already cover
        # ~all query tokens, the count posterior is near-optimal at init,
        # the gate routes to it, and the LM branch's mixture gradient is
        # scaled to ~1% — training silently freezes at the unigram floor.
        # Keyed on the MECHANISM (measured support coverage of query
        # targets), not a vocab-size proxy: MIDI plain/BPE sit at
        # 1.00/0.99 coverage (both collapse without a fix), lyrics
        # V=5000..20000 at 0.67-0.80 (safe).  Warn, don't refuse.
        # Either fix disarms the warning: cache_resp_floor (recommended —
        # r5 pre-registered decision, ROADMAP.md ledger #2) or
        # cache_lm_aux (escapes ~2.5x faster in steps; negative at
        # vocab scale where the floor is positive).
        from fewshot.data.corpus import support_coverage_estimate
        cov = support_coverage_estimate(corpus, cfg.support_size)
        if cov >= 0.95:
            print(f"warning: support_cache with measured support coverage "
                  f"{cov:.3f} of query tokens (V={len(corpus.vocab)}) and "
                  f"no starvation fix risks mixture gradient starvation "
                  f"(training freezes at the unigram floor) — set "
                  f"--set cache_resp_floor=0.25 (recommended; exactly "
                  f"inert where the mixture is healthy) or "
                  f"cache_lm_aux=1.0 (RESULTS.md, "
                  f"benchmarks/midi_scale.json)", flush=True)
    vocab_hash = corpus.vocab.content_hash() if corpus.vocab else ""
    if cfg.pipeline == "host" and cfg.task != "episodic":
        sys.exit("pipeline: host supports only task: episodic — use "
                 "pipeline: device for plain-LM training (task: lm)")
    host_mode = cfg.pipeline == "host"
    if not host_mode:
        # device pipeline: the whole corpus is HBM-resident (replicated over
        # the global mesh when running multi-process)
        from fewshot.parallel.mesh import make_mesh
        mesh = make_mesh() if cfg.data_parallel else None
        data = eps.put_corpus(corpus, mesh=mesh)
        train_split = _split_arg(cfg, corpus, "train")
        val_split = _split_arg(cfg, corpus, "val")

    state = training.init_train_state(cfg, len(corpus.vocab))
    state, restored = recover_or_init(args.checkpt_dir, state, vocab_hash,
                                      hparams=hparams_of(cfg))
    start_step = int(state.step)
    if restored:
        print(f"restored checkpoint at step {start_step}", flush=True)

    pipe = val_pipe = None
    if host_mode:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from fewshot.data.host_pipeline import HostEpisodePipeline
        from fewshot.parallel.mesh import AXIS, make_mesh
        mesh = make_mesh() if cfg.data_parallel else None
        sharding = (NamedSharding(mesh, P(AXIS))
                    if mesh is not None else None)
        # Fold the restored step into the seed so a resumed run draws FRESH
        # episodes instead of replaying the already-trained sequence (the
        # fused device path gets this for free by checkpointing the key).
        pipe = HostEpisodePipeline(corpus, "train", cfg.batch_size,
                                   cfg.support_size, cfg.query_size,
                                   seed=cfg.seed + start_step,
                                   sharding=sharding)
        train_step = training.make_fed_train_step(cfg, mesh=mesh)
        if cfg.eval_interval:
            val_pipe = HostEpisodePipeline(
                corpus, "val", cfg.batch_size, cfg.support_size,
                cfg.query_size, seed=cfg.seed + 1, prefetch=1)
            eval_step = training.make_fed_eval_step(cfg)
        else:
            eval_step = None
    else:
        train_step = training.make_train_step(cfg, data, train_split,
                                              mesh=mesh)
        eval_step = training.make_eval_step(cfg, data, val_split, mesh=mesh) \
            if cfg.eval_interval else None
    from fewshot.parallel.distributed import is_primary
    logger = MetricsLogger(args.checkpt_dir if is_primary() else None,
                           stdout=is_primary(), tensorboard=args.tensorboard)
    tput = Throughput()
    tput.start()
    # `step` is tracked on the HOST: reading state.step each iteration would
    # block on the just-dispatched device step and serialize host dispatch
    # with device compute (advisor finding r1).
    # steps_per_call > 1 fuses that many steps into ONE dispatched program
    # (lax.scan; training.make_multi_step) — config validation guarantees
    # every log/eval/checkpoint boundary falls on a chunk edge.  Host
    # pipeline and profiling keep per-step dispatch (the pipe feeds one
    # episode per call; the profiler brackets step indices).
    spc = 1 if (host_mode or args.profile_dir) else cfg.steps_per_call
    if start_step % spc:
        # A checkpoint written under a different steps_per_call would make
        # the chunked range() miss every log/eval/checkpoint boundary and
        # stop short of max_steps (advisor finding r2).
        sys.exit(f"restored step {start_step} is not a multiple of "
                 f"steps_per_call ({spc}) — resume with --set "
                 f"steps_per_call=<divisor of {start_step}> (e.g. 1) or "
                 f"the value the checkpoint was trained with")
    chunked = training.make_multi_step(train_step, spc)
    for step in range(start_step + spc, cfg.max_steps + 1, spc):
        if args.profile_dir and step == 10:
            jax.profiler.start_trace(args.profile_dir)
        state, metrics = (train_step(state, next(pipe)) if pipe is not None
                          else chunked(state))
        if args.profile_dir and step == 20:
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
            print(f"profile trace written to {args.profile_dir}", flush=True)
        tput.add(cfg.batch_size * spc)
        if step % cfg.log_interval == 0 or step == cfg.max_steps:
            jax.block_until_ready(metrics["loss"])
            logger.log(step, loss=metrics["loss"],
                       episodes_per_sec=tput.rate(),
                       tokens_per_sec=tput.rate()
                       * float(metrics["tokens"]) / cfg.batch_size,
                       grad_norm=metrics["grad_norm"])
            tput.start()
        if cfg.eval_interval and step % cfg.eval_interval == 0:
            if val_pipe is not None:
                nll = training.evaluate_fed(cfg, state.params, val_pipe,
                                            eval_step=eval_step)
            else:
                nll = training.evaluate(cfg, state.params, data, val_split,
                                        jax.random.PRNGKey(cfg.seed + step),
                                        eval_step=eval_step)
            logger.log(step, val_nll=nll)
        if args.checkpt_dir and cfg.checkpoint_interval and \
                step % cfg.checkpoint_interval == 0:
            save_checkpoint(args.checkpt_dir, state, vocab_hash,
                            hparams=hparams_of(cfg))
    if pipe is not None:
        pipe.close()
    if val_pipe is not None:
        val_pipe.close()
    if args.checkpt_dir:
        save_checkpoint(args.checkpt_dir, state, vocab_hash, block=True,
                        hparams=hparams_of(cfg))
        wait_for_checkpoints()
    logger.close()


def _print_base_token_nll(cfg, corpus, split: str, nll: float,
                          prefix: str, song_ids=None) -> None:
    """BPE-token NLL isn't comparable to base-token NLL; rescale by the
    compression ratio (exact in expectation over episodes) — over the
    split's song pool, or over the exact scored songs when given."""
    if not (corpus.merges and corpus.base_song_len is not None):
        return
    ratio = eps.base_token_ratio(corpus, split, song_ids=song_ids)
    scope = "set" if song_ids is not None else "split"
    print(f"{prefix}_nll_per_base_token={nll * ratio:.6f} "
          f"({scope} compression ratio {ratio:.3f})", flush=True)


def evaluate_main(argv=None) -> None:
    def flags(p):
        p.add_argument("--split", default="test",
                       choices=("train", "val", "test"))
        p.add_argument("--episodes", type=int, default=None)
        p.add_argument("--baseline", default=None, choices=("unigram",),
                       help="evaluate a non-neural sanity baseline instead")
        p.add_argument("--per_artist", action="store_true",
                       help="also print NLL broken down by artist")
        p.add_argument("--eval_set", type=str, default=None,
                       help="score a FIXED episode set (npz from "
                            "scripts/make_eval_set.py) — identical result "
                            "across runs/batch sizes/pipelines")
        p.add_argument("--also_split_eval", action="store_true",
                       help="with --eval_set: ALSO run the random-split "
                            "eval afterwards (off by default; one "
                            "invocation = one advertised result)")
    args, cfg, corpus = _setup(argv, flags)
    # Same global-mesh treatment as train_main: the corpus must be replicated
    # over the GLOBAL mesh for multi-process runs, and eval batches are
    # sharded (psum'd ce_sum/count) so hosts split the work.
    from fewshot.parallel.mesh import make_mesh
    mesh = make_mesh() if cfg.data_parallel else None
    data = eps.put_corpus(corpus, mesh=mesh)
    split = _split_arg(cfg, corpus, args.split)
    if args.baseline == "unigram":
        if cfg.task != "episodic":
            sys.exit("--baseline unigram requires task=episodic (it scores "
                     "support-conditioned episodes)")
        from fewshot.models.unigram import evaluate_unigram
        nll = evaluate_unigram(cfg, corpus, data, split,
                               jax.random.PRNGKey(cfg.seed), args.episodes,
                               mesh=mesh)
        print(f"{args.split}_nll_per_token={nll:.6f} (unigram baseline)",
              flush=True)
        return
    state = training.init_train_state(cfg, len(corpus.vocab))
    vocab_hash = corpus.vocab.content_hash() if corpus.vocab else ""
    state, restored = recover_or_init(args.checkpt_dir, state, vocab_hash,
                                      hparams=hparams_of(cfg))
    if args.checkpt_dir and not restored:
        sys.exit(f"no checkpoint found in {args.checkpt_dir}")
    if args.eval_set:
        if cfg.task != "episodic":
            sys.exit("--eval_set requires task=episodic")
        ids, arts, k, q = eps.load_episode_set(args.eval_set)
        if (k, q) != (cfg.support_size, cfg.query_size):
            sys.exit(f"eval set was built for K={k} Q={q}, config has "
                     f"K={cfg.support_size} Q={cfg.query_size}")
        step = training.make_fed_eval_step(cfg)
        b = cfg.batch_size
        # dispatch all batches, one readback (see training.evaluate)
        stats = [step(state.params,
                      eps.gather_episode(data, jnp.asarray(ids[lo:lo + b]),
                                         jnp.asarray(arts[lo:lo + b]), k, q))
                 for lo in range(0, len(ids), b)]
        total = float(sum(t for t, _ in stats))
        count = float(sum(c for _, c in stats))
        nll = total / max(count, 1.0)
        print(f"eval_set_nll_per_token={nll:.6f} "
              f"({len(ids)} fixed episodes from {args.eval_set})",
              flush=True)
        # rescale over the SET's own query songs, not the --split pool —
        # the set may come from a different split than --split defaults to
        _print_base_token_nll(cfg, corpus, args.split, nll,
                              prefix="eval_set",
                              song_ids=np.asarray(ids)[:, k:].ravel())
        if not args.also_split_eval:
            # One invocation, one advertised result: the random-split eval
            # is a SECOND, different metric and runs only on request
            # (r2 verdict weak-#2).
            return
    nll = training.evaluate(cfg, state.params, data, split,
                            jax.random.PRNGKey(cfg.seed),
                            num_episodes=args.episodes, mesh=mesh)
    print(f"{args.split}_nll_per_token={nll:.6f}", flush=True)
    _print_base_token_nll(cfg, corpus, args.split, nll, prefix=args.split)
    if args.per_artist and cfg.task == "episodic":
        # Per-artist breakdown: episodes drawn from each artist alone.  The
        # artist array is a TRACED argument so one compile serves them all.
        @jax.jit
        def one_eval(params, key, artist_arr):
            return training._loss_stats(params, cfg, data, artist_arr, key,
                                        cfg.batch_size)

        n = args.episodes or cfg.eval_episodes
        n_batches = max(1, n // cfg.batch_size)
        for a in np.asarray(split):
            one = jnp.asarray([int(a)], jnp.int32)
            # dispatch all batches, one readback (see training.evaluate)
            stats = [one_eval(state.params,
                              jax.random.fold_in(
                                  jax.random.PRNGKey(cfg.seed), i), one)
                     for i in range(n_batches)]
            total = float(sum(t for t, _ in stats))
            count = float(sum(c for _, c in stats))
            name = (corpus.artist_names[int(a)] if corpus.artist_names
                    else str(int(a)))
            print(f"  artist {name}: nll={total / max(count, 1.0):.4f}",
                  flush=True)


def sample_main(argv=None) -> None:
    def flags(p):
        p.add_argument("--out", type=str, default="samples",
                       help="output dir for .txt / .mid continuations")
        p.add_argument("--num", type=int, default=4,
                       help="number of continuations")
        p.add_argument("--split", default="test",
                       choices=("train", "val", "test"))
    args, cfg, corpus = _setup(argv, flags)
    # Multi-process runs compute the SAME replicated samples on every host
    # (deterministic given the key); only the primary writes files.
    from fewshot.parallel.mesh import make_mesh
    mesh = make_mesh() if cfg.data_parallel else None
    data = eps.put_corpus(corpus, mesh=mesh)
    split = _split_arg(cfg, corpus, args.split)
    state = training.init_train_state(cfg, len(corpus.vocab))
    vocab_hash = corpus.vocab.content_hash() if corpus.vocab else ""
    state, restored = recover_or_init(args.checkpt_dir, state, vocab_hash,
                                      hparams=hparams_of(cfg))
    if args.checkpt_dir and not restored:
        sys.exit(f"no checkpoint found in {args.checkpt_dir}")

    key = jax.random.PRNGKey(cfg.seed)
    k_ep, k_gen = jax.random.split(key)
    ep = eps.sample_episode(k_ep, data, split, args.num,
                            k=cfg.support_size, q=cfg.query_size)
    token_masks = None
    if cfg.dataset == "midi" and cfg.grammar_sampling and not corpus.merges:
        # grammar masks assume atomic events; BPE-merged tokens opt out
        token_masks = jnp.asarray(midi_mod.grammar_masks(corpus.vocab))
    toks = sampling_mod.generate(state.params, ep.support, ep.support_len,
                                 k_gen, cfg, token_masks=token_masks)
    toks = np.asarray(jax.device_get(toks))

    from fewshot.parallel.distributed import is_primary
    if not is_primary():
        return
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for i in range(args.num):
        artist = (corpus.artist_names[int(ep.artist[i])]
                  if corpus.artist_names else str(int(ep.artist[i])))
        ids = toks[i]
        if corpus.merges:
            from fewshot.data import bpe
            ids = bpe.expand(ids, corpus.merges)
        words = corpus.vocab.decode(ids)
        if cfg.dataset == "midi":
            notes = midi_mod.events_to_notes(words)
            path = out / f"sample_{i:02d}_{artist}.mid"
            midi_mod.write_midi(notes, path)
        else:
            path = out / f"sample_{i:02d}_{artist}.txt"
            path.write_text(detokenize(words) + "\n")
        print(f"wrote {path}", flush=True)
