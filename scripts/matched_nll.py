#!/usr/bin/env python
"""Matched-NLL experiment: prove the >=50x target AT EQUAL QUALITY.

The north-star target (BASELINE.json:5) is ">=50x episodes/sec ... at
matched per-token query NLL".  bench.py measures the throughput half; this
script closes the quality half with an experiment instead of an assertion:

  1. Train the faithful CPU reference (scripts/cpu_reference.py
     architecture: TF LSTM, ONE episode/step, Python episode assembly,
     support-concat state priming) for --cpu_steps, snapshotting weights.
  2. Convert every TF snapshot to our parameter layout (the inverse of
     tests/test_tf_parity.py's Keras remap) and score it with the SAME
     jitted eval harness (fixed val episodes, exact masked (ce_sum, count)).
  3. Train the TPU path (support_mode=state — the same concat-prime
     conditioning — cell=pallas) with the same eval cadence.
  4. Report wall-clock-to-matched-NLL: the time each side takes to reach
     the CPU run's best val NLL.  Only TRAIN time counts on both sides
     (snapshot/eval instrumentation is clocked out).

Writes benchmarks/matched_nll.json; bench.py folds the headline speedup
into its one-line JSON when the file exists.
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


def _keras_to_ours(kernel, recurrent, bias, forget_bias: float):
    """Inverse of tests/test_tf_parity.py:_to_keras_weights.

    Keras gate order (i, f, c, o) with forget bias folded into the bias
    variable -> our (i, j, f, o) with the +1.0 applied in-cell."""
    def remap(w):
        i, f, c, o = np.split(np.asarray(w), 4, axis=-1)
        return np.concatenate([i, c, f, o], axis=-1)
    h = recurrent.shape[0]
    b = np.asarray(bias).copy()
    b[h:2 * h] -= forget_bias
    return remap(kernel), remap(recurrent), remap(b[None])[0]


def train_cpu_reference(corpus, cfg, steps: int, snapshot_every: int,
                        seed: int):
    """The reference architecture (scripts/cpu_reference.py), instrumented.

    Yields (episodes_seen, train_seconds, params_jax) snapshots; the clock
    stops while weights are exported."""
    import tensorflow as tf
    tf.config.set_visible_devices([], "GPU")
    from fewshot.models.lstm import FORGET_BIAS

    vocab_size = len(corpus.vocab)
    max_len = corpus.max_len
    k, q = cfg.support_size, cfg.query_size

    train_artists = [int(a) for a in corpus.splits["train"]]
    songs_by_artist = {
        a: [np.asarray(corpus.songs[i][: int(corpus.song_len[i])])
            for i in corpus.artist_song_ids[a][
                : int(corpus.artist_num_songs[a])]]
        for a in train_artists
    }
    rng = np.random.RandomState(seed)

    def get_episode():
        artist = train_artists[rng.randint(len(train_artists))]
        pool = songs_by_artist[artist]
        idx = rng.choice(len(pool), size=min(k + q, len(pool)),
                         replace=False)
        while len(idx) < k + q:
            idx = np.concatenate([idx, rng.choice(len(pool), size=1)])
        picked = [pool[i] for i in idx]
        batch = np.zeros((k + q, max_len), np.int32)
        lens = np.zeros((k + q,), np.int32)
        for j, s in enumerate(picked):
            s = s[:max_len]
            batch[j, : len(s)] = s
            lens[j] = len(s)
        return batch[:k], lens[:k], batch[k:], lens[k:]

    tf.random.set_seed(seed)
    embed = tf.Variable(tf.random.normal([vocab_size, cfg.embed_dim],
                                         stddev=0.02))
    cells = [tf.keras.layers.LSTMCell(cfg.hidden_dim)
             for _ in range(cfg.num_layers)]
    rnn = tf.keras.layers.RNN(cells, return_sequences=True,
                              return_state=True)
    rnn.build((None, None, cfg.embed_dim))
    dense = tf.keras.layers.Dense(vocab_size)
    dense.build((None, cfg.hidden_dim))
    opt = tf.keras.optimizers.Adam(cfg.lr)
    variables = ([embed] + rnn.trainable_variables
                 + dense.trainable_variables)

    spec = [
        tf.TensorSpec([k, max_len], tf.int32),
        tf.TensorSpec([k], tf.int32),
        tf.TensorSpec([q, max_len], tf.int32),
        tf.TensorSpec([q], tf.int32),
    ]

    @tf.function(input_signature=spec, reduce_retracing=True)
    def train_step(sup, sup_len, qry, qry_len):
        flat = tf.reshape(sup, [1, k * max_len])
        smask = tf.reshape(tf.sequence_mask(sup_len, max_len),
                           [1, k * max_len])
        with tf.GradientTape() as tape:
            sx = tf.nn.embedding_lookup(embed, flat)
            out = rnn(sx, mask=smask)
            state = out[1:]
            tiled = tf.nest.map_structure(lambda t: tf.tile(t, [q, 1]),
                                          state)
            inputs, targets = qry[:, :-1], qry[:, 1:]
            mask = tf.cast(tf.sequence_mask(qry_len - 1, max_len - 1),
                           tf.float32)
            qx = tf.nn.embedding_lookup(embed, inputs)
            hidden = rnn(qx, initial_state=tiled)[0]
            logits = dense(hidden)
            ce = tf.nn.sparse_softmax_cross_entropy_with_logits(
                labels=tf.cast(targets, tf.int64), logits=logits)
            loss = tf.reduce_sum(ce * mask) / tf.maximum(
                tf.reduce_sum(mask), 1.0)
        grads = tape.gradient(loss, variables)
        opt.apply_gradients(zip(grads, variables))
        return loss

    def export_params():
        import jax.numpy as jnp
        layers = []
        for cell in cells:
            kern, rec, bias = [w.numpy() for w in cell.weights]
            wx, wh, b = _keras_to_ours(kern, rec, bias, FORGET_BIAS)
            layers.append({"wx": jnp.asarray(wx), "wh": jnp.asarray(wh),
                           "b": jnp.asarray(b)})
        return {"embed": jnp.asarray(embed.numpy()),
                "lstm": layers,
                "out_w": jnp.asarray(dense.kernel.numpy()),
                "out_b": jnp.asarray(dense.bias.numpy())}

    # graph build outside the clock (the reference pays this once too)
    train_step(*[tf.constant(x) for x in get_episode()])
    train_sec = 0.0
    for step in range(1, steps + 1):
        ep = get_episode()
        t0 = time.perf_counter()
        train_step(*[tf.constant(x) for x in ep])
        train_sec += time.perf_counter() - t0
        if step % snapshot_every == 0 or step == steps:
            yield step, train_sec, export_params()


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", default=str(REPO / "data" / "bench_lyrics_v2"))
    p.add_argument("--out", default=str(REPO / "benchmarks" /
                                        "matched_nll.json"))
    p.add_argument("--cpu_steps", type=int, default=360)
    p.add_argument("--snapshot_every", type=int, default=60)
    p.add_argument("--tpu_steps", type=int, default=400)
    p.add_argument("--tpu_eval_every", type=int, default=5)
    p.add_argument("--eval_episodes", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    from fewshot import training
    from fewshot.config import Config
    from fewshot.data import episodes as eps
    from fewshot.data.corpus import PackedCorpus
    from fewshot.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    corpus_dir = Path(args.corpus)
    if not (corpus_dir / "corpus.npz").exists():
        sys.path.insert(0, str(REPO))
        import bench
        bench.ensure_corpus()
    corpus = PackedCorpus.load(corpus_dir)

    # Identical architecture on both sides: concat-prime conditioning
    # (support_mode=state == the TF reference's semantics), 5-shot shape.
    base = dict(vocab_size=len(corpus.vocab), max_len=corpus.max_len,
                embed_dim=256, hidden_dim=512, num_layers=2,
                batch_size=32, support_size=5, query_size=5, lr=1e-3,
                support_mode="state", tie_embeddings=False,
                eval_episodes=args.eval_episodes, data_parallel=False)
    cfg_eval = Config(**base, cell="scan")           # eval: same for both
    cfg_tpu = Config(**base, cell="pallas", compute_dtype="bfloat16")

    data = eps.put_corpus(corpus)
    import jax.numpy as jnp
    val_split = jnp.asarray(corpus.splits["val"])
    eval_step = training.make_eval_step(cfg_eval, data, val_split)
    eval_key = jax.random.PRNGKey(args.seed + 999)

    def val_nll(params):
        return training.evaluate(cfg_eval, params, data, val_split,
                                 eval_key, eval_step=eval_step)

    # ---- CPU reference, snapshot curve --------------------------------
    print("training CPU reference (this is the slow part)...", flush=True)
    cpu_curve = []
    for step, sec, params in train_cpu_reference(
            corpus, cfg_eval, args.cpu_steps, args.snapshot_every,
            args.seed):
        nll = float(val_nll(params))
        cpu_curve.append({"episodes": step, "train_sec": round(sec, 2),
                          "val_nll": round(nll, 4)})
        print(f"  cpu: {step} episodes, {sec:7.1f}s train, "
              f"val_nll={nll:.4f}", flush=True)

    target = min(c["val_nll"] for c in cpu_curve)
    cpu_time_to_target = next(c["train_sec"] for c in cpu_curve
                              if c["val_nll"] <= target)
    cpu_eps_to_target = next(c["episodes"] for c in cpu_curve
                             if c["val_nll"] <= target)

    # ---- TPU path, same eval --------------------------------------------
    print(f"training TPU path to target val_nll <= {target:.4f}...",
          flush=True)
    state = training.init_train_state(cfg_tpu, len(corpus.vocab),
                                      seed=args.seed)
    train_split = jnp.asarray(corpus.splits["train"])
    train_step = training.make_train_step(cfg_tpu, data, train_split)
    # compile outside the clock (mirrors the TF graph build above)
    state, _ = train_step(state)
    jax.block_until_ready(_["loss"])
    state = training.init_train_state(cfg_tpu, len(corpus.vocab),
                                      seed=args.seed)

    tpu_curve = []
    tpu_time_to_target = None
    tpu_eps_to_target = None
    train_sec = 0.0
    for step in range(1, args.tpu_steps + 1):
        t0 = time.perf_counter()
        state, metrics = train_step(state)
        jax.block_until_ready(metrics["loss"])
        train_sec += time.perf_counter() - t0
        if step % args.tpu_eval_every == 0:
            nll = float(val_nll(state.params))
            episodes = step * cfg_tpu.batch_size
            tpu_curve.append({"episodes": episodes,
                              "train_sec": round(train_sec, 4),
                              "val_nll": round(nll, 4)})
            if nll <= target and tpu_time_to_target is None:
                tpu_time_to_target = train_sec
                tpu_eps_to_target = episodes
                print(f"  tpu: target reached at {episodes} episodes, "
                      f"{train_sec:.3f}s train, val_nll={nll:.4f}",
                      flush=True)
                break
            if step % 50 == 0:
                print(f"  tpu: {episodes} episodes, {train_sec:.3f}s, "
                      f"val_nll={nll:.4f}", flush=True)

    result = {
        "target_val_nll": target,
        "cpu": {"train_sec_to_target": cpu_time_to_target,
                "episodes_to_target": cpu_eps_to_target,
                "curve": cpu_curve,
                "impl": "tf-cpu single-episode reference (SURVEY.md §4.1)"},
        "tpu": {"train_sec_to_target": tpu_time_to_target,
                "episodes_to_target": tpu_eps_to_target,
                "curve": tpu_curve,
                "impl": "fused pallas train step, support_mode=state"},
        "speedup_time_to_matched_nll": (
            round(cpu_time_to_target / tpu_time_to_target, 1)
            if tpu_time_to_target else None),
        "shape": {k: base[k] for k in ("embed_dim", "hidden_dim",
                                       "num_layers", "support_size",
                                       "query_size", "max_len")},
        "corpus": str(corpus_dir),
        "eval": {"episodes": args.eval_episodes, "split": "val",
                 "note": "identical jitted eval harness + key both sides; "
                         "TF snapshots remapped to our params"},
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(result, indent=2))
    print(json.dumps({k: result[k] for k in
                      ("target_val_nll", "speedup_time_to_matched_nll")}))
    if tpu_time_to_target is None:
        print("WARNING: TPU run did not reach the CPU target "
              "(raise --tpu_steps)", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
