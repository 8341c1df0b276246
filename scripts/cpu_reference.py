#!/usr/bin/env python
"""Faithful CPU reference path — the baseline the TPU rebuild must beat.

The reference publishes no numbers (BASELINE.md), so per SURVEY.md §7 we
measure our own baseline by reproducing the reference's architecture
faithfully (SURVEY.md §4.1):

  * ONE episode per step (no meta-batching — that is the rebuild's
    innovation, BASELINE.json:5);
  * per-step episode assembly in Python: pick artist, draw K+Q songs
    without replacement from Python lists, pad/truncate, np.stack;
  * TensorFlow LSTM LM on CPU: support concat primes the state, query
    songs are scored with masked mean CE; Adam.  The train step runs
    inside ONE tf.function (graph mode) — the TF-1.x sess.run equivalent,
    if anything slightly faster than the original feed_dict loop.

Writes benchmarks/cpu_reference.json: {episodes_per_sec, nll, config...}.
bench.py reads that file to compute vs_baseline.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True, help="packed corpus dir")
    p.add_argument("--out", default="benchmarks/cpu_reference.json")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--support_size", type=int, default=5)
    p.add_argument("--query_size", type=int, default=5)
    p.add_argument("--embed_dim", type=int, default=256)
    p.add_argument("--hidden_dim", type=int, default=512)
    p.add_argument("--num_layers", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import tensorflow as tf
    tf.config.set_visible_devices([], "GPU")
    from fewshot.data.corpus import PackedCorpus

    corpus = PackedCorpus.load(args.corpus)
    vocab_size = len(corpus.vocab)
    max_len = corpus.max_len
    k, q = args.support_size, args.query_size

    # Python-side per-artist song lists — the reference's in-memory layout.
    train_artists = [int(a) for a in corpus.splits["train"]]
    songs_by_artist = {
        a: [np.asarray(corpus.songs[i][: int(corpus.song_len[i])])
            for i in corpus.artist_song_ids[a][: int(corpus.artist_num_songs[a])]]
        for a in train_artists
    }
    rng = np.random.RandomState(args.seed)

    def get_episode():
        """Reference-style Python episode assembly (SURVEY.md §4.1)."""
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

    # TF LSTM LM (graph-compiled train step = the sess.run analogue).
    tf.random.set_seed(args.seed)
    embed = tf.Variable(tf.random.normal([vocab_size, args.embed_dim],
                                         stddev=0.02))
    cells = [tf.keras.layers.LSTMCell(args.hidden_dim)
             for _ in range(args.num_layers)]
    rnn = tf.keras.layers.RNN(cells, return_sequences=True,
                              return_state=True)
    rnn.build((None, None, args.embed_dim))
    dense = tf.keras.layers.Dense(vocab_size)
    dense.build((None, args.hidden_dim))
    opt = tf.keras.optimizers.Adam(args.lr)
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
        # support concat -> priming state (1 stream, reference style)
        flat = tf.reshape(sup, [1, k * max_len])
        sup_mask = tf.sequence_mask(sup_len, max_len)
        smask = tf.reshape(sup_mask, [1, k * max_len])
        with tf.GradientTape() as tape:
            sx = tf.nn.embedding_lookup(embed, flat)
            out = rnn(sx, mask=smask)
            state = out[1:]
            # broadcast the primed state over the q query songs
            tiled = tf.nest.map_structure(
                lambda t: tf.tile(t, [q, 1]), state)
            inputs, targets = qry[:, :-1], qry[:, 1:]
            mask = tf.cast(
                tf.sequence_mask(qry_len - 1, max_len - 1), tf.float32)
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

    # warmup (includes graph build)
    for _ in range(args.warmup):
        loss = train_step(*[tf.constant(x) for x in get_episode()])
    t0 = time.perf_counter()
    losses = []
    for _ in range(args.steps):
        loss = train_step(*[tf.constant(x) for x in get_episode()])
        losses.append(float(loss))
    dt = time.perf_counter() - t0
    eps = args.steps / dt   # 1 episode per step

    result = {
        "episodes_per_sec": eps,
        "steps": args.steps,
        "seconds": dt,
        "final_nll": losses[-1],
        "vocab_size": vocab_size,
        "max_len": max_len,
        "support_size": k,
        "query_size": q,
        "embed_dim": args.embed_dim,
        "hidden_dim": args.hidden_dim,
        "num_layers": args.num_layers,
        "impl": "tf-cpu single-episode reference (SURVEY.md §4.1)",
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
