"""Golden-parity harness vs TensorFlow (SURVEY.md §5.1, §8 hard-part #5).

The reference model is a TF LSTM LM; BASELINE.json:5 requires query NLL to
match "within numerical tolerance".  The original TF-1.x BasicLSTMCell uses
gate order (i, j, f, o) with an in-cell +1.0 forget bias; Keras LSTM uses
(i, f, c, o) with the forget bias folded into the bias variable — the
remapping below converts our parameters to Keras layout, so agreement here
certifies gate order, forget bias, and initializer-free cell math all at
once.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fewshot.config import Config
from fewshot.models import lm as lm_mod
from fewshot.models import lstm as lstm_mod

tf = pytest.importorskip("tensorflow")

CFG = Config(vocab_size=50, max_len=16, embed_dim=12, hidden_dim=20,
             num_layers=1, batch_size=4, support_size=2, query_size=1,
             tie_embeddings=False, data_parallel=False)


def _to_keras_weights(layer: dict) -> list[np.ndarray]:
    """(i, j, f, o) -> Keras (i, f, c, o), forget bias +1 folded in."""
    h = layer["wh"].shape[0]
    def remap(w):
        i, j, f, o = np.split(np.asarray(w), 4, axis=-1)
        return np.concatenate([i, f, j, o], axis=-1)
    bias = remap(layer["b"][None])[0].copy()
    bias[h:2 * h] += lstm_mod.FORGET_BIAS
    return [remap(layer["wx"]), remap(layer["wh"]), bias]


def test_lstm_cell_matches_keras():
    params = lstm_mod.init_lstm_params(jax.random.PRNGKey(0), 12, 20, 1)
    x = np.random.RandomState(0).randn(4, 10, 12).astype(np.float32)

    ys, state = lstm_mod.lstm_forward(params, jnp.asarray(x))
    hN, cN = state[0]

    keras_lstm = tf.keras.layers.LSTM(20, return_sequences=True,
                                      return_state=True)
    keras_lstm.build((None, None, 12))
    keras_lstm.set_weights(_to_keras_weights(params[0]))
    tf_ys, tf_h, tf_c = keras_lstm(tf.constant(x))

    np.testing.assert_allclose(np.asarray(ys), tf_ys.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(hN), tf_h.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(cN), tf_c.numpy(), atol=2e-5)


def test_full_lm_nll_matches_tf():
    """End-to-end golden NLL: embed -> LSTM -> dense -> masked CE."""
    params = lm_mod.init_lm(jax.random.PRNGKey(1), CFG, CFG.vocab_size)
    rng = np.random.RandomState(1)
    tokens = rng.randint(0, CFG.vocab_size, (4, 12)).astype(np.int32)
    lengths = np.array([12, 7, 3, 10], np.int32)

    ours = float(lm_mod.lm_nll(params, jnp.asarray(tokens),
                               jnp.asarray(lengths), CFG))

    # independent TF implementation of the same forward pass
    emb = tf.constant(np.asarray(params["embed"]))
    keras_lstm = tf.keras.layers.LSTM(CFG.hidden_dim, return_sequences=True)
    keras_lstm.build((None, None, CFG.embed_dim))
    keras_lstm.set_weights(_to_keras_weights(params["lstm"][0]))

    inputs, targets = tokens[:, :-1], tokens[:, 1:]
    mask = (np.arange(11)[None] < (lengths[:, None] - 1)).astype(np.float32)
    x = tf.nn.embedding_lookup(emb, inputs)
    hidden = keras_lstm(x)
    logits = tf.matmul(hidden, tf.constant(np.asarray(params["out_w"]))) \
        + tf.constant(np.asarray(params["out_b"]))
    ce = tf.nn.sparse_softmax_cross_entropy_with_logits(
        labels=targets.astype(np.int64), logits=logits)
    want = float(tf.reduce_sum(ce * mask) / tf.reduce_sum(mask))

    assert abs(ours - want) < 2e-5, (ours, want)
