"""LSTM backbone: TF-gate-order cell under `lax.scan` (golden path) with an
optional fused Pallas recurrence (`cell="pallas"`, fewshot/ops/lstm_pallas.py).

Reference equivalent (SURVEY.md §2 L3 "LSTM LM baseline", §4.5): embedding ->
multi-layer LSTMCell via dynamic_rnn.  Numerical-parity notes (SURVEY.md §8
hard-part #5): TF BasicLSTMCell gate order is (i, j, f, o), the forget-gate
bias +1.0 is added in-cell over a zero-initialized bias variable, and the
kernel is one glorot-uniform [E+H, 4H] matrix.  We reproduce all three so the
TF-2.21 golden-logit test can assert exact parity.

TPU-first structure: the input projection x @ Wx for ALL timesteps is one
big [B*T, E] x [E, 4H] matmul (MXU-friendly, done outside the scan); only
the sequential h @ Wh recurrence lives in the scan body.  PAD steps carry
state through unchanged via the mask, which is what makes support-state
priming correct on ragged songs.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp

FORGET_BIAS = 1.0


def init_lstm_params(key: jax.Array, input_dim: int, hidden_dim: int,
                     num_layers: int) -> list[dict[str, jax.Array]]:
    """Per-layer {wx: [in,4H], wh: [H,4H], b: [4H]}; glorot over [in+H,4H]."""
    params = []
    in_dim = input_dim
    for i in range(num_layers):
        key, sub = jax.random.split(key)
        w = jax.nn.initializers.glorot_uniform()(
            sub, (in_dim + hidden_dim, 4 * hidden_dim), jnp.float32)
        params.append({
            "wx": w[:in_dim],
            "wh": w[in_dim:],
            "b": jnp.zeros((4 * hidden_dim,), jnp.float32),
        })
        in_dim = hidden_dim
    return params


def zero_state(batch: int, hidden_dim: int,
               num_layers: int) -> list[tuple[jax.Array, jax.Array]]:
    z = jnp.zeros((batch, hidden_dim), jnp.float32)
    return [(z, z) for _ in range(num_layers)]


def lstm_gates(zx: jax.Array, h: jax.Array, c: jax.Array, wh: jax.Array,
               b: jax.Array, compute_dtype) -> tuple[jax.Array, jax.Array]:
    """One cell update given the precomputed input projection zx = x @ wx.

    TF gate order (i, j, f, o); fp32 accumulation regardless of compute dtype.
    """
    z = zx + jnp.dot(h.astype(compute_dtype), wh.astype(compute_dtype),
                     preferred_element_type=jnp.float32) + b
    i, j, f, o = jnp.split(z, 4, axis=-1)
    new_c = jax.nn.sigmoid(f + FORGET_BIAS) * c + \
        jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
    return new_h, new_c


def lstm_step(params: list[dict[str, jax.Array]], x: jax.Array,
              state: list[tuple[jax.Array, jax.Array]],
              compute_dtype: Any = jnp.float32):
    """Single-timestep multi-layer update for the sampling loop.

    x [B, E] -> (top-layer h [B, H], new per-layer state)."""
    new_state = []
    inp = x
    for layer, (h, c) in zip(params, state):
        zx = jnp.dot(inp.astype(compute_dtype),
                     layer["wx"].astype(compute_dtype),
                     preferred_element_type=jnp.float32)
        h, c = lstm_gates(zx, h, c, layer["wh"], layer["b"], compute_dtype)
        new_state.append((h, c))
        inp = h
    return inp, new_state


def _layer_scan(layer: dict[str, jax.Array], x: jax.Array,
                mask: jax.Array | None, h0c0: tuple[jax.Array, jax.Array],
                compute_dtype, zx: jax.Array | None = None
                ) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Run one LSTM layer over x [B, T, in].  Returns (ys [B,T,H], (h,c)).

    zx: optional precomputed input projection [B, T, 4H] (the embedding-
    folded fast path, models/lm.py); x is ignored when given."""
    if zx is None:
        b_, t_, _ = x.shape
        # Bulk input projection: one MXU matmul for the whole sequence.
        zx = jnp.dot(x.astype(compute_dtype),
                     layer["wx"].astype(compute_dtype),
                     preferred_element_type=jnp.float32)   # [B, T, 4H]
    else:
        b_, t_, _ = zx.shape
    zx_t = jnp.swapaxes(zx, 0, 1)                          # [T, B, 4H]
    mask_t = (jnp.swapaxes(mask, 0, 1)[..., None]
              if mask is not None else None)               # [T, B, 1]

    def step(carry, inp):
        h, c = carry
        if mask is None:
            zx_i = inp
            new_h, new_c = lstm_gates(zx_i, h, c, layer["wh"], layer["b"],
                                      compute_dtype)
        else:
            zx_i, m = inp
            new_h, new_c = lstm_gates(zx_i, h, c, layer["wh"], layer["b"],
                                      compute_dtype)
            new_h = jnp.where(m, new_h, h)
            new_c = jnp.where(m, new_c, c)
        return (new_h, new_c), new_h

    xs = zx_t if mask is None else (zx_t, mask_t)
    (h, c), ys = jax.lax.scan(step, h0c0, xs)
    return jnp.swapaxes(ys, 0, 1), (h, c)


def lstm_forward(params: list[dict[str, jax.Array]], x: jax.Array,
                 mask: jax.Array | None = None,
                 state: list[tuple[jax.Array, jax.Array]] | None = None,
                 compute_dtype: Any = jnp.float32,
                 cell: str = "scan", eval_mode: bool = False,
                 zx0: jax.Array | None = None):
    """Multi-layer LSTM over embeddings x [B, T, E].

    mask: [B, T] bool; False steps (padding) leave (h, c) unchanged.
    state: per-layer (h, c) initial carries (support-primed episodes).
    eval_mode: caller promises NOT to differentiate this call — the fused
    multi-layer kernel then qualifies at forward-only VMEM widths (no
    saved-gates stream), which covers the flagship H=512/L=2 shape that
    the train-mode footprint excludes.
    zx0: optional precomputed layer-0 input projection [B, T, 4H]; when
    given, x may be None (the embedding-folded fast path — models/lm.py
    computes zx0 = onehot @ (embed @ Wx_0) without materializing the
    [B, T, E] activations or their backward).
    Returns (top-layer outputs [B, T, H], final per-layer state).
    """
    b_ = (zx0 if x is None else x).shape[0]
    hidden = params[0]["wh"].shape[0]
    if state is None:
        state = zero_state(b_, hidden, len(params))
    if cell == "pallas":
        from fewshot.ops import lstm_fused
        if (not os.environ.get("FEWSHOT_NO_FUSED_STACK")
                and lstm_fused.stack_fused_supported(params, compute_dtype,
                                                     batch_rows=b_,
                                                     eval_mode=eval_mode)):
            # Whole-stack fused kernel: all layers advance inside one grid
            # step (half the sequential steps at L=2, no inter-layer HBM).
            return lstm_fused.lstm_stack_fused(params, x, mask, state,
                                               compute_dtype, zx0=zx0)
        from fewshot.ops.lstm_pallas import lstm_layer_pallas
        layer_fn = lstm_layer_pallas
    else:
        layer_fn = _layer_scan
    ys = x
    new_state = []
    for i, (layer, h0c0) in enumerate(zip(params, state)):
        ys, hc = layer_fn(layer, ys, mask, h0c0, compute_dtype,
                          zx=zx0 if i == 0 else None)
        new_state.append(hc)
    return ys, new_state
