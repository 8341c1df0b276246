"""Fused head+CE kernel (fewshot/ops/head_ce.py): parity vs the explicit
logits path, off-chip via Pallas interpret mode (subprocess — the flag is
read at module import).  On-chip parity runs in scripts/tpu_checks.py."""

import os
import subprocess
import sys
from pathlib import Path


def _run(code: str, **extra_env: str) -> None:
    env = dict(os.environ, FEWSHOT_PALLAS_INTERPRET="1", JAX_PLATFORMS="cpu",
               **extra_env)
    out = subprocess.run([sys.executable, "-c", code],
                         cwd=Path(__file__).resolve().parent.parent, env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0 and "OK" in out.stdout, \
        out.stdout[-2000:] + out.stderr[-2000:]


def test_head_lse_tgt_interpret_parity():
    """Kernel (lse, target-logit) + grads == dense logits formulation,
    including ragged shapes that force row and vocab padding."""
    _run(r"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from fewshot.ops.head_ce import head_lse_tgt, fused_head_nll_supported

rng = np.random.RandomState(0)
for (r, d, v) in [(64, 128, 2000), (100, 256, 1537), (8, 128, 1100)]:
    assert fused_head_nll_supported(d, v)
    h2 = jnp.asarray(rng.randn(r, d), jnp.float32) * 0.3
    w = jnp.asarray(rng.randn(d, v), jnp.float32) * 0.1
    b = jnp.asarray(rng.randn(v), jnp.float32) * 0.1
    tgt = jnp.asarray(rng.randint(0, v, r), jnp.int32)
    mask = jnp.asarray(rng.rand(r) < 0.8, jnp.float32)

    def dense(h2, w, b):
        logits = h2 @ w + b
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        tl = jnp.take_along_axis(logits, tgt[:, None], axis=-1)[:, 0]
        return lse, tl

    lse_k, tl_k = head_lse_tgt(h2, w, b, tgt)
    lse_r, tl_r = dense(h2, w, b)
    assert float(jnp.abs(lse_k - lse_r).max()) < 1e-4, (r, d, v)
    assert float(jnp.abs(tl_k - tl_r).max()) < 1e-4, (r, d, v)

    # grads of the actual loss shape: sum(mask * (lse - tl)) — plus an
    # asymmetric extra term so dlse != -dtl exercises both cotangents
    def loss(fn, h2, w, b):
        lse, tl = fn(h2, w, b)
        return jnp.sum(mask * (lse - tl)) + 0.3 * jnp.sum(mask * lse)
    gk = jax.grad(lambda *a: loss(lambda *x: head_lse_tgt(*x, tgt), *a),
                  argnums=(0, 1, 2))(h2, w, b)
    gr = jax.grad(lambda *a: loss(dense, *a), argnums=(0, 1, 2))(h2, w, b)
    for a, (k_, r_) in zip("h2 w b".split(), zip(gk, gr)):
        scale = float(jnp.abs(r_).max()) + 1e-12
        assert float(jnp.abs(k_ - r_).max()) / scale < 2e-4, (a, r, d, v)
print("OK")
""")


_TILED_PARITY = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from fewshot.ops.head_ce import head_lse_tgt, fused_head_nll_supported, _plan

# the forced plan must actually be the tiled one, with >1 vocab tile at
# these shapes (vt pinned to 256) so the online-softmax merge runs
assert _plan(100, 256, 1537, 4, True)[0] == "tiled"
rng = np.random.RandomState(0)
for (r, d, v) in [(64, 128, 2000), (100, 256, 1537), (8, 128, 1100)]:
    assert fused_head_nll_supported(d, v)
    h2 = jnp.asarray(rng.randn(r, d), jnp.float32) * 0.3
    w = jnp.asarray(rng.randn(d, v), jnp.float32) * 0.1
    b = jnp.asarray(rng.randn(v), jnp.float32) * 0.1
    tgt = jnp.asarray(rng.randint(0, v, r), jnp.int32)
    mask = jnp.asarray(rng.rand(r) < 0.8, jnp.float32)

    def dense(h2, w, b):
        logits = h2 @ w + b
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        tl = jnp.take_along_axis(logits, tgt[:, None], axis=-1)[:, 0]
        return lse, tl

    lse_k, tl_k = head_lse_tgt(h2, w, b, tgt)
    lse_r, tl_r = dense(h2, w, b)
    assert float(jnp.abs(lse_k - lse_r).max()) < 1e-4, (r, d, v)
    assert float(jnp.abs(tl_k - tl_r).max()) < 1e-4, (r, d, v)

    def loss(fn, h2, w, b):
        lse, tl = fn(h2, w, b)
        return jnp.sum(mask * (lse - tl)) + 0.3 * jnp.sum(mask * lse)
    gk = jax.grad(lambda *a: loss(lambda *x: head_lse_tgt(*x, tgt), *a),
                  argnums=(0, 1, 2))(h2, w, b)
    gr = jax.grad(lambda *a: loss(dense, *a), argnums=(0, 1, 2))(h2, w, b)
    for a, (k_, r_) in zip("h2 w b".split(), zip(gk, gr)):
        scale = float(jnp.abs(r_).max()) + 1e-12
        assert float(jnp.abs(k_ - r_).max()) / scale < 2e-4, (a, r, d, v)
print("OK")
"""


def test_head_lse_tgt_tiled_parity():
    """The vocab-tiled plan (V>>5000 fallback, forced via env at small
    shapes with a 256-wide vocab tile): online-softmax forward and the
    two transposed-grid backward sweeps match the dense formulation,
    including shapes that force row and vocab-tile padding."""
    _run(_TILED_PARITY, FEWSHOT_HEAD_CE_FORCE_TILED="1",
         FEWSHOT_HEAD_CE_VT="256")


def test_plan_covers_v20k():
    """At the V=20k frontier shape the resident plan must refuse (its
    [D,Vp] + f32 accumulator residency is ~31MB) and the tiled plan must
    engage — i.e. fused_head_nll_supported stays True past the resident
    envelope instead of dropping to the dense [rows, V] HBM path."""
    _run(r"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from fewshot.ops.head_ce import _plan, _row_tile, _round_up, \
    fused_head_nll_supported
assert _row_tile(512, 256, _round_up(20000, 128), 2, train=True) == 0
mode, rt, vp, vt = _plan(512, 256, 20000, 2, train=True)
assert mode == "tiled" and rt >= 128 and vp % vt == 0
assert fused_head_nll_supported(256, 20000)
assert fused_head_nll_supported(256, 200000)   # no V cap at all now
print("OK")
""")


_E2E_CODE = r"""
import dataclasses
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree
from fewshot.config import Config
from fewshot.data.episodes import Episode
from fewshot.models import lm

V = 2000   # > ONEHOT_VOCAB_MAX -> large-vocab paths on both sides
for cache in (False, True):
    cfg_f = Config(vocab_size=V, max_len=12, embed_dim=128, hidden_dim=128,
                   num_layers=1, batch_size=2, support_size=3, query_size=2,
                   support_mode="mean_state", support_cache=cache,
                   cell="pallas", data_parallel=False)
    cfg_r = dataclasses.replace(cfg_f, cell="scan")
    assert lm.fused_head_eligible(
        lm.init_lm(jax.random.PRNGKey(0), cfg_f, V), cfg_f, V)
    params = lm.init_lm(jax.random.PRNGKey(0), cfg_f, V)
    rng = np.random.RandomState(1)
    ep = Episode(jnp.asarray(rng.randint(3, V, (2, 3, 12)), jnp.int32),
                 jnp.asarray(rng.randint(4, 13, (2, 3)), jnp.int32),
                 jnp.asarray(rng.randint(3, V, (2, 2, 12)), jnp.int32),
                 jnp.asarray(rng.randint(4, 13, (2, 2)), jnp.int32),
                 jnp.zeros((2,), jnp.int32))

    def nll(p, cfg):
        t, c = lm.episodic_nll_stats(p, ep, cfg)
        return t / c
    n_f = float(nll(params, cfg_f))
    n_r = float(nll(params, cfg_r))
    assert abs(n_f - n_r) < 1e-4, (cache, n_f, n_r)
    g_f = jax.grad(lambda p: nll(p, cfg_f))(params)
    g_r = jax.grad(lambda p: nll(p, cfg_r))(params)
    flat_f, _ = ravel_pytree(g_f)
    flat_r, _ = ravel_pytree(g_r)
    scale = float(jnp.abs(flat_r).max()) + 1e-12
    assert float(jnp.abs(flat_f - flat_r).max()) / scale < 2e-4, cache
print("OK")
"""


def test_fused_head_end_to_end_parity():
    """episodic_nll_stats with the fused head (cell=pallas, interpret) ==
    the explicit-logits path (cell=scan), NLL and grads, with and without
    the cache head.  Same LSTM weights: cell only switches kernels."""
    _run(_E2E_CODE)


def test_fused_head_end_to_end_parity_tiled():
    """Same end-to-end parity with the vocab-tiled plan forced (vt=512 →
    4 vocab tiles at V=2000): the full episodic NLL + grads ride the
    tiled kernels through models/lm.py unchanged."""
    _run(_E2E_CODE, FEWSHOT_HEAD_CE_FORCE_TILED="1",
         FEWSHOT_HEAD_CE_VT="512")


def test_fused_head_composes_with_shard_map():
    """The fused head kernel inside the shard_map train step (8 virtual
    CPU devices, interpret mode): compiles, runs, loss falls."""
    env = dict(os.environ, FEWSHOT_PALLAS_INTERPRET="1", JAX_PLATFORMS="cpu",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "") +
                          " --xla_force_host_platform_device_count=8"))
    code = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from fewshot import training
from fewshot.config import Config
from fewshot.data import episodes as eps
from fewshot.data.corpus import build_lyrics_corpus
from fewshot.data.synthetic import generate_lyrics_csv
import tempfile
from pathlib import Path

assert jax.device_count() == 8
with tempfile.TemporaryDirectory() as tmp:
    generate_lyrics_csv(Path(tmp) / "l.csv", num_artists=16,
                        songs_per_artist=20, seed=0, extra_vocab=4000)
    corpus = build_lyrics_corpus(Path(tmp) / "l.csv", Path(tmp) / "c",
                                 vocab_size=2000, max_len=16)
cfg = Config(vocab_size=2000, max_len=16, embed_dim=128, hidden_dim=128,
             num_layers=1, batch_size=8, support_size=2, query_size=2,
             support_mode="mean_state", support_cache=True, cell="pallas",
             data_parallel=True, lr=5e-3)
from fewshot.models import lm
params = lm.init_lm(jax.random.PRNGKey(0), cfg, len(corpus.vocab))
assert lm.fused_head_eligible(params, cfg, len(corpus.vocab))
data = eps.put_corpus(corpus)
split = jnp.asarray(corpus.splits["train"])
step = training.make_train_step(cfg, data, split)
state = training.init_train_state(cfg, len(corpus.vocab))
losses = []
for _ in range(20):
    state, m = step(state)
    losses.append(float(m["loss"]))
assert all(np.isfinite(l) for l in losses)
assert np.mean(losses[-5:]) < np.mean(losses[:5])
print("OK")
"""
    out = subprocess.run([sys.executable, "-c", code],
                         cwd=Path(__file__).resolve().parent.parent, env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0 and "OK" in out.stdout, \
        out.stdout[-2000:] + out.stderr[-2000:]
