"""Pallas fused LSTM vs lax.scan golden path (SURVEY.md §8 step 9).

These run only on a real TPU backend — conftest forces CPU for the rest of
the suite, so they skip here and are exercised by scripts/tpu_checks.py
(which the bench path runs on the real chip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(jax.default_backend() != "tpu",
                                  reason="pallas kernels need a TPU")


@requires_tpu
def test_pallas_forward_matches_scan():
    from fewshot.models import lstm as L
    from fewshot.ops.lstm_pallas import lstm_layer_pallas
    params = L.init_lstm_params(jax.random.PRNGKey(0), 16, 128, 1)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 12, 16))
    mask = jnp.arange(12) < jnp.array([12, 5, 9, 1])[:, None]
    h0c0 = L.zero_state(4, 128, 1)[0]
    ys_ref, (h_ref, c_ref) = L._layer_scan(params[0], x, mask, h0c0,
                                           jnp.float32)
    ys, (h, c) = lstm_layer_pallas(params[0], x, mask, h0c0, jnp.float32)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), atol=1e-5)


@requires_tpu
def test_pallas_grads_match_scan():
    from fewshot.models import lstm as L
    from fewshot.ops.lstm_pallas import lstm_layer_pallas
    params = L.init_lstm_params(jax.random.PRNGKey(0), 16, 128, 1)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 12, 16))
    mask = jnp.arange(12) < jnp.array([12, 5, 9, 1])[:, None]
    h0c0 = L.zero_state(4, 128, 1)[0]

    def loss(fn, p):
        ys, (h, c) = fn(p, x, mask, h0c0, jnp.float32)
        return jnp.sum(ys ** 2) + jnp.sum(h * c)

    g_ref = jax.grad(lambda p: loss(L._layer_scan, p))(params[0])
    g = jax.grad(lambda p: loss(lstm_layer_pallas, p))(params[0])
    for k in g_ref:
        ref = np.asarray(g_ref[k])
        np.testing.assert_allclose(np.asarray(g[k]), ref,
                                   atol=1e-4 + 1e-4 * np.abs(ref).max())


def test_pallas_interpret_parity_subprocess():
    """Fwd + custom-VJP bwd parity vs lax.scan in Pallas INTERPRET mode.

    Runs on any backend (subprocess, because FEWSHOT_PALLAS_INTERPRET is
    read at module import) — this is the CI-side guard on the backward
    kernel's shifted-index_map glue; exact on-chip parity is covered by
    scripts/tpu_checks.py."""
    import os
    import subprocess
    import sys
    from pathlib import Path
    code = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from fewshot.models import lstm as L
from fewshot.ops.lstm_pallas import lstm_layer_pallas

for (b, t, e, h) in [(4, 12, 16, 128), (8, 1, 16, 128)]:
    params = L.init_lstm_params(jax.random.PRNGKey(0), e, h, 1)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, e))
    lens = jnp.asarray(np.random.RandomState(0).randint(1, t + 1, b))
    mask = jnp.arange(t) < lens[:, None]
    h0c0 = L.zero_state(b, h, 1)[0]
    ys_r, _ = L._layer_scan(params[0], x, mask, h0c0, jnp.float32)
    ys_p, _ = lstm_layer_pallas(params[0], x, mask, h0c0, jnp.float32)
    assert float(jnp.abs(ys_p - ys_r).max()) < 1e-5

    def loss(fn, p):
        ys, (hh, cc) = fn(p, x, mask, h0c0, jnp.float32)
        return jnp.sum(ys ** 2) + jnp.sum(hh * cc)
    gr = jax.grad(lambda p: loss(L._layer_scan, p))(params[0])
    gp = jax.grad(lambda p: loss(lstm_layer_pallas, p))(params[0])
    for k in gr:
        scale = float(np.abs(np.asarray(gr[k])).max()) + 1e-12
        assert float(jnp.abs(gp[k] - gr[k]).max()) / scale < 1e-4, k
print("OK")
"""
    env = dict(os.environ, FEWSHOT_PALLAS_INTERPRET="1", JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code],
                         cwd=Path(__file__).resolve().parent.parent, env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0 and "OK" in out.stdout, \
        out.stdout[-2000:] + out.stderr[-2000:]


def test_gates_int8_interpret_parity_subprocess():
    """FEWSHOT_LSTM_GATES_INT8=1 (ROADMAP r4 #4): the saved-gates stream is
    affine-coded int8.  Forward must be BIT-identical (gates are a backward
    residual only); backward grads carry bounded dequant noise (<=1/254 per
    gate) — asserted loose vs the exact-gates custom VJP."""
    import os
    import subprocess
    import sys
    from pathlib import Path
    code = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from fewshot.models import lstm as L
from fewshot.ops import lstm_pallas as P

assert P._GATES_INT8
b, t, e, h = 32, 12, 16, 128          # b=32 -> bt=32, int8 tile-aligned
params = L.init_lstm_params(jax.random.PRNGKey(0), e, h, 1)
x = jax.random.normal(jax.random.PRNGKey(1), (b, t, e))
lens = jnp.asarray(np.random.RandomState(0).randint(1, t + 1, b))
mask = jnp.arange(t) < lens[:, None]
h0c0 = L.zero_state(b, h, 1)[0]

def loss(fn, p):
    ys, (hh, cc) = fn(p, x, mask, h0c0, jnp.float32)
    return jnp.sum(ys ** 2) + jnp.sum(hh * cc)

ys_q, _ = P.lstm_layer_pallas(params[0], x, mask, h0c0, jnp.float32)
gq = jax.grad(lambda p: loss(P.lstm_layer_pallas, p))(params[0])
P._GATES_INT8 = False
ys_x, _ = P.lstm_layer_pallas(params[0], x, mask, h0c0, jnp.float32)
gx = jax.grad(lambda p: loss(P.lstm_layer_pallas, p))(params[0])
gr = jax.grad(lambda p: loss(L._layer_scan, p))(params[0])

assert float(jnp.abs(ys_q - ys_x).max()) == 0.0, "fwd must not change"
for k in gx:
    scale = float(np.abs(np.asarray(gr[k])).max()) + 1e-12
    err_q = float(jnp.abs(gq[k] - gr[k]).max()) / scale
    err_x = float(jnp.abs(gx[k] - gr[k]).max()) / scale
    assert err_x < 1e-4, (k, err_x)
    assert err_q < 3e-2, (k, err_q)          # bounded dequant noise
    assert err_q > 0.0, k                    # the int8 path actually ran
print("OK")
"""
    env = dict(os.environ, FEWSHOT_PALLAS_INTERPRET="1",
               FEWSHOT_LSTM_GATES_INT8="1", JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code],
                         cwd=Path(__file__).resolve().parent.parent, env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0 and "OK" in out.stdout, \
        out.stdout[-2000:] + out.stderr[-2000:]


def test_fused_stack_interpret_parity_subprocess():
    """Fused MULTI-LAYER kernel (fewshot/ops/lstm_fused.py) vs the scan
    stack: fwd, final states, and grads wrt params/x/initial state, with
    ragged masks and a nonzero (support-primed) initial state."""
    import os
    import subprocess
    import sys
    from pathlib import Path
    code = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from fewshot.models import lstm as L
from fewshot.ops.lstm_fused import lstm_stack_fused, stack_fused_supported

rng = np.random.RandomState(0)
for (b, t, e, h, n_layers) in [(4, 12, 16, 128, 2), (8, 5, 32, 128, 3),
                               (4, 1, 16, 128, 2)]:
    params = L.init_lstm_params(jax.random.PRNGKey(0), e, h, n_layers)
    assert stack_fused_supported(params, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, e))
    lens = jnp.asarray(rng.randint(1, t + 1, b))
    mask = jnp.arange(t) < lens[:, None]
    state = [(jax.random.normal(jax.random.PRNGKey(10 + i), (b, h)) * 0.3,
              jax.random.normal(jax.random.PRNGKey(20 + i), (b, h)) * 0.3)
             for i in range(n_layers)]

    ys_r, st_r = L.lstm_forward(params, x, mask=mask, state=state,
                                compute_dtype=jnp.float32, cell="scan")
    ys_p, st_p = lstm_stack_fused(params, x, mask, state, jnp.float32)
    assert float(jnp.abs(ys_p - ys_r).max()) < 1e-5
    for (hr, cr), (hp, cp) in zip(st_r, st_p):
        assert float(jnp.abs(hp - hr).max()) < 1e-5
        assert float(jnp.abs(cp - cr).max()) < 1e-5

    def loss(fn, p, xx, st):
        ys, out = fn(p, xx, st)
        s = jnp.sum(ys ** 2)
        for hh, cc in out:
            s = s + jnp.sum(hh * cc)
        return s

    scan_fn = lambda p, xx, st: L.lstm_forward(
        p, xx, mask=mask, state=st, compute_dtype=jnp.float32, cell="scan")
    fused_fn = lambda p, xx, st: lstm_stack_fused(p, xx, mask, st,
                                                  jnp.float32)
    g_r = jax.grad(lambda a: loss(scan_fn, *a))((params, x, state))
    g_p = jax.grad(lambda a: loss(fused_fn, *a))((params, x, state))
    flat_r, _ = jax.tree.flatten(g_r)
    flat_p, _ = jax.tree.flatten(g_p)
    for rr, pp in zip(flat_r, flat_p):
        scale = float(jnp.abs(rr).max()) + 1e-12
        assert float(jnp.abs(pp - rr).max()) / scale < 1e-4
print("OK")
"""
    env = dict(os.environ, FEWSHOT_PALLAS_INTERPRET="1", JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code],
                         cwd=Path(__file__).resolve().parent.parent, env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0 and "OK" in out.stdout, \
        out.stdout[-2000:] + out.stderr[-2000:]


def test_prefix_attention_interpret_parity_subprocess():
    """Fused episodic prefix-attention kernel (fwd + all 5 input grads) vs
    the einsum reference, in Pallas interpret mode (any backend)."""
    import os
    import subprocess
    import sys
    from pathlib import Path
    code = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from fewshot.ops.prefix_attention import (prefix_attention,
                                          prefix_attention_reference)

rng = np.random.RandomState(0)
for (b, q, lq, nh, hd, p) in [(2, 3, 20, 2, 16, 50), (1, 2, 130, 4, 32, 260)]:
    qq = jnp.asarray(rng.randn(b, q, lq, nh, hd), jnp.float32)
    qk = jnp.asarray(rng.randn(b, q, lq, nh, hd), jnp.float32)
    qv = jnp.asarray(rng.randn(b, q, lq, nh, hd), jnp.float32)
    pk = jnp.asarray(rng.randn(b, p, nh, hd), jnp.float32)
    pv = jnp.asarray(rng.randn(b, p, nh, hd), jnp.float32)
    qmask = jnp.arange(lq)[None, None] < rng.randint(2, lq + 1,
                                                     (b, q))[:, :, None]
    pmask = jnp.arange(p)[None] < rng.randint(1, p + 1, (b,))[:, None]
    want = prefix_attention_reference(qq, qk, qv, pk, pv, qmask, pmask)
    got = prefix_attention(qq, qk, qv, pk, pv, qmask, pmask)
    assert float(jnp.abs(got - want).max()) < 2e-5

    def loss(fn, args):
        o = fn(*args, qmask, pmask).reshape(b, q, lq, -1)
        return jnp.sum(jnp.where(qmask[..., None], o, 0.0) ** 2)

    args = (qq, qk, qv, pk, pv)
    g_ref = jax.grad(lambda a: loss(prefix_attention_reference, a))(args)
    g_new = jax.grad(lambda a: loss(prefix_attention, a))(args)
    for i in range(5):
        scale = float(jnp.abs(g_ref[i]).max()) + 1e-12
        assert float(jnp.abs(g_new[i] - g_ref[i]).max()) / scale < 1e-4, i
print("OK")
"""
    env = dict(os.environ, FEWSHOT_PALLAS_INTERPRET="1", JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code],
                         cwd=Path(__file__).resolve().parent.parent, env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0 and "OK" in out.stdout, \
        out.stdout[-2000:] + out.stderr[-2000:]


def test_prefix_attention_resident_plan_parity_subprocess():
    """The r5 resident plan (full-context single-pass kernels + fused
    backward) must match the einsum reference exactly like the streaming
    plan does — including the rpb>1 row-block accumulation path and the
    causal (no-prefix) wrapper."""
    import os
    import subprocess
    import sys
    from pathlib import Path
    code = r"""
import os
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from fewshot.ops import prefix_attention as PA
from fewshot.ops.attention import causal_attention

rng = np.random.RandomState(0)
os.environ["FEWSHOT_PREFIX_PLAN"] = "resident"

def check_eps(b, q, lq, nh, hd, p, blr=None):
    qq, qk, qv = (jnp.asarray(rng.randn(b, q, lq, nh, hd), jnp.float32)
                  for _ in range(3))
    pk, pv = (jnp.asarray(rng.randn(b, p, nh, hd), jnp.float32)
              for _ in range(2))
    qmask = jnp.arange(lq)[None, None] < rng.randint(
        2, lq + 1, (b, q))[:, :, None]
    pmask = jnp.arange(p)[None] < rng.randint(1, p + 1, (b,))[:, None]
    if blr:
        os.environ["FEWSHOT_PREFIX_RES_BLR"] = str(blr)
    want = PA.prefix_attention_reference(qq, qk, qv, pk, pv, qmask, pmask)
    got = PA.prefix_attention(qq, qk, qv, pk, pv, qmask, pmask)
    assert float(jnp.abs(got - want).max()) < 2e-5

    def loss(fn, args):
        o = fn(*args, qmask, pmask).reshape(b, q, lq, -1)
        return jnp.sum(jnp.where(qmask[..., None], o, 0.0) ** 2)
    args = (qq, qk, qv, pk, pv)
    g_ref = jax.grad(lambda a: loss(PA.prefix_attention_reference, a))(args)
    g_new = jax.grad(lambda a: loss(PA.prefix_attention, a))(args)
    for i in range(5):
        scale = float(jnp.abs(g_ref[i]).max()) + 1e-12
        assert float(jnp.abs(g_new[i] - g_ref[i]).max()) / scale < 1e-4, i
    os.environ.pop("FEWSHOT_PREFIX_RES_BLR", None)

check_eps(2, 3, 20, 2, 16, 50)
check_eps(1, 2, 130, 4, 32, 260, blr=128)     # rpb=2 accumulation path
check_eps(1, 2, 130, 2, 32, 200)              # auto blr
# hd=128 shapes ride the token-major layout (heads as lane slices);
# hd<128 above ride the 5-D heads-outer layout — both must match einsum
check_eps(2, 3, 20, 2, 128, 50)               # token-major, flagship-like
check_eps(1, 2, 140, 2, 128, 130, blr=128)    # token-major, rpb=2
os.environ["FEWSHOT_PREFIX_RES_LAYOUT"] = "heads"
check_eps(2, 3, 20, 2, 128, 50)               # forced 5-D at hd=128
os.environ.pop("FEWSHOT_PREFIX_RES_LAYOUT", None)

for nh, hd in [(2, 32), (2, 128)]:       # 5-D layout, then token-major
    b, t = 2, 150
    q, k, v = (jnp.asarray(rng.randn(b, t, nh, hd), jnp.float32)
               for _ in range(3))
    mask = jnp.arange(t)[None] < rng.randint(5, t + 1, (b,))[:, None]
    want = causal_attention(q, k, v, mask, False)
    got = PA.causal_self_attention_flash(q, k, v, mask)
    assert float(jnp.abs(got - want).max()) < 2e-5

    def loss2(fn, args):
        o = fn(*args, mask).reshape(b, t, -1)
        return jnp.sum(jnp.where(mask[..., None], o, 0.0) ** 2)
    g_ref = jax.grad(lambda a: loss2(
        lambda q, k, v, m: causal_attention(q, k, v, m, False), a))(
        (q, k, v))
    g_new = jax.grad(lambda a: loss2(PA.causal_self_attention_flash, a))(
        (q, k, v))
    for i in range(3):
        scale = float(jnp.abs(g_ref[i]).max()) + 1e-12
        assert float(jnp.abs(g_new[i] - g_ref[i]).max()) / scale < 1e-4, i
print("OK")
"""
    env = dict(os.environ, FEWSHOT_PALLAS_INTERPRET="1", JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code],
                         cwd=Path(__file__).resolve().parent.parent, env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0 and "OK" in out.stdout, \
        out.stdout[-2000:] + out.stderr[-2000:]


def test_resident_plan_selection():
    """Plan selection: flagship bf16 shapes choose resident; the huge
    K=20/L=512 regime (P > 10k) falls back to streaming."""
    from fewshot.ops.prefix_attention import _res_plan
    assert _res_plan(2, 128, 512, 128, 2) == 128      # flagship episodic
    assert _res_plan(2, 512, 0, 128, 2) == 512        # flagship prefix stream
    assert _res_plan(2, 512, 10240, 128, 2) is None   # K=20/L=512 regime


def test_pallas_requires_aligned_hidden():
    from fewshot.ops.lstm_pallas import lstm_layer_pallas
    layer = {"wx": jnp.zeros((4, 4 * 100)), "wh": jnp.zeros((100, 400)),
             "b": jnp.zeros((400,))}
    with pytest.raises(ValueError, match="128"):
        lstm_layer_pallas(layer, jnp.zeros((1, 2, 4)), None,
                          (jnp.zeros((1, 100)), jnp.zeros((1, 100))),
                          jnp.float32)


def test_pallas_falls_back_on_large_hidden():
    """H past the VMEM weight-residency budget falls back to lax.scan."""
    import warnings
    import jax.numpy as jnp
    from fewshot.models import lstm as L
    from fewshot.ops.lstm_pallas import lstm_layer_pallas
    params = L.init_lstm_params(jax.random.PRNGKey(0), 8, 1024, 1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8))
    h0c0 = L.zero_state(2, 1024, 1)[0]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ys, _ = lstm_layer_pallas(params[0], x, None, h0c0, jnp.float32)
    assert any("falling back" in str(x.message) for x in w)
    ys_ref, _ = L._layer_scan(params[0], x, None, h0c0, jnp.float32)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref), atol=1e-6)


def test_fused_stack_vjp_rejects_eval_only_shapes():
    """Differentiating an eval_mode-only fused-stack shape must fail with a
    clear error, not a Mosaic OOM at degraded tiles (advisor finding r2).

    H=384/L=2/bf16/rows=240 is fused-eligible forward-only (no gates
    stream) but its save-gates train footprint halves the batch tile; the
    custom-VJP forward re-checks and refuses."""
    import jax.numpy as jnp
    from fewshot.ops.lstm_fused import (lstm_stack_pallas,
                                        stack_fused_supported)
    h, layers, rows, t = 384, 2, 240, 4
    params = [{"wh": jnp.zeros((h, 4 * h), jnp.bfloat16),
               "wx": jnp.zeros((h, 4 * h), jnp.bfloat16)}
              for _ in range(layers)]
    assert stack_fused_supported(params, jnp.bfloat16, batch_rows=rows,
                                 eval_mode=True)
    assert not stack_fused_supported(params, jnp.bfloat16, batch_rows=rows,
                                     eval_mode=False)

    zx = jnp.zeros((t, rows, 4 * h), jnp.bfloat16)
    wx_rest = jnp.zeros((layers - 1, h, 4 * h), jnp.bfloat16)
    wh = jnp.zeros((layers, h, 4 * h), jnp.bfloat16)
    b = jnp.zeros((layers, 4 * h), jnp.float32)
    mask = jnp.ones((t, rows, 1), jnp.float32)
    h0 = c0 = jnp.zeros((layers, rows, h), jnp.float32)

    def loss(wh_):
        ys, _, _ = lstm_stack_pallas(zx, wx_rest, wh_, b, mask, h0, c0)
        return jnp.sum(ys.astype(jnp.float32))

    with pytest.raises(ValueError, match="eval_mode"):
        jax.grad(loss)(wh)
