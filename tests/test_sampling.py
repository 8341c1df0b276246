"""On-device sampling: valid ids, top-k/greedy semantics, EOS handling
(SURVEY.md §5.3 "sampling loop emits only valid ids and respects top-k")."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fewshot import sampling
from fewshot.config import Config
from fewshot.data.vocab import EOS, PAD
from fewshot.models import lm as lm_mod

CFG = Config(vocab_size=32, max_len=12, embed_dim=16, hidden_dim=24,
             num_layers=1, batch_size=2, support_size=2, query_size=1,
             sample_tokens=20, data_parallel=False)


def _support(b=2, k=2, L=8, vmax=32):
    rng = np.random.RandomState(0)
    sup = rng.randint(4, vmax, (b, k, L)).astype(np.int32)
    return jnp.asarray(sup), jnp.full((b, k), L, jnp.int32)


def test_filtered_sample_topk():
    logits = jnp.asarray([[0.0, 5.0, 4.0, -1.0]])
    keys = jax.random.split(jax.random.PRNGKey(0), 50)
    ids = [int(sampling.filtered_sample(k, logits, 1.0, 2)[0]) for k in keys]
    assert set(ids) <= {1, 2}          # only the top-2 survive


def test_filtered_sample_greedy():
    logits = jnp.asarray([[0.0, 5.0, 4.0, -1.0]])
    ids = [int(sampling.filtered_sample(jax.random.PRNGKey(i), logits,
                                        1.0, 1)[0]) for i in range(10)]
    assert ids == [1] * 10             # top-1 == argmax


def _check_generation(cfg):
    params = lm_mod.init_lm(jax.random.PRNGKey(0), cfg, cfg.vocab_size)
    sup, slen = _support(vmax=cfg.vocab_size)
    toks = sampling.generate(params, sup, slen, jax.random.PRNGKey(1), cfg)
    toks = np.asarray(toks)
    assert toks.shape == (2, cfg.sample_tokens)
    assert toks.min() >= 0 and toks.max() < cfg.vocab_size
    # after EOS everything is PAD
    for row in toks:
        hits = np.where(row == EOS)[0]
        if len(hits):
            assert (row[hits[0] + 1:] == PAD).all()
    return toks


def test_lstm_generation():
    _check_generation(CFG)


def test_transformer_generation():
    cfg = dataclasses.replace(CFG, model="transformer", embed_dim=16,
                              num_heads=4)
    _check_generation(cfg)


def test_support_conditioning_changes_samples():
    """Different support sets -> different greedy continuations (usually).
    Checks the primed state actually reaches the sampler."""
    cfg = dataclasses.replace(CFG, top_k=1, sample_tokens=12)
    params = lm_mod.init_lm(jax.random.PRNGKey(2), cfg, cfg.vocab_size)
    rng = np.random.RandomState(3)
    s1 = jnp.asarray(rng.randint(4, 32, (1, 2, 8)), jnp.int32)
    s2 = jnp.asarray(rng.randint(4, 32, (1, 2, 8)), jnp.int32)
    slen = jnp.full((1, 2), 8, jnp.int32)
    t1 = sampling.generate(params, s1, slen, jax.random.PRNGKey(0), cfg)
    t2 = sampling.generate(params, s2, slen, jax.random.PRNGKey(0), cfg)
    t1b = sampling.generate(params, s1, slen, jax.random.PRNGKey(9), cfg)
    # greedy: same support + any key -> identical; different support -> differs
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t1b))
    assert not np.array_equal(np.asarray(t1), np.asarray(t2))


def test_early_exit_identical_and_faster():
    """early_exit=True must be bit-identical to the full scan, and must
    actually stop early: with EOS-biased params every row finishes at
    step 1, so the while_loop runs ~2 of n=512 steps (VERDICT r1 #8
    'latency drops when all rows finish early')."""
    import time
    cfg = dataclasses.replace(CFG, sample_tokens=512, top_k=1)
    params = lm_mod.init_lm(jax.random.PRNGKey(0), cfg, cfg.vocab_size)
    # rig the head bias so EOS is always the argmax -> greedy emits EOS
    params["out_b"] = params["out_b"].at[EOS].set(50.0)
    sup, slen = _support(vmax=cfg.vocab_size)

    toks_full = np.asarray(sampling.generate(
        params, sup, slen, jax.random.PRNGKey(1), cfg, early_exit=False))
    toks_ee = np.asarray(sampling.generate(
        params, sup, slen, jax.random.PRNGKey(1), cfg, early_exit=True))
    np.testing.assert_array_equal(toks_full, toks_ee)
    assert (toks_ee[:, 0] == EOS).all() and (toks_ee[:, 1:] == PAD).all()

    def timed(early_exit):
        # warm the compile, then time the steady call
        sampling.generate(params, sup, slen, jax.random.PRNGKey(1), cfg,
                          early_exit=early_exit).block_until_ready()
        t0 = time.perf_counter()
        for i in range(3):
            sampling.generate(params, sup, slen, jax.random.PRNGKey(i),
                              cfg, early_exit=early_exit).block_until_ready()
        return time.perf_counter() - t0

    # min-of-2 per mode: absorbs transient machine load (observed flake
    # when the whole suite runs alongside other work)
    t_full = min(timed(False), timed(False))
    t_ee = min(timed(True), timed(True))
    assert t_ee < t_full / 5, (t_ee, t_full)   # 512 steps vs ~2


def test_top_p_filtering():
    # distribution: p ~ [0.02, 0.64, 0.23, 0.09, 0.02]; top_p=0.8 keeps
    # only the two largest (0.64+0.23=0.87 crosses 0.8 at the second)
    logits = jnp.log(jnp.asarray([[0.02, 0.64, 0.23, 0.09, 0.02]]))
    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    ids = {int(sampling.filtered_sample(k, logits, 1.0, 0, top_p=0.8)[0])
           for k in keys}
    assert ids == {1, 2}
    # top_p=0 disables nucleus filtering
    ids_all = {int(sampling.filtered_sample(k, logits, 1.0, 0, top_p=0.0)[0])
               for k in keys}
    assert len(ids_all) >= 4


def test_traced_temperature_matches_config():
    params = lm_mod.init_lm(jax.random.PRNGKey(0), CFG, CFG.vocab_size)
    sup, slen = _support(vmax=CFG.vocab_size)
    import dataclasses
    cfg_hot = dataclasses.replace(CFG, temperature=0.3)
    a = sampling.generate(params, sup, slen, jax.random.PRNGKey(1), cfg_hot)
    # same value passed as a traced argument on the base config
    b = sampling.generate(params, sup, slen, jax.random.PRNGKey(1), CFG,
                          temperature=0.3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
