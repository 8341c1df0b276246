"""Grammar-constrained MIDI sampling: every emitted group must decode."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fewshot import sampling
from fewshot.config import Config
from fewshot.data import midi as M
from fewshot.data.vocab import EOS, PAD, SPECIALS, Vocab
from fewshot.models import lm as lm_mod

VOCAB = Vocab(SPECIALS + M.full_event_vocab())
CFG = Config(dataset="midi", vocab_size=len(VOCAB), max_len=16, embed_dim=16,
             hidden_dim=24, num_layers=1, batch_size=2, support_size=2,
             query_size=1, sample_tokens=33, top_k=0, data_parallel=False)


def test_grammar_masks_layout():
    masks = M.grammar_masks(VOCAB)
    assert masks.shape == (4, len(VOCAB))
    assert masks[0, EOS]                      # may stop at a group boundary
    assert masks[0, 4 + 0] and masks[0, 4 + 31]          # SHIFT range
    assert masks[1, 4 + 32] and masks[1, 4 + 32 + 127]   # PITCH range
    assert not masks[1, EOS] and not masks[2, EOS] and not masks[3, EOS]
    assert (masks.sum(0) <= 1 + (np.arange(len(VOCAB)) == EOS)).all()


def _run(model):
    cfg = CFG if model == "lstm" else dataclasses.replace(
        CFG, model="transformer", embed_dim=16, num_heads=4)
    params = lm_mod.init_lm(jax.random.PRNGKey(0), cfg, len(VOCAB))
    rng = np.random.RandomState(0)
    sup = jnp.asarray(rng.randint(4, len(VOCAB), (2, 2, 12)), jnp.int32)
    slen = jnp.full((2, 2), 12, jnp.int32)
    masks = jnp.asarray(M.grammar_masks(VOCAB))
    toks = sampling.generate(params, sup, slen, jax.random.PRNGKey(1), cfg,
                             token_masks=masks)
    return np.asarray(toks)


def _check_stream(row):
    """Decode phase-by-phase; every non-PAD token must fit the cycle."""
    kinds = ["SHIFT", "PITCH", "DUR", "VEL"]
    phase = 0
    for t in row:
        t = int(t)
        if t == PAD:
            continue
        if t == EOS:
            assert phase == 0            # only at group boundaries
            break
        name = VOCAB.tokens[t]
        assert name.split("_")[0] == kinds[phase], (name, phase)
        phase = (phase + 1) % 4


def test_lstm_grammar_stream_decodes():
    toks = _run("lstm")
    for row in toks:
        _check_stream(row)
        events = VOCAB.decode(row)
        # 33 sampled tokens -> 8 full groups => 8 notes exactly
        notes = M.events_to_notes(events)
        assert len(notes) == len(events) // 4


def test_transformer_grammar_stream_decodes():
    toks = _run("transformer")
    for row in toks:
        _check_stream(row)
