"""Model tier: functional param-pytree models (no framework classes on the
hot path — everything is jit/vmap/shard_map-friendly pure functions).

Reference equivalents (SURVEY.md §2 L3): `models/base.py` (BaseModel
contract), `models/baselines.py` (LSTM LM baseline).  The train/eval/sample
/save/restore contract lives in `fewshot.models.base`; the backbones are
`fewshot.models.lstm` (lax.scan + Pallas cell) and
`fewshot.models.transformer`; the language-model head, masked query-NLL and
episodic conditioning are `fewshot.models.lm`.
"""

from fewshot.models.lm import (init_lm, lm_logits, sequence_nll,
                               episodic_nll, episodic_nll_stats,
                               lm_nll, lm_nll_stats)
