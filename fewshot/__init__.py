"""fewshot — TPU-native few-shot music/lyrics language modeling.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
AI-ON/Few-Shot-Music-Generation reference (episodic support/query language
modeling over per-artist lyrics and symbolic MIDI corpora; see SURVEY.md).

Everything hot runs on device:
  * corpora are pre-tokenized once into HBM-resident packed token arrays
    (`fewshot.data.corpus`),
  * episode sampling is a jittable on-device gather
    (`fewshot.data.episodes`),
  * the LSTM LM baseline runs as a `lax.scan` cell with an optional fused
    Pallas scan kernel (`fewshot.models.lstm`, `fewshot.ops.lstm_pallas`),
  * few-shot ancestral/top-k sampling executes fully on device
    (`fewshot.sampling`),
  * episodes shard across a TPU mesh via `shard_map`
    (`fewshot.parallel.mesh`).

Public surface mirrors the reference: YAML experiment configs merged from
``--data/--model/--task`` files and ``train``/``evaluate``/``sample``
entry points (reference layout per SURVEY.md §2, L4).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy convenience exports (avoid import cycles at package import)."""
    if name == "FewShotModel":
        from fewshot.models.base import FewShotModel
        return FewShotModel
    if name == "Config":
        from fewshot.config import Config
        return Config
    raise AttributeError(f"module 'fewshot' has no attribute {name!r}")
