"""Utility tier: metrics/observability and checkpoint/resume.

Reference equivalents (SURVEY.md §6): print/tf.summary logging -> JSONL +
stdout (`fewshot.utils.metrics`); tf.train.Saver recover_or_init ->
Orbax (`fewshot.utils.ckpt`).
"""
