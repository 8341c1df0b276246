"""Every shipped YAML combination must merge into a valid Config.

Protects the committed experiment matrix: a typo'd key or invalid value in
configs/ would otherwise only surface when a user runs that combination.
"""

import itertools
from pathlib import Path

import pytest

from fewshot.config import load_config

REPO = Path(__file__).resolve().parent.parent
DATA = sorted((REPO / "configs" / "data").glob("*.yaml"))
MODEL = sorted((REPO / "configs" / "model").glob("*.yaml"))
TASK = sorted((REPO / "configs" / "task").glob("*.yaml"))


def test_config_dirs_populated():
    assert len(DATA) >= 2 and len(MODEL) >= 4 and len(TASK) >= 2


@pytest.mark.parametrize(
    "data,model,task",
    list(itertools.product(DATA, MODEL, TASK)),
    ids=lambda p: p.stem)
def test_combination_valid(data, model, task):
    cfg = load_config(str(data), str(model), str(task))
    assert cfg.batch_size > 0
    # shipped pallas config must satisfy the kernel's alignment rule
    if cfg.cell == "pallas":
        assert cfg.hidden_dim % 128 == 0
    if cfg.model == "transformer":
        assert cfg.embed_dim % cfg.num_heads == 0
