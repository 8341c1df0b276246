"""Config merge + validation (reference surface: SURVEY.md §6 config system)."""

import pytest

from fewshot.config import (Config, load_config, merge_configs,
                            parse_overrides)


def test_merge_precedence(tmp_path):
    (tmp_path / "a.yaml").write_text("lr: 0.1\nbatch_size: 8\n")
    (tmp_path / "b.yaml").write_text("lr: 0.5\n")
    cfg = load_config(str(tmp_path / "a.yaml"), str(tmp_path / "b.yaml"))
    assert cfg.lr == 0.5          # later file wins
    assert cfg.batch_size == 8


def test_unknown_key_rejected():
    with pytest.raises(ValueError, match="unknown key"):
        merge_configs({"learning_rate": 0.1})


def test_choice_validation():
    with pytest.raises(ValueError, match="model="):
        Config(model="gru")
    with pytest.raises(ValueError, match="positive"):
        Config(batch_size=0)


def test_overrides():
    ov = parse_overrides(["lr=3e-4", "seed=2", "data_parallel=false"])
    assert ov == {"lr": 3e-4, "seed": 2, "data_parallel": False}
    cfg = merge_configs({"lr": 1.0}, ov)
    assert cfg.lr == 3e-4 and cfg.seed == 2 and cfg.data_parallel is False


def test_config_hashable():
    # Config rides as a jit static argument (sampling.py) — must hash.
    assert hash(Config()) == hash(Config())
    assert Config() == Config()


def test_steps_per_call_alignment():
    from fewshot.config import Config
    # aligned intervals: fine
    Config(steps_per_call=4, log_interval=4, eval_interval=8,
           checkpoint_interval=8, max_steps=16)
    # misaligned log_interval: rejected
    with pytest.raises(ValueError, match="steps_per_call"):
        Config(steps_per_call=4, log_interval=6, max_steps=16)
    # zero intervals are exempt (disabled features)
    Config(steps_per_call=4, log_interval=4, eval_interval=0,
           checkpoint_interval=0, max_steps=8)
