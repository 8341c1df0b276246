"""Checkpoint/resume via Orbax: params + opt state + step + PRNG key.

Reference equivalent (SURVEY.md §6 "Checkpoint / resume"): tf.train.Saver
save/restore into --checkpt_dir with the recover_or_init pattern at model
construction.  Same surface here; additionally a vocab content-hash is stored
so restoring against a different corpus fails loudly instead of silently
emitting garbage ids.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import orbax.checkpoint as ocp

from fewshot.training import TrainState


def _manager(ckpt_dir: str | Path, max_to_keep: int = 3
             ) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        Path(ckpt_dir).absolute(),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


_OPEN_MANAGERS: dict[str, ocp.CheckpointManager] = {}


def _live_manager(ckpt_dir: Path) -> ocp.CheckpointManager:
    """Keep one manager open per dir so periodic saves run ASYNC (orbax
    writes in a background thread; SURVEY.md §6 "frequent async
    checkpoints").  wait_for_checkpoints() drains them (call before exit)."""
    key = str(ckpt_dir.absolute())
    if key not in _OPEN_MANAGERS:
        _OPEN_MANAGERS[key] = _manager(ckpt_dir)
    return _OPEN_MANAGERS[key]


# Hyperparameters whose value changes MODEL SEMANTICS without changing any
# parameter shape: a checkpoint restores cleanly under a different value but
# then evaluates/samples a different function (advisor finding r2 —
# num_heads splits the same fused [E,3E] QKV differently).  Stored in
# meta.json at save; compared (warn, not fail) at restore.
SEMANTIC_HPARAMS = ("model", "num_heads", "support_mode", "cell",
                    "tie_embeddings", "dataset", "support_cache",
                    "cache_backoff", "cache_calib", "cache_calib_freq",
                    "cache_dynamic")


def hparams_of(cfg) -> dict:
    """The semantics-bearing hyperparams of a Config, for checkpoint meta."""
    return {k: getattr(cfg, k) for k in SEMANTIC_HPARAMS if hasattr(cfg, k)}


def save_checkpoint(ckpt_dir: str | Path, state: TrainState,
                    vocab_hash: str = "", block: bool = False,
                    hparams: dict | None = None) -> None:
    d = Path(ckpt_dir)
    d.mkdir(parents=True, exist_ok=True)
    meta = {"vocab_hash": vocab_hash}
    if hparams:
        meta["hparams"] = hparams
    (d / "meta.json").write_text(json.dumps(meta))
    mgr = _live_manager(d)
    mgr.save(int(state.step), args=ocp.args.StandardSave(state._asdict()))
    if block:
        mgr.wait_until_finished()


def wait_for_checkpoints() -> None:
    """Drain in-flight async saves (end of training / process exit)."""
    for mgr in _OPEN_MANAGERS.values():
        mgr.wait_until_finished()


def recover_or_init(ckpt_dir: str | Path | None, init_state: TrainState,
                    vocab_hash: str = "", hparams: dict | None = None
                    ) -> tuple[TrainState, bool]:
    """Restore the latest checkpoint if present, else the given init state.

    Returns (state, restored).  Mirrors the reference's recover_or_init
    (SURVEY.md §2 "TF session scaffold").
    """
    if ckpt_dir is None:
        return init_state, False
    d = Path(ckpt_dir)
    if not d.exists():
        return init_state, False
    mgr = _live_manager(d)
    latest = mgr.latest_step()
    if latest is None:
        return init_state, False
    meta_path = d / "meta.json"
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    if vocab_hash:
        stored = meta.get("vocab_hash", "")
        if stored and stored != vocab_hash:
            raise ValueError(
                f"checkpoint {d} was trained with a different vocab "
                f"(hash {stored} != {vocab_hash})")
    if hparams and meta.get("hparams"):
        mismatched = {k: (v, hparams[k])
                      for k, v in meta["hparams"].items()
                      if k in hparams and hparams[k] != v}
        for k, (saved, now) in mismatched.items():
            # Warn, don't fail: shape mismatches already fail loudly in
            # orbax; these are shape-compatible SEMANTIC changes where the
            # restore succeeds but computes a different function.
            print(f"warning: checkpoint {d} was trained with {k}={saved!r} "
                  f"but the config says {k}={now!r} — outputs will differ; "
                  f"pin --set {k}={saved} to match the checkpoint",
                  flush=True)
    abstract = jax.tree.map(
        ocp.utils.to_shape_dtype_struct, init_state._asdict())
    restored = mgr.restore(latest,
                           args=ocp.args.StandardRestore(abstract))
    return TrainState(**restored), True
