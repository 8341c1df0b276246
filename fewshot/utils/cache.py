"""Persistent XLA compilation cache.

Compiles on this target can take minutes (TPU executables are AOT-compiled);
caching them on disk makes every CLI after the first start in seconds.
Called by train/evaluate/sample/serve and bench.py; safe to call twice.
"""

from __future__ import annotations

from pathlib import Path

_DEFAULT = Path(__file__).resolve().parent.parent.parent / ".jax_cache"


def enable_compilation_cache(cache_dir: str | Path | None = None) -> None:
    import jax
    d = Path(cache_dir) if cache_dir else _DEFAULT
    d.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(d))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except AttributeError:  # older jax without the knobs
        pass
