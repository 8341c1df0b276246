"""Device mesh + shard_map wrapper for episode-level data parallelism.

Design (SURVEY.md §3, BASELINE.json:11): a 1-D `data` mesh over every chip in
the slice.  Parameters are replicated; each chip derives its own PRNG fold,
samples its own slice of the episode meta-batch on device, computes local
(grads, ce_sum, token_count), and all three are `psum`-reduced over ICI.
Dividing the psum'd CE sum by the psum'd token count AFTER the reduction
keeps the masked NLL exact under sharding (chips see different ragged
lengths).

TP/PP/EP are deliberately absent: the models are tiny relative to a chip
(SURVEY.md §3) — the scaling axis is the meta-batch.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    """1-D data mesh over all visible devices (v5e-8 => 8 chips)."""
    import numpy as np
    devs = np.array(devices if devices is not None else jax.devices())
    return Mesh(devs, (AXIS,))


def shard_step(mesh: Mesh, local_fn):
    """Wrap `local_fn(params, key) -> (grads, ce_sum, count)` in shard_map.

    Each shard folds the step key with its mesh index so chips draw disjoint
    episodes; outputs are psum'd so every chip returns identical values
    (out_specs=P() — replicated).
    """
    def wrapped(params, key):
        idx = jax.lax.axis_index(AXIS)
        shard_key = jax.random.fold_in(key, idx)
        grads, total, count = local_fn(params, shard_key)
        grads = jax.lax.psum(grads, AXIS)
        total = jax.lax.psum(total, AXIS)
        count = jax.lax.psum(count, AXIS)
        return grads, total, count

    return shard_map(wrapped, mesh=mesh, in_specs=(P(), P()),
                     out_specs=(P(), P(), P()), check_vma=False)
