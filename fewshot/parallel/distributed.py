"""Multi-process (multi-host) initialization.

Single-host slices need none of this: `make_mesh` spans the local chips.
For multi-host topologies, launch one process per host with:

    FEWSHOT_COORDINATOR=<host0>:<port> FEWSHOT_NUM_PROCESSES=<N> \\
    FEWSHOT_PROCESS_ID=<i> python train.py ...

`maybe_initialize()` (called by every CLI before touching devices) then
brings up `jax.distributed`, after which `jax.devices()` is GLOBAL and the
1-D data mesh spans all hosts — gradient/loss psums ride ICI within a slice
and DCN across slices, with no further code changes (episode sampling
already folds the PRNG per global mesh index, so hosts draw disjoint
episodes).

Verified in-repo with 2 processes x 2 virtual CPU devices
(tests/test_distributed.py); real multi-host TPU runs use the same env
variables.
"""

from __future__ import annotations

import os


def maybe_initialize() -> bool:
    """Initialize jax.distributed from FEWSHOT_* env vars if present."""
    coord = os.environ.get("FEWSHOT_COORDINATOR")
    if not coord:
        return False
    import jax
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["FEWSHOT_NUM_PROCESSES"]),
        process_id=int(os.environ["FEWSHOT_PROCESS_ID"]))
    return True


def is_primary() -> bool:
    """True on the process that should own logging/printing."""
    import jax
    return jax.process_index() == 0
