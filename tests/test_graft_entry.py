"""Driver contract: entry() compiles and dryrun_multichip runs on the
8-device virtual mesh (same path the external driver exercises)."""

import jax
import numpy as np


def test_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    assert jax.device_count() == 8
    g.dryrun_multichip(8)   # asserts internally
