#!/bin/sh
# Full local validation gauntlet: what the driver/judge will exercise.
# Usage: sh scripts/smoke.sh
set -e
cd "$(dirname "$0")/.."
echo "=== 1/4 test suite (8-device virtual CPU mesh) ==="
python -m pytest tests/ -x -q
echo "=== 2/4 driver dry run (8 virtual devices) ==="
XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
echo "=== 3/4 single-chip compile check ==="
python -c "
import jax, __graft_entry__ as g
fn, args = g.entry()
print('entry loss:', float(jax.jit(fn)(*args)))"
echo "=== 4/4 headline bench (real TPU) ==="
python bench.py
echo "=== smoke OK ==="
