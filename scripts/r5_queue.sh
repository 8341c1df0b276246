#!/bin/bash
# Round-5 TPU measurement queue (detached; survives session crashes).
# Pattern: scripts/r4_queue*.sh — probe-wait before each leg, idempotent
# .done markers in benchmarks/r5_queue/, per-leg stdout in <leg>.log.
#
# Legs (r4 verdict order):
#   bench_smoke      — one bench.py run: proves the driver-proofed path
#                      yields a parseable line end-to-end (verdict #2)
#   tpu_checks       — on-chip parity incl. the new resident-plan flagship
#                      shape + the 3-plan attention bench (verdict #1)
#   v5000_tfm_s1     — second seed for tfm_cache_full @ V=5000 (verdict #4)
#   speed_sweep      — ONE-protocol eps/s sweep over all current legs
#                      incl. tfm + aux (verdict #5)
#   midi_tfm         — transformer on MIDI at scale (verdict #3)
#   midi_tfm_aux     — starvation pathology under attention (verdict #3)
#   midi_bpe_cache   — second measured point for the coverage-keyed
#   midi_bpe_aux       starvation boundary, V=504/cov 0.99 (verdict #6)
#   sample_dev       — sampling session recording tokens/device-sec from a
#                      profiler trace (verdict #7)
cd /root/repo || exit 1
LOG=benchmarks/r5_queue
mkdir -p "$LOG"

probe() {
  until python - <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
from bench import wait_for_device
sys.exit(0 if wait_for_device(14400) else 1)
EOF
  do
    echo "=== probe exhausted, re-probing $(date -u '+%F %T')" \
      >> "$LOG/queue.log"
    sleep 120
  done
}

run() {
  name=$1; shift
  if [ -f "$LOG/$name.done" ]; then return 0; fi
  probe
  echo "=== $name start $(date -u '+%F %T')" >> "$LOG/queue.log"
  if "$@" > "$LOG/$name.log" 2>&1; then
    touch "$LOG/$name.done"
    echo "=== $name OK $(date -u '+%F %T')" >> "$LOG/queue.log"
  else
    echo "=== $name FAIL rc=$? $(date -u '+%F %T')" >> "$LOG/queue.log"
    sleep 120
  fi
}

run bench_smoke    python bench.py
run tpu_checks     python scripts/tpu_checks.py
run v5000_tfm_s1   python scripts/scale_quality.py \
                     --legs tfm_cache_full_s1 --keep_existing
run speed_sweep    python scripts/cache_speed_recheck.py
run midi_tfm       python scripts/midi_scale.py --legs tfm --keep_existing
run midi_tfm_aux   python scripts/midi_scale.py --legs tfm_cache_aux \
                     --keep_existing
run midi_bpe_cache python scripts/midi_scale.py --legs bpe_cache \
                     --keep_existing
run midi_bpe_aux   python scripts/midi_scale.py --legs bpe_cache_aux \
                     --keep_existing
run sample_dev     python scripts/sample_bench.py
echo "=== queue complete $(date -u '+%F %T')" >> "$LOG/queue.log"
