#!/bin/bash
# Round-5 TPU queue, part 2 (detached; survives session crashes).
#
# Legs:
#   sample_rev2     — first rev-2 sampling session (device-trace headline,
#                     40-batch wall brackets; the rev-1 sessions are
#                     retired as relay artifacts — see sample_bench.py)
#   midi_tfm_cache  — transformer + full cache WITHOUT the aux fix on
#                     plain MIDI: does the attention mixture starve the
#                     way the LSTM did (plain_cache collapsed to 2.739)?
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

run sample_rev2    python scripts/sample_bench.py
run midi_tfm_cache python scripts/midi_scale.py --legs tfm_cache \
                     --keep_existing
echo "=== queue2 complete $(date -u '+%F %T')" >> "$LOG/queue.log"
