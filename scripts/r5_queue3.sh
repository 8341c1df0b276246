#!/bin/bash
# Round-5 TPU queue, part 3 (detached; survives session crashes).
#
# Restores the measurements lost to the 2026-08-19 21:37 sandbox
# snapshot restore (the cache_resp_floor implementation + these legs'
# artifacts were in the working tree / artifact files but uncommitted;
# RESULTS.md/ROADMAP.md had already recorded the healthy-half numbers):
#
#   midi_tfm_cache   — transformer + full cache WITHOUT the aux fix on
#                      plain MIDI (backs the committed 1.264 claim)
#   v5000_floor      — plain_cache_full_floor{,_s1}: responsibility
#                      floor, healthy regime (backs 4.6089/4.6099)
#   midi_floor       — plain_cache_floor{,_s1}: responsibility floor,
#                      STARVED regime — the outstanding half of the
#                      pre-registered study (ROADMAP.md r5 ledger #2)
#   tfm_v5000_floor  — tfm_cache_full_floor{,_s1}: the queued follow-up
#                      on the best-quality model
#   bench_smoke      — bench.py end-to-end so BENCH_r05 is exercised
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

run midi_tfm_cache2 python scripts/midi_scale.py --legs tfm_cache \
                      --keep_existing
run v5000_floor     python scripts/scale_quality.py \
                      --legs plain_cache_full_floor,plain_cache_full_floor_s1 \
                      --keep_existing
run midi_floor      python scripts/midi_scale.py \
                      --legs plain_cache_floor,plain_cache_floor_s1 \
                      --keep_existing
run tfm_v5000_floor python scripts/scale_quality.py \
                      --legs tfm_cache_full_floor,tfm_cache_full_floor_s1 \
                      --keep_existing
run bench_smoke2    python bench.py
echo "=== queue3 complete $(date -u '+%F %T')" >> "$LOG/queue.log"
