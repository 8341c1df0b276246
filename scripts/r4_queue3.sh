#!/bin/sh
# Round-4 TPU queue, part 3: the cache_lm_aux fix for mixture gradient
# starvation (the collapsed MIDI plain_cache leg — RESULTS.md, r4).
#
# Legs:
#   1. midi_cache_aux — re-run the collapsed MIDI cache leg with the
#      auxiliary LM-branch loss (the fix's raison d'être: does the
#      mixture now train to >= the plain LSTM's 1.304?)
#   2. v5000_aux — plain_cache_full + aux at the canonical V=5000 scale
#      (harmless-or-better check where the stack already trains)
#   3. v20k_aux — same leg on the V=20000 corpus (its cache_full train
#      loss was also near-flat; aux may claw real quality there)
#
# Same conventions as r4_queue.sh: fresh process per leg, probe-wait in
# front, idempotent .done markers.
#
# Launch detached:  setsid nohup sh scripts/r4_queue3.sh >/dev/null 2>&1 &
# Watch:            tail -f benchmarks/r4_queue/queue3.log
cd /root/repo || exit 1
LOG=/root/repo/benchmarks/r4_queue
mkdir -p "$LOG"

probe() {
  python -c "import sys; sys.path.insert(0, '/root/repo'); \
from bench import wait_for_device; wait_for_device(14400)"
}

run() {
  name=$1; shift
  if [ -f "$LOG/$name.done" ]; then return 0; fi
  probe
  echo "=== $name start $(date -u '+%F %T')" >> "$LOG/queue3.log"
  if "$@" > "$LOG/$name.log" 2>&1; then
    touch "$LOG/$name.done"
    echo "=== $name OK $(date -u '+%F %T')" >> "$LOG/queue3.log"
  else
    echo "=== $name FAIL rc=$? $(date -u '+%F %T')" >> "$LOG/queue3.log"
    sleep 120
  fi
}

run midi_cache_aux python scripts/midi_scale.py --legs plain_cache_aux \
                          --keep_existing
run v5000_aux      python scripts/scale_quality.py \
                          --legs plain_cache_full_aux --keep_existing
run v20k_aux       python scripts/scale_quality.py \
                          --root data/scale_lyrics_v20k \
                          --out benchmarks/scale_quality_v20k.json \
                          --scale_test_json /tmp/no_such_file.json \
                          --legs plain_cache_full_aux --keep_existing
echo "=== queue3 complete $(date -u '+%F %T')" >> "$LOG/queue3.log"
