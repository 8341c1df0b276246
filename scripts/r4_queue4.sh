#!/bin/sh
# Round-4 TPU queue, part 4: the transformer family at the V=20000
# frontier, and the aux loss on the best model.
#
# Legs:
#   1. v20k_tfm — episodic transformer bare at V=20000 (does the
#      "attention helps but can't replace counts" lesson scale 4x?)
#   2. v20k_tfm_cache — transformer + full cache stack at V=20000 (is
#      the best V=5000 model still the best at the frontier?)
#   3. v5000_tfm_aux — tfm_cache_full + cache_lm_aux at V=5000 (the
#      best model sits 0.048 nats from the measured Bayes bound; does a
#      full-strength LM-branch gradient claw any of what remains?)
#
# Chained: waits for queue3's completion marker before touching the
# chip (only one TPU process at a time — CLAUDE.md).
#
# Launch detached:  setsid nohup sh scripts/r4_queue4.sh >/dev/null 2>&1 &
# Watch:            tail -f benchmarks/r4_queue/queue4.log
cd /root/repo || exit 1
LOG=/root/repo/benchmarks/r4_queue
mkdir -p "$LOG"

while ! grep -q "queue3 complete" "$LOG/queue3.log" 2>/dev/null; do
  sleep 60
done

probe() {
  python -c "import sys; sys.path.insert(0, '/root/repo'); \
from bench import wait_for_device; wait_for_device(14400)"
}

run() {
  name=$1; shift
  if [ -f "$LOG/$name.done" ]; then return 0; fi
  probe
  echo "=== $name start $(date -u '+%F %T')" >> "$LOG/queue4.log"
  if "$@" > "$LOG/$name.log" 2>&1; then
    touch "$LOG/$name.done"
    echo "=== $name OK $(date -u '+%F %T')" >> "$LOG/queue4.log"
  else
    echo "=== $name FAIL rc=$? $(date -u '+%F %T')" >> "$LOG/queue4.log"
    sleep 120
  fi
}

run v20k_tfm       python scripts/scale_quality.py \
                          --root data/scale_lyrics_v20k \
                          --out benchmarks/scale_quality_v20k.json \
                          --scale_test_json /tmp/no_such_file.json \
                          --legs tfm --keep_existing
run v20k_tfm_cache python scripts/scale_quality.py \
                          --root data/scale_lyrics_v20k \
                          --out benchmarks/scale_quality_v20k.json \
                          --scale_test_json /tmp/no_such_file.json \
                          --legs tfm_cache_full --keep_existing
run v5000_tfm_aux  python scripts/scale_quality.py \
                          --legs tfm_cache_full_aux --keep_existing
echo "=== queue4 complete $(date -u '+%F %T')" >> "$LOG/queue4.log"
