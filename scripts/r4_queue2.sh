#!/bin/sh
# Round-4 TPU queue, part 2: the V=20000 vocab frontier.
#
# ROADMAP r3 deferred sampled-softmax/two-level heads as "a V>>5000
# item"; r4 built the vocab-tiled flash-CE plan (ops/head_ce.py) and a
# V=20000 corpus (data/scale_lyrics_v20k: 2000 artists x 50 songs, 6.0M
# tokens, 0.94% UNK) to measure that regime for real.  Legs:
#   1. tpu_checks -- on-chip parity of the tiled plan (incl. the
#      15200x256x20000 frontier shape) + fused-vs-dense CE bench
#   2. scale_quality at V=20k: plain and full-cache legs to convergence
#      (same early-stopping protocol as the canonical V=5000 run)
#   3. a device trace of the V=20k step for the MFU/attribution story
#
# Same conventions as r4_queue.sh: fresh process per leg, probe-wait in
# front (tunnel outages stall, not fail), idempotent .done markers.
# Waits for part 1 to finish so the chip is never shared.
#
# Launch detached:  setsid nohup sh scripts/r4_queue2.sh >/dev/null 2>&1 &
# Watch:            tail -f benchmarks/r4_queue/queue2.log
cd /root/repo || exit 1
LOG=/root/repo/benchmarks/r4_queue
mkdir -p "$LOG"

while ! grep -q "queue complete" "$LOG/queue.log" 2>/dev/null; do
  sleep 120
done

probe() {
  python -c "import sys; sys.path.insert(0, '/root/repo'); \
from bench import wait_for_device; wait_for_device(14400)"
}

run() {
  name=$1; shift
  if [ -f "$LOG/$name.done" ]; then return 0; fi
  probe
  echo "=== $name start $(date -u '+%F %T')" >> "$LOG/queue2.log"
  if "$@" > "$LOG/$name.log" 2>&1; then
    touch "$LOG/$name.done"
    echo "=== $name OK $(date -u '+%F %T')" >> "$LOG/queue2.log"
  else
    echo "=== $name FAIL rc=$? $(date -u '+%F %T')" >> "$LOG/queue2.log"
    sleep 120
  fi
}

run tpu_checks   python scripts/tpu_checks.py
run v20k_plain   python scripts/scale_quality.py \
                        --root data/scale_lyrics_v20k \
                        --out benchmarks/scale_quality_v20k.json \
                        --scale_test_json /tmp/no_such_file.json \
                        --legs plain --keep_existing
run v20k_cache   python scripts/scale_quality.py \
                        --root data/scale_lyrics_v20k \
                        --out benchmarks/scale_quality_v20k.json \
                        --scale_test_json /tmp/no_such_file.json \
                        --legs plain_cache_full --keep_existing
run v20k_trace   python scripts/trace_audit.py \
                        --corpus_dir data/scale_lyrics_v20k/plain \
                        --out benchmarks/step_profile_v20k.json
echo "=== queue2 complete $(date -u '+%F %T')" >> "$LOG/queue2.log"
