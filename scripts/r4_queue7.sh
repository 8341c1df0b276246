#!/bin/sh
# Round-4 TPU queue, part 7: fresh re-measurement of the V=5000 serve
# leg.  The V=20000 full-cache serve measured 28.1 req/s / p50 139ms —
# FASTER than the earlier V=5000 full-cache reading (14.9 req/s / p50
# 224ms) at identical max_len and stack, which is physically backwards
# (the [B,V] mixture is 4x larger at 20k).  Per the repo's measurement
# hygiene (re-measure before believing), re-run the V=5000 leg fresh;
# the artifact key is overwritten with the new reading.
#
# Chained behind queue6's completion marker (one TPU process at a time).
cd /root/repo || exit 1
LOG=/root/repo/benchmarks/r4_queue
mkdir -p "$LOG"

while ! grep -q "queue6 complete" "$LOG/queue6.log" 2>/dev/null; do
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
  echo "=== $name start $(date -u '+%F %T')" >> "$LOG/queue7.log"
  if "$@" > "$LOG/$name.log" 2>&1; then
    touch "$LOG/$name.done"
    echo "=== $name OK $(date -u '+%F %T')" >> "$LOG/queue7.log"
  else
    echo "=== $name FAIL rc=$? $(date -u '+%F %T')" >> "$LOG/queue7.log"
    sleep 120
  fi
}

run serve_v5000_recheck python scripts/serve_bench.py \
                               --corpus_dir data/scale_lyrics/plain \
                               --cache --tag v5000_cache_full
echo "=== queue7 complete $(date -u '+%F %T')" >> "$LOG/queue7.log"
