#!/bin/sh
# Round-4 TPU queue, part 5: noise bars for the V=20000 frontier table
# and the serve tier at frontier vocab.
#
# Legs:
#   1. v20k_seeds — second seeds for the two headline V=20k legs
#      (plain_cache_full_s1, tfm_cache_full_s1) so the frontier
#      orderings carry the same measured noise bars as the V=5000 table
#   2. serve_v20k — the live /generate server on the V=20000 corpus with
#      the full cache stack ([B,V] mixture per decode step at 4x the
#      V=5000 vocab — the serving cost the r3 verdict asked to measure
#      at scale, now at the frontier shape)
#
# Chained behind queue4's completion marker (one TPU process at a time).
#
# Launch detached:  setsid nohup sh scripts/r4_queue5.sh >/dev/null 2>&1 &
# Watch:            tail -f benchmarks/r4_queue/queue5.log
cd /root/repo || exit 1
LOG=/root/repo/benchmarks/r4_queue
mkdir -p "$LOG"

while ! grep -q "queue4 complete" "$LOG/queue4.log" 2>/dev/null; do
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
  echo "=== $name start $(date -u '+%F %T')" >> "$LOG/queue5.log"
  if "$@" > "$LOG/$name.log" 2>&1; then
    touch "$LOG/$name.done"
    echo "=== $name OK $(date -u '+%F %T')" >> "$LOG/queue5.log"
  else
    echo "=== $name FAIL rc=$? $(date -u '+%F %T')" >> "$LOG/queue5.log"
    sleep 120
  fi
}

run v20k_seeds python scripts/scale_quality.py \
                      --root data/scale_lyrics_v20k \
                      --out benchmarks/scale_quality_v20k.json \
                      --scale_test_json /tmp/no_such_file.json \
                      --legs plain_cache_full_s1,tfm_cache_full_s1 \
                      --keep_existing
run serve_v20k python scripts/serve_bench.py \
                      --corpus_dir data/scale_lyrics_v20k/plain \
                      --cache --tag v20000_cache_full
echo "=== queue5 complete $(date -u '+%F %T')" >> "$LOG/queue5.log"
