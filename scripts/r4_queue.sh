#!/bin/sh
# Round-4 TPU measurement queue (r3 verdict items #1-#6, #9).
#
# Every leg is its own FRESH process (benchmark hygiene: a failed backend
# init is cached per-process; late-session eps/s readings drift), run one
# at a time behind a device probe-wait (bench.py wait_for_device) so a
# tunnel outage stalls the queue instead of failing it.  Idempotent: each
# leg drops a .done marker on success, so re-launching the script skips
# finished legs and retries failed ones.
#
# Launch detached:  setsid nohup sh scripts/r4_queue.sh >/dev/null 2>&1 &
# Watch:            tail -f benchmarks/r4_queue/queue.log
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
  echo "=== $name start $(date -u '+%F %T')" >> "$LOG/queue.log"
  if "$@" > "$LOG/$name.log" 2>&1; then
    touch "$LOG/$name.done"
    echo "=== $name OK $(date -u '+%F %T')" >> "$LOG/queue.log"
  else
    echo "=== $name FAIL rc=$? $(date -u '+%F %T')" >> "$LOG/queue.log"
    sleep 120
  fi
}

# Ordered by verdict rank; sample_bench sessions interleaved so the three
# "fresh sessions" the cross-session median needs are genuinely separated
# in time by other work.  (cache_speed_recheck already ran + committed its
# before/after artifact earlier this round — deliberately NOT re-run here,
# a re-run would overwrite the hand-annotated before/after structure.)
run tfm         python scripts/scale_quality.py --legs tfm --keep_existing
run sample1     python scripts/sample_bench.py
run tfm_cache   python scripts/scale_quality.py --legs tfm_cache_full \
                       --keep_existing
run sample2     python scripts/sample_bench.py
run ft          python scripts/scale_quality.py --legs plain_ft \
                       --keep_existing
run ft_cache    python scripts/scale_quality.py --legs plain_ft_cache_full \
                       --keep_existing
run sample3     python scripts/sample_bench.py
run seeds       python scripts/scale_quality.py \
                       --legs plain_cache_full_s1,plain_cache_freq_s1,bpe_cache_freq_s1 \
                       --keep_existing
run midi_cache  python scripts/midi_scale.py --legs plain_cache \
                       --keep_existing
run serve_v5000 python scripts/serve_bench.py \
                       --corpus_dir data/scale_lyrics/plain --cache
echo "=== queue complete $(date -u '+%F %T')" >> "$LOG/queue.log"
