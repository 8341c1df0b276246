#!/bin/sh
# Round-4 TPU queue, part 8: re-trace the episodic transformer after the
# stream-merged projections (models/transformer.py r4: QKV/wo/MLP each
# run once over the concatenated prefix+query token rows instead of
# twice over the separate streams).  Before: 9.91 ms/step device, 25.8%
# MFU, 1874-op flat profile (step_profile_v5000_tfm.json).  The merged
# reading goes to its own artifact so before/after coexist.
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
  echo "=== $name start $(date -u '+%F %T')" >> "$LOG/queue8.log"
  if "$@" > "$LOG/$name.log" 2>&1; then
    touch "$LOG/$name.done"
    echo "=== $name OK $(date -u '+%F %T')" >> "$LOG/queue8.log"
  else
    echo "=== $name FAIL rc=$? $(date -u '+%F %T')" >> "$LOG/queue8.log"
    sleep 120
  fi
}

run tfm_trace_merged python scripts/trace_audit.py --model transformer \
                            --corpus_dir data/scale_lyrics/plain \
                            --out benchmarks/step_profile_v5000_tfm_merged.json
echo "=== queue8 complete $(date -u '+%F %T')" >> "$LOG/queue8.log"
