#!/bin/sh
# Round-4 TPU queue, part 9: per-bin gap decomposition of the BEST model
# family (the episodic transformer + cache stack) at V=5000 —
# gap_analysis.py --model transformer (new r4), calib leg for
# comparability with gap_analysis_calib.json (LSTM).  Answers "where do
# the best model's remaining nats vs the oracle/Bayes bound live?"
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
  echo "=== $name start $(date -u '+%F %T')" >> "$LOG/queue9.log"
  if "$@" > "$LOG/$name.log" 2>&1; then
    touch "$LOG/$name.done"
    echo "=== $name OK $(date -u '+%F %T')" >> "$LOG/queue9.log"
  else
    echo "=== $name FAIL rc=$? $(date -u '+%F %T')" >> "$LOG/queue9.log"
    sleep 120
  fi
}

run gap_tfm python scripts/gap_analysis.py --model transformer \
                   --cache_calib \
                   --out benchmarks/gap_analysis_tfm.json
echo "=== queue9 complete $(date -u '+%F %T')" >> "$LOG/queue9.log"
