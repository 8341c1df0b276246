#!/bin/sh
# Round-4 TPU queue, part 6: device-trace audit of the episodic
# transformer at the canonical V=5000 scale, against the new exact
# hand FLOP model (scripts/trace_audit.py tfm_flop_model) — the second
# model family gets the same MFU accountability the LSTM has had since
# r3 (step_profile_v5000.json).
#
# Chained behind queue5's completion marker (one TPU process at a time).
#
# Launch detached:  setsid nohup sh scripts/r4_queue6.sh >/dev/null 2>&1 &
# Watch:            tail -f benchmarks/r4_queue/queue6.log
cd /root/repo || exit 1
LOG=/root/repo/benchmarks/r4_queue
mkdir -p "$LOG"

while ! grep -q "queue5 complete" "$LOG/queue5.log" 2>/dev/null; do
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
  echo "=== $name start $(date -u '+%F %T')" >> "$LOG/queue6.log"
  if "$@" > "$LOG/$name.log" 2>&1; then
    touch "$LOG/$name.done"
    echo "=== $name OK $(date -u '+%F %T')" >> "$LOG/queue6.log"
  else
    echo "=== $name FAIL rc=$? $(date -u '+%F %T')" >> "$LOG/queue6.log"
    sleep 120
  fi
}

run tfm_trace python scripts/trace_audit.py --model transformer \
                     --corpus_dir data/scale_lyrics/plain \
                     --out benchmarks/step_profile_v5000_tfm.json
echo "=== queue6 complete $(date -u '+%F %T')" >> "$LOG/queue6.log"
