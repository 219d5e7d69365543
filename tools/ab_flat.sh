#!/bin/bash
# A/B: plane-streaming vs folded-plane kernel preference, end-to-end benches
# (tunnel micro-probes under-measure; bench.py/bench_train.py are the arbiter).
# Serial — one TPU process at a time.
set -u
cd /root/repo
LOG=/tmp/ab_flat.log
: > $LOG
run() {
  echo "=== $* ($(date +%H:%M:%S))" >> $LOG
  timeout 3600 "$@" >> $LOG 2>&1
  echo "--- exit $? ($(date +%H:%M:%S))" >> $LOG
}
run python bench.py
run python bench_train.py
run python bench_hyperfine.py
export SYNTHSR_PREFER_FLAT=1
run python bench.py
run python bench_train.py
echo "ALL DONE" >> $LOG
