#!/bin/bash
# A/B: SVF integration policy in the synth-train step (stencil mix vs
# all-gather vs runtime-bounded stencil dispatch), end-to-end on bench_train
# — micro-probes on this platform are unreliable (see probe_warp notes).
# Serial — one TPU process at a time.
set -u
cd /root/repo
LOG=/tmp/ab_svf.log
: > $LOG
run() {
  echo "=== $* [SVF_GATHER=${SYNTHSR_SVF_GATHER:-0} RUNTIME_STENCIL=${SYNTHSR_RUNTIME_STENCIL:-0}] ($(date +%H:%M:%S))" >> $LOG
  timeout 3600 "$@" >> $LOG 2>&1
  echo "--- exit $? ($(date +%H:%M:%S))" >> $LOG
}
run python bench_train.py                            # baseline (stencil mix)
SYNTHSR_SVF_GATHER=1 run python bench_train.py       # all-gather integration
SYNTHSR_RUNTIME_STENCIL=1 run python bench_train.py  # runtime cond dispatch
echo "ALL DONE" >> $LOG
