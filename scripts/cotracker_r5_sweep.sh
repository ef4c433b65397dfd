#!/bin/sh
# Round-5 CoTracker sweep (VERDICT r4 item 4): the three new levers on
# top of the r4-best recipe (3000 steps, lr 5e-5, batch 2, wide motion,
# all-iteration loss, EMA) are (a) the sinusoidal time encoding — the r4
# time attention was frame-order-blind, (b) REAL KITTI-video samples
# with forward-backward-verified KLT pseudo-labels mixed into the pool,
# (c) model capacity. The (epe < prev) gate in cotracker_pretrain ships
# only improvements; every run's aggregate line is appended to the log.
set -x
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/cotracker_sweep.log}
run() {
  echo "=== $* ===" >> "$LOG"
  timeout 2000 python3 -m feature_tracker_tpu.train.cotracker_pretrain \
    "$@" 2>&1 | tail -4 >> "$LOG"
}
# (1) r4-best + time encoding (the architecture fix alone)
run steps=3000 lr_micro=50 batch=2 time_enc=1
# (2) + real video mixed in
run steps=3000 lr_micro=50 batch=2 time_enc=1 real_pct=30
run steps=3000 lr_micro=50 batch=2 time_enc=1 real_pct=50
# (3) capacity at batch 4 (r4: batch 4 tolerates 1e-4)
run steps=3000 lr_micro=100 batch=4 time_enc=1 real_pct=30 \
  model_dim=192 depth=3
# (4) longer run at the safe LR (EMA ships; r4 instability was pre-fix)
run steps=6000 lr_micro=50 batch=2 time_enc=1 real_pct=30
echo done >> "$LOG"
