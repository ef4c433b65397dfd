#!/bin/sh
# Round-5 CoTracker sweep (VERDICT r4 item 4). Run 1 (r4-best recipe +
# the new sinusoidal time encoding) DIVERGED: loss 95 / EPE 19.33 vs the
# r4 3.47 at identical settings — the unit-amplitude time tokens
# destabilize training at lr 5e-5 / batch 2 (recorded in BASELINE.md).
# This sweep therefore isolates the REAL-DATA and CAPACITY levers with
# the encoding off, and retries the encoding once at half LR. The
# (epe < prev) gate in cotracker_pretrain ships only improvements.
set -x
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/cotracker_sweep.log}
run() {
  echo "=== $* ===" >> "$LOG"
  timeout 2400 python3 -m feature_tracker_tpu.train.cotracker_pretrain \
    "$@" 2>&1 | tail -4 >> "$LOG"
}
# (1) the real-video lever alone on the r4-best recipe
run steps=3000 lr_micro=50 batch=2 time_enc=0 real_pct=30
run steps=3000 lr_micro=50 batch=2 time_enc=0 real_pct=50
# (2) capacity at batch 4 (r4: batch 4 tolerates 1e-4)
run steps=3000 lr_micro=100 batch=4 time_enc=0 real_pct=30 \
  model_dim=192 depth=3
# (3) time encoding stability retry at half LR
run steps=3000 lr_micro=25 batch=2 time_enc=1 real_pct=30
echo done >> "$LOG"
