#!/usr/bin/env bash
# Run every demo serially — equivalent of the reference's run.sh
# (reference: run.sh:1-12, which runs the RAFT self-test then the 7
# compiled demo executables). Demos write PNGs into demos/output/.
set -e
cd "$(dirname "$0")"

python3 raft_demo.py
python3 track_demo.py
python3 dense_flow_demo.py
python3 direct_method_demo.py
python3 match_brief_demo.py
python3 match_superpoint_demo.py
python3 match_disk_demo.py
python3 nn_matcher_demo.py
python3 stream_demo.py
python3 slam_demo.py
python3 cotracker_demo.py
