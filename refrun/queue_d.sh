#!/bin/bash
# Round-4 queue D: resampling-active parity anchors (VERDICT r3 #5).
# Waits for the boot200 reference run to free a core, then runs the two
# T=50/uniform-init bootstrap reference runs (soft and ot) IN PARALLEL —
# by then cglow_long is finished too, so each gets a core.
set -u
cd /root/repo/refrun
while pgrep -f "jobs/ref_boot200_s3" > /dev/null 2>&1; do sleep 60; done
./run_job50.sh ref_rs_t50_soft --resampler_type soft &
./run_job50.sh ref_rs_t50_ot --resampler_type ot &
wait
echo "queue D done $(date)"
