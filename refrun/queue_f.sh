#!/bin/bash
# Round-5 queue F: sparse-label SDPF anchor (VERDICT r4 #6) then the
# 100-epoch extension of the resampling-active OT anchor (VERDICT r4 #4).
set -u
cd /root/repo/refrun
./run_job.sh ref_sdpf_r01 --trainType SDPF --labeledRatio 0.1
./run_job50.sh ref_rs_t50_ot_100 --resampler_type ot --num-epochs 100
echo "queue F done $(date)"
