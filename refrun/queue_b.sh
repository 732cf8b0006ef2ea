#!/bin/bash
# Round-3 reference anchor queue, slot B (VERDICT r2 #1/#2).
set -u
./run_job.sh ref_sdpf_s2 --trainType SDPF --labeledRatio 0.5
./run_job.sh ref_boot200_s3 --num-epochs 200 --seed 3
./run_job.sh ref_crnvp_s3 --measurement CRNVP --seed 3
echo "queue B done $(date)"
