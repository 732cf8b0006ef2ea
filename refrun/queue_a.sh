#!/bin/bash
# Round-3 reference anchor queue, slot A (VERDICT r2 #1/#2).
set -u
./run_job.sh ref_crnvp_s2 --measurement CRNVP
./run_job.sh ref_cglow_s2 --measurement CGLOW --NF-dyn --resampler_type soft
./run_job.sh ref_boot200_s2 --num-epochs 200
echo "queue A done $(date)"
