#!/bin/bash
# Round-5 queue E: CGLOW reference-side seed spread (VERDICT r4 #3).
# Two sequential h2h-protocol CGLOW runs, seeds 3 and 4, to test whether
# the reference's seed spread brackets the repo's 12.0-12.5 px cluster.
set -u
cd /root/repo/refrun
./run_job.sh ref_cglow_s3 --measurement CGLOW --NF-dyn --resampler_type soft --seed 3
./run_job.sh ref_cglow_s4 --measurement CGLOW --NF-dyn --resampler_type soft --seed 4
echo "queue E done $(date)"
