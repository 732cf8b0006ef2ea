#!/bin/bash
# Round-5 chip batch 2:
#  - CGLOW h2h with encode_per_step (BN-granularity mechanism test for the
#    ~1.5px CGLOW gap — ref seeds now cluster 10.4-10.7 vs repo 12.0-12.5,
#    so seed variance is falsified and BN granularity is the next candidate)
set -u
cd /root/repo
H2H="--batch 16 --seq-len 25 --init-true --sequences 160 --data-dir refrun/data/disk/TwentyfiveDistractors"
timeout 7200 python experiments/rmse_run.py --out experiments/h2h_cglow_eps_seed2.json \
  --config cglow $H2H --epochs 60 --seed 2 --encode-per-step 2>&1 | grep -E "^epoch|best|Error" | tail -3
echo "r5 batch2 done $(date)"
