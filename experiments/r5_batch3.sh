#!/bin/bash
# Round-5 chip batch 3: repo-side seed spread for the resampling-active
# anchors (seed 3, 100 epochs, both resamplers) — guards the repo's lead
# against the same seed-luck critique the CGLOW gap received.
set -u
cd /root/repo
T50="--batch 16 --seq-len 50 --sequences 160 --data-dir refrun/data/disk/TwentyfiveDistractorsT50"
run() {
  tag=$1; shift
  echo "=== $tag $(date +%T) ==="
  timeout 7200 python experiments/rmse_run.py --out experiments/${tag}.json "$@" 2>&1 | grep -E "^epoch|best|Error" | tail -3
}
run rs_t50_soft_seed3 --config soft $T50 --epochs 100 --seed 3 --torch-init
run rs_t50_ot_seed3 --config bootstrap $T50 --epochs 100 --seed 3 --torch-init
echo "r5 batch3 done $(date)"
