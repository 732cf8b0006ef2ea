#!/bin/bash
# Round-3 TPU batch 1: torch-init head-to-head (VERDICT r2 #1), repo-side
# anchors for SDPF/CGLOW (#2), and extended-budget bootstrap curves (#1).
set -u
cd /root/repo
H2H="--batch 16 --seq-len 25 --init-true --sequences 160 --data-dir refrun/data/disk/TwentyfiveDistractors"
run() {
  tag=$1; shift
  echo "=== $tag $(date +%T) ==="
  python experiments/rmse_run.py --out experiments/${tag}.json "$@" 2>&1 | tail -2
}
run h2h_ti_seed2 --config bootstrap $H2H --epochs 60 --seed 2 --torch-init
run h2h_ti_seed3 --config bootstrap $H2H --epochs 60 --seed 3 --torch-init
run h2h_ti_seed4 --config bootstrap $H2H --epochs 60 --seed 4 --torch-init
run h2h_sdpf_seed2 --config bootstrap $H2H --epochs 60 --seed 2 \
    --train-type SDPF --labeled-ratio 0.5
run h2h_cglow_seed2 --config cglow $H2H --epochs 60 --seed 2
run h2h_boot200_ti_seed2 --config bootstrap $H2H --epochs 200 --seed 2 --torch-init
run h2h_boot200_ti_seed3 --config bootstrap $H2H --epochs 200 --seed 3 --torch-init
run h2h_boot200_seed2 --config bootstrap $H2H --epochs 200 --seed 2
run h2h_boot200_seed3 --config bootstrap $H2H --epochs 200 --seed 3
echo "r3 batch1 done $(date)"
