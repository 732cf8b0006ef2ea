#!/bin/bash
# Round-3 TPU batch 1b: remainder of r3_batch1.sh after the session restart
# (ti_seed2/3 already recorded).  Torch-init seed 4, repo-side SDPF/CGLOW
# anchors at the h2h protocol, extended-budget bootstrap curves.
set -u
cd /root/repo
H2H="--batch 16 --seq-len 25 --init-true --sequences 160 --data-dir refrun/data/disk/TwentyfiveDistractors"
run() {
  tag=$1; shift
  echo "=== $tag $(date +%T) ==="
  python experiments/rmse_run.py --out experiments/${tag}.json "$@" 2>&1 | tail -2
}
run h2h_ti_seed4 --config bootstrap $H2H --epochs 60 --seed 4 --torch-init
run h2h_sdpf_seed2 --config bootstrap $H2H --epochs 60 --seed 2 \
    --train-type SDPF --labeled-ratio 0.5
run h2h_cglow_seed2 --config cglow $H2H --epochs 60 --seed 2
run h2h_boot200_ti_seed2 --config bootstrap $H2H --epochs 200 --seed 2 --torch-init
run h2h_boot200_ti_seed3 --config bootstrap $H2H --epochs 200 --seed 3 --torch-init
run h2h_boot200_seed2 --config bootstrap $H2H --epochs 200 --seed 2
run h2h_boot200_seed3 --config bootstrap $H2H --epochs 200 --seed 3
echo "r3 batch1b done $(date)"
