#!/bin/bash
# Round-5 chip batch 1 (runs alongside the config-5 chunked driver):
#  - extend the resampling-active parity anchors to 100 epochs, both
#    resamplers (VERDICT r4 #4) — resumes the round-4 checkpoints
#  - sparse-label SDPF anchor at labeledRatio=0.1 (VERDICT r4 #6),
#    same protocol as the 0.5 anchor
#  - encode_per_step BN ablation at the rs_t50 soft protocol (VERDICT r4
#    weak #3 mechanism test): if the repo's 5-7 px lead vanishes under
#    per-step BN statistics, the mechanism is BN granularity
set -u
cd /root/repo
T50="--batch 16 --seq-len 50 --sequences 160 --data-dir refrun/data/disk/TwentyfiveDistractorsT50"
H2H="--batch 16 --seq-len 25 --init-true --sequences 160 --data-dir refrun/data/disk/TwentyfiveDistractors"
run() {
  tag=$1; shift
  echo "=== $tag $(date +%T) ==="
  timeout 7200 python experiments/rmse_run.py --out experiments/${tag}.json "$@" 2>&1 | grep -E "^epoch|resumed|best|Error" | tail -4
}
run rs_t50_soft_seed2 --config soft $T50 --epochs 100 --seed 2 --torch-init --resume
run h2h_sdpf_r01_seed2 --config bootstrap $H2H --epochs 60 --seed 2 --train-type SDPF --labeled-ratio 0.1
run rs_t50_soft_eps_seed2 --config soft $T50 --epochs 25 --seed 2 --torch-init --encode-per-step
run rs_t50_ot_seed2 --config bootstrap $T50 --epochs 100 --seed 2 --torch-init --resume
echo "r5 batch1 done $(date)"
