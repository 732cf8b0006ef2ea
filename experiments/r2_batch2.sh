#!/bin/bash
# Round-2 TPU batch 2: equal-budget particle-count table, CGLOW with AE
# pretraining, and repo-side head-to-head runs for the soft and CRNVP
# configs (reference counterparts run on CPU via refrun/).
set -u
cd /root/repo
H2H="--epochs 60 --batch 16 --seq-len 25 --init-true --sequences 160 --data-dir refrun/data/disk/TwentyfiveDistractors"
run() {
  tag=$1; shift
  echo "=== $tag $(date +%T) ==="
  python experiments/rmse_run.py --out experiments/${tag}.json "$@" 2>&1 | tail -2
}
run h2h_soft_seed2   --config soft  $H2H --seed 2
run h2h_soft_seed3   --config soft  $H2H --seed 3
run h2h_crnvp_seed2  --config crnvp $H2H --seed 2
run h2h_crnvp_seed3  --config crnvp $H2H --seed 3
run bf16_bootstrap --config bootstrap --particles 100 --epochs 300 \
    --compute-dtype bfloat16
run cglow_pretrain --config cglow --epochs 500 --pretrain-epochs 100
run long_n1000  --config bootstrap --particles 1000  --epochs 800
run long_n10000 --config soft      --particles 10000 --epochs 800
run long_n100   --config bootstrap --particles 100   --epochs 800
echo "batch2 done"
