#!/bin/bash
# Round-2 TPU batch 3: remaining queue after the batch-2 interruption.
# Order: fast high-value head-to-head rows first, then quality sweeps.
# CGLOW runs are intentionally NOT here — they launch separately after the
# conditioning-tower optimization so they measure the new kernel.
set -u
cd /root/repo
H2H="--epochs 60 --batch 16 --seq-len 25 --init-true --sequences 160 --data-dir refrun/data/disk/TwentyfiveDistractors"
run() {
  tag=$1; shift
  echo "=== $tag $(date +%T) ==="
  python experiments/rmse_run.py --out experiments/${tag}.json "$@" 2>&1 | tail -2
}
run h2h_crnvp_seed2  --config crnvp $H2H --seed 2
run h2h_crnvp_seed3  --config crnvp $H2H --seed 3
run h2h_crnvp_seed4  --config crnvp $H2H --seed 4
run bf16_bootstrap --config bootstrap --particles 100 --epochs 300 \
    --compute-dtype bfloat16
run long_n100   --config bootstrap --particles 100   --epochs 800
run long_n1000  --config bootstrap --particles 1000  --epochs 800
run long_n10000 --config soft      --particles 10000 --epochs 800
echo "batch3 done"
