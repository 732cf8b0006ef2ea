#!/bin/bash
# Diagnostic battery for the N=1000 quality regression (VERDICT r1 #4).
# Each run: 300 epochs, same dataset/seed; only one factor varies.
set -u
cd /root/repo
E=300
run() {
  tag=$1; shift
  echo "=== $tag $(date +%T) ==="
  python experiments/rmse_run.py --epochs $E --out experiments/diag_${tag}.json "$@" 2>&1 | tail -2
}
run n100_ctrl   --config bootstrap --particles 100
run n1000_repro --config bootstrap --particles 1000
run n1000_soft  --config soft      --particles 1000
run n1000_eps02 --config bootstrap --particles 1000 --epsilon 0.02
run n1000_ess25 --config bootstrap --particles 1000 --ess-threshold 0.25
echo "battery done"
