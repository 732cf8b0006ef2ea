#!/bin/bash
# Round-4 TPU batch 1:
#  - CGLOW h2h with --torch-init (VERDICT r3 missing: the CGLOW family was
#    the one h2h run executed without the init-parity fix; the finished
#    reference curve shows a systematic 1.4 px lead)
#  - resampling-ACTIVE parity protocol (VERDICT r3 weak #6/#5): uniform
#    init + T=50 on the shared T50 dataset so the ESS gate demonstrably
#    fires (per-epoch resample counts now logged), soft AND ot
#  - repo-side CGLOW at the ref_cglow_long anchor protocol (T=50, uniform
#    init) for the long-protocol gap triage (VERDICT r3 #4)
set -u
cd /root/repo
H2H="--batch 16 --seq-len 25 --init-true --sequences 160 --data-dir refrun/data/disk/TwentyfiveDistractors"
T50="--batch 16 --seq-len 50 --sequences 160 --data-dir refrun/data/disk/TwentyfiveDistractorsT50"
run() {
  tag=$1; shift
  echo "=== $tag $(date +%T) ==="
  python experiments/rmse_run.py --out experiments/${tag}.json "$@" 2>&1 | tail -2
}
run h2h_cglow_ti_seed2 --config cglow $H2H --epochs 60 --seed 2 --torch-init
run rs_t50_soft_seed2 --config soft $T50 --epochs 25 --seed 2 --torch-init
run rs_t50_ot_seed2 --config bootstrap $T50 --epochs 25 --seed 2 --torch-init
run cglow_t50_uniform_seed2 --config cglow $T50 --epochs 25 --seed 2 --torch-init
echo "r4 batch1 done $(date)"
