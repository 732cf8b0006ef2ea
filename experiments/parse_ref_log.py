"""Parse a PyTorch-reference head-to-head log into the same JSON shape as
the repo-side `h2h_bootstrap_seed*.json` results.

    python experiments/parse_ref_log.py refrun/runs/bootstrap_seed2.log \
        --out experiments/h2h_ref_seed2.json --seed 2
"""

import argparse
import json
import re

p = argparse.ArgumentParser()
p.add_argument("log")
p.add_argument("--out", required=True)
p.add_argument("--seed", type=int, required=True)
args = p.parse_args()

val, test = [], None
for line in open(args.log):
    m = re.search(r"loss evaluation: epoch: \d+, loss: ([0-9.]+)", line)
    if m:
        val.append(float(m.group(1)))
    m = re.search(r"loss testing: loss: ([0-9.]+)", line)
    if m:
        test = float(m.group(1))

if not val:
    raise SystemExit(
        f"{args.log}: no validation-loss lines parsed — the reference run "
        "likely crashed before its first eval; check the log tail")
if test is None:
    print(f"WARNING: {args.log}: no test-loss line found (run incomplete?)")

out = {
    "config": "bootstrap", "framework": "pytorch-reference",
    "seed": args.seed, "epochs": len(val),
    "particles": 100, "init_with_true_state": True,
    "val_rmse_per_epoch": val,
    "best_val_rmse": min(val),
    "test_rmse": test,
}
with open(args.out, "w") as f:
    json.dump(out, f, indent=2)
print(f"{args.out}: {len(val)} epochs, best val {min(val):.3f}, test {test}")
