#!/bin/bash
# Chunked long-run driver for experiments/rmse_run.py.
#
# A single long-lived process decelerates on this host (~+12 s/epoch of
# per-dispatch overhead growth observed on the N=10k OT run: epoch 70 took
# ~65 s, epoch 99 took ~411 s).  Running the same training as a sequence of
# short-lived processes with Orbax checkpoint/resume keeps every chunk in
# the fast regime; the per-epoch derivation of permutations/PRNG keys makes
# the chunked trajectory identical to the uninterrupted one.
#
# Usage: run_chunked.sh <total_epochs> <epochs_per_proc> <rmse_run args...>
set -u
TOTAL=$1; CHUNK=$2; shift 2
cd "$(dirname "$0")/.."
FAILS=0
MAX_FAILS=3
while true; do
  timeout 7200 python experiments/rmse_run.py --epochs "$TOTAL" \
    --epochs-per-proc "$CHUNK" --resume "$@"
  rc=$?
  # find the out file from the args to know where we are
  OUT=$(python - "$@" <<'EOF'
import sys
a = sys.argv[1:]
print(a[a.index("--out") + 1] if "--out" in a else "experiments/rmse_results.json")
EOF
)
  DONE=$(python -c "import json,sys; print(json.load(open('$OUT'))['epochs'])" 2>/dev/null || echo 0)
  echo "[run_chunked] chunk rc=$rc, epochs done: $DONE/$TOTAL"
  if [ "$DONE" -ge "$TOTAL" ]; then echo "[run_chunked] complete"; break; fi
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
    FAILS=$((FAILS + 1))
    if [ "$FAILS" -ge "$MAX_FAILS" ]; then
      echo "[run_chunked] $FAILS consecutive non-timeout failures; giving up"
      exit 1
    fi
    echo "[run_chunked] non-timeout failure (rc=$rc);" \
         "retry $FAILS/$MAX_FAILS after 30s"
    sleep 30
  else
    FAILS=0
  fi
done
