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
# Gives up after MAX_FAILS consecutive chunks WITHOUT epoch progress —
# whether they crashed (rc!=0) or hung until the per-chunk timeout
# (rc=124): a wedged tunnel otherwise burns 2-hour cycles forever.
#
# Usage: run_chunked.sh <total_epochs> <epochs_per_proc> <rmse_run args...>
set -u
TOTAL=$1; CHUNK=$2; shift 2
cd "$(dirname "$0")/.."
FAILS=0
MAX_FAILS=3
PREV_DONE=-1
while true; do
  timeout 7200 python experiments/rmse_run.py --epochs "$TOTAL" \
    --epochs-per-proc "$CHUNK" --resume "$@"
  rc=$?
  # find the out file from the args to know where we are
  OUT=$(python - "$@" <<'PYEOF'
import sys
a = sys.argv[1:]
print(a[a.index("--out") + 1] if "--out" in a else "experiments/rmse_results.json")
PYEOF
)
  DONE=$(python -c "import json,sys; print(json.load(open('$OUT'))['epochs'])" 2>/dev/null || echo 0)
  echo "[run_chunked] chunk rc=$rc, epochs done: $DONE/$TOTAL"
  if [ "$DONE" -ge "$TOTAL" ]; then echo "[run_chunked] complete"; break; fi
  if [ "$DONE" -gt "$PREV_DONE" ]; then
    FAILS=0
  else
    FAILS=$((FAILS + 1))
    if [ "$FAILS" -ge "$MAX_FAILS" ]; then
      echo "[run_chunked] $FAILS consecutive chunks without progress" \
           "(last rc=$rc); giving up"
      exit 1
    fi
    echo "[run_chunked] no progress (rc=$rc); retry $FAILS/$MAX_FAILS"
  fi
  PREV_DONE=$DONE
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then sleep 30; fi
done
