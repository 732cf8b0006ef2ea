#!/bin/bash
# Isolated head-to-head reference run (PyTorch, CPU).
#
# The reference writes ./model, ./logger, ./checkpoint, ./result and logs/
# relative to cwd (DPFs.py:396-402), so concurrent runs need separate
# working dirs.  model/ must be a REAL directory (checkpoints are written
# into it) containing only a symlink to the read-only reference package.
#
# Usage: run_job.sh <tag> <extra reference flags...>
set -u
TAG=$1; shift
BASE=/root/repo/refrun
JOB=$BASE/jobs/$TAG
mkdir -p "$JOB/runs" "$JOB/model" "$JOB/data/disk"
cd "$JOB"
for f in main.py dataset.py arguments.py losses.py DPFs.py utils.py plot.py; do
  ln -sf /root/reference/$f $f
done
ln -sf /root/reference/model/models.py model/models.py
ln -sfn /root/reference/nf nf
ln -sfn /root/reference/resamplers resamplers
ln -sfn "$BASE/data/disk/TwentyfiveDistractors" data/disk/TwentyfiveDistractors
export OMP_NUM_THREADS=1 MKL_NUM_THREADS=1
nice -n 10 python main.py --batchsize 16 --num-particles 100 \
  --sequence-length 25 --init-with-true-state --num-epochs 60 --seed 2 \
  "$@" > "runs/${TAG}.log" 2>&1
echo "rc=$?" >> "runs/${TAG}.log"
