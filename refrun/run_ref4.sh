#!/bin/bash
# Head-to-head reference run. Usage: run_ref.sh <tag> <extra flags...>
set -u
TAG=$1; shift
cd /root/repo/refrun
mkdir -p runs
nice -n 10 python main.py --batchsize 16 --num-particles 100 \
  --sequence-length 25 --init-with-true-state --num-epochs 60 --seed 4 \
  "$@" > runs/${TAG}.log 2>&1
echo "rc=$?" >> runs/${TAG}.log
