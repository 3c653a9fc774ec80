#!/bin/bash
# Collect the round's measured-evidence artifacts on the TPU host:
#   NOISE_r05.json   - production-scale noise margins per shipped profile
#   MICRO_r05.json   - per-op micro-benchmarks (keygen/enc/dec/PBS/proxy)
#   BENCH_variants_r05.json - headline bench in --exact / --block configs
# Run each under timeout; the compilation cache makes reruns cheap.
# stderr goes to per-step logs in /tmp; an empty output file fails the run.
set -euo pipefail
set -x
cd "$(dirname "$0")/.."
R=${ROUND:-r05}

timeout 3000 python tools/noise_margin.py --batch 512 \
  --profiles 128bit_fast,128bit,80bit_fast 2>/tmp/noise_$R.log \
  | grep '^{' > NOISE_$R.json
timeout 4000 python bench_micro.py 2>/tmp/micro_$R.log \
  | grep '^{' > MICRO_$R.json
{ timeout 1200 python bench.py --exact 2>/tmp/bench_exact_$R.log | grep '^{';
  timeout 1200 python bench.py --block 2>/tmp/bench_block_$R.log | grep '^{'; } \
  > BENCH_variants_$R.json

for f in NOISE_$R.json MICRO_$R.json BENCH_variants_$R.json; do
  if [ ! -s "$f" ]; then
    echo "ERROR: $f is empty — see /tmp/*_$R.log" >&2
    exit 1
  fi
done
tail -n +1 NOISE_$R.json MICRO_$R.json BENCH_variants_$R.json
