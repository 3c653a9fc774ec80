#!/bin/bash
# Collect the round's measured-evidence artifacts on the TPU host:
#   NOISE_r03.json   - production-scale noise margins per shipped profile
#   MICRO_r03.json   - per-op micro-benchmarks (keygen/enc/dec/PBS/proxy)
#   BENCH_variants_r03.json - headline bench in --exact / --block configs
# Run each under timeout; the compilation cache makes reruns cheap.
set -x
cd "$(dirname "$0")/.."
timeout 3000 python tools/noise_margin.py --batch 512 \
  --profiles 128bit_fast,128bit,80bit_fast 2>/dev/null \
  | grep '^{' > NOISE_r03.json
timeout 3000 python bench_micro.py 2>/dev/null | grep '^{' > MICRO_r03.json
{ timeout 1200 python bench.py --exact 2>/dev/null | grep '^{';
  timeout 1200 python bench.py --block 2>/dev/null | grep '^{'; } \
  > BENCH_variants_r03.json
tail -n +1 NOISE_r03.json MICRO_r03.json BENCH_variants_r03.json
