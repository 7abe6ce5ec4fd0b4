#!/usr/bin/env bash
# 1200-frame fused+loop soak (VERDICT r4 item 2 / round-3 item 2).
#
# Dataset: tools/synth --trajectory square --scene boxes --seed 5 --hw 180 410
#          --frames 1200  (KITTI-shaped closed lap, lap closes at frame 960,
#          frames 960-1199 re-drive the mapped lap — the revisit the closure
#          must catch). Fixture scale matches the BASELINE loop fixtures
#          (180x410 / 512 kpts / classical front-end); the full-scale loop
#          sync/scan/verify costs are benched separately (bench.py loop-cost
#          component).
#
# Usage: loop_soak.sh <base_dir> <out_dir> [extra flags...]
# Runs the SAME sequence twice: --loop_closure on, then off; the ATE delta
# on identical data is the closure's measured value.
set -u
BASE=${1:?base_dir}; OUT=${2:?out_dir}; shift 2
mkdir -p "$OUT"
COMMON=(--dataset kitti --base_dir "$BASE" --headless --no_viz3d
        --max_features 512 --map_capacity 4096 --fused --stage_all)
cd "$OUT"
echo "=== soak WITH loop closure ===" | tee soak_loop.log
PYTHONPATH=/root/repo:/root/.axon_site \
  python -m simpleslam_tpu.run_slam "${COMMON[@]}" --loop_closure "$@" \
  2>&1 | tee -a soak_loop.log
echo "=== soak WITHOUT loop closure ===" | tee soak_noloop.log
PYTHONPATH=/root/repo:/root/.axon_site \
  python -m simpleslam_tpu.run_slam "${COMMON[@]}" "$@" \
  2>&1 | tee -a soak_noloop.log
echo "=== summary ==="
grep -h "ATE-RMSE\|done:\|loop closures\|sustained" soak_loop.log soak_noloop.log
