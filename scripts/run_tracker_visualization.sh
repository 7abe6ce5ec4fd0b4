#!/usr/bin/env bash
# Canonical launch commands (parity with the reference's
# scripts/run_tracker_visualization.sh:1-46, adapted to the TPU-native CLI).
set -e

BASE_DIR="${BASE_DIR:-../Dataset}"

case "${1:-live}" in
  live)
    # the reference's live configuration: KITTI + LightGlue, 3-D viz off
    python -m simpleslam_tpu.run_slam --dataset kitti --base_dir "$BASE_DIR" \
        --use_lightglue --no_viz3d
    ;;
  orb)
    # classical ORB + BF monocular VO on KITTI
    python -m simpleslam_tpu.run_slam --dataset kitti --base_dir "$BASE_DIR" \
        --detector orb --matcher bf
    ;;
  malaga)
    python -m simpleslam_tpu.run_slam --dataset malaga --base_dir "$BASE_DIR" \
        --use_lightglue --no_viz3d
    ;;
  tum)
    python -m simpleslam_tpu.run_slam --dataset tum-rgbd --base_dir "$BASE_DIR" \
        --use_lightglue --no_viz3d
    ;;
  headless)
    python -m simpleslam_tpu.run_slam --dataset kitti --base_dir "$BASE_DIR" \
        --headless --no_viz3d
    ;;
  legacy-ef)
    python -m simpleslam_tpu.legacy.run_ef --dataset kitti --base_dir "$BASE_DIR" --headless
    ;;
  legacy-klt)
    python -m simpleslam_tpu.legacy.run_klt --dataset kitti --base_dir "$BASE_DIR" --headless
    ;;
  synth)
    # no dataset? generate a synthetic KITTI-format corridor and run on it
    OUT=$(mktemp -d)
    python -m simpleslam_tpu.tools.synth --out "$OUT" --frames 60
    python -m simpleslam_tpu.run_slam --dataset kitti --base_dir "$OUT" \
        --headless --no_viz3d --max_features 1024
    ;;
  *)
    echo "usage: $0 {live|orb|malaga|tum|headless|legacy-ef|legacy-klt|synth}"
    exit 1
    ;;
esac
