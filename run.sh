#!/bin/bash
# Reference-compatible front door (the reference README documents
# `./run.sh <variant_dir> <command>` but ships no run.sh; this one maps the
# documented commands onto the mdcommunity_tpu CLI).
#
#   ./run.sh MultiDismantler_unit_cost  train|testReal|testSynthetic|drawLmcc
#   ./run.sh MultiDismantler_degree_cost ...
#   ./run.sh CEMultiDismantler           ...
#   ./run.sh HCA-Dismantler              ...
#
# SMOKE_TEST=1 is honored exactly as in the reference (shrunk config).
# Env overrides: MODEL (checkpoint path), DATA (dir with .edges files),
# OUT (results root).
set -e
cd "$(dirname "$0")"

case "$1" in
  MultiDismantler_unit_cost)   variant=unit_cost ;;
  MultiDismantler_degree_cost) variant=degree_cost ;;
  CEMultiDismantler)           variant=ce ;;
  HCA-Dismantler)              variant=hca ;;
  *) echo "usage: $0 {MultiDismantler_unit_cost|MultiDismantler_degree_cost|CEMultiDismantler|HCA-Dismantler} {train|testReal|testSynthetic|drawLmcc}" >&2
     exit 1 ;;
esac
cmd=$2
shift 2 || true

model=${MODEL:-}
if [ -z "$model" ]; then
  for cand in "models_tpu/${variant}_full_r1/best_model.ckpt" \
              "models_tpu/${variant}_GMM_30_50/best_model.ckpt" \
              "models_tpu/${variant}_GMM_30_50_SMOKE/best_model.ckpt"; do
    [ -f "$cand" ] && model=$cand && break
  done
fi
data=${DATA:-./data}
out=${OUT:-./results/${variant}}

case "$cmd" in
  train)
    exec python -m mdcommunity_tpu.cli train --variant "$variant" "$@" ;;
  testReal)
    [ -n "$model" ] || { echo "no trained checkpoint found; set MODEL=" >&2; exit 1; }
    exec python -m mdcommunity_tpu.cli test-real --variant "$variant" \
      --model "$model" --data "$data" -o "$out/MultiDismantler_real" "$@" ;;
  testSynthetic)
    [ -n "$model" ] || { echo "no trained checkpoint found; set MODEL=" >&2; exit 1; }
    exec python -m mdcommunity_tpu.cli test-synthetic --variant "$variant" \
      --model "$model" -o "$out/MultiDismantler_syn/result_synthetic_${variant}.txt" "$@" ;;
  drawLmcc)
    # overlay every NormalizedLMCC curve found under the real-results dir
    dir="$out/MultiDismantler_real/StepRatio_0.0000"
    curves=()
    for f in "$dir"/NormalizedLMCC_*.txt; do
      [ -f "$f" ] || continue
      base=$(basename "$f" .txt)
      curves+=("${base#NormalizedLMCC_}=$f")
    done
    [ ${#curves[@]} -gt 0 ] || { echo "no NormalizedLMCC_*.txt under $dir (run testReal first)" >&2; exit 1; }
    exec python -m mdcommunity_tpu.cli draw "${curves[@]}" \
      -o "$out/MultiDismantler_audc/lmcc_curves.png" "$@" ;;
  *) echo "unknown command '$cmd' (train|testReal|testSynthetic|drawLmcc)" >&2; exit 1 ;;
esac
