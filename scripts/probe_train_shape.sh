#!/usr/bin/env bash
# Probe whether a training shape compiles + steps on the remote TPU within a
# short leash, BEFORE committing a chain phase to it. Motivation: the v4
# chain's FLOW-HIRES phase (448x640 b2) hung the remote compile twice for a
# full 90-min timeout window each — a 25-min bounded probe would have cost
# 1/7th of that.
#
#   bash scripts/probe_train_shape.sh <height> <width> <batch> [steps] [leash_s]
#
# rc=0  -> a training step completed at this shape (safe to chain)
# rc!=0 -> compile hung or train errored within the leash
set -uo pipefail
cd "$(dirname "$0")/.."
H=${1:?height}; W=${2:?width}; B=${3:?batch}
STEPS=${4:-20}
LEASH=${5:-1500}
export JAX_COMPILATION_CACHE_DIR=/tmp/macvo_jax_cache

OUT=/tmp/probe_${H}x${W}_b${B}
rm -f "${OUT}.npz" "${OUT}.log"
timeout "$LEASH" python -m macvo_tpu.train.run \
    --config configs/train/FlowFormerCov_randomized_ext.yaml \
    --mode flow --steps "$STEPS" --max_session_steps "$STEPS" \
    --height "$H" --width "$W" --batch "$B" \
    --restore model/FlowFormerCov_ext_flow.npz \
    --out "${OUT}.npz" > "${OUT}.log" 2>&1
rc=$?
if grep -q "final checkpoint" "${OUT}.log"; then
    echo "PROBE OK: ${H}x${W} b${B} completed ${STEPS} steps (rc=$rc)"
    exit 0
fi
echo "PROBE FAILED: ${H}x${W} b${B} rc=$rc — tail:"
tail -5 "${OUT}.log"
exit 1
