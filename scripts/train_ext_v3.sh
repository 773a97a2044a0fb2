#!/usr/bin/env bash
# Round-4 EXTENSION pass (v3 candidate): continuation flow training on the
# 44-world extended mixture (evidence/flow_error_real_randflow.json motivated
# — attacks the near-field error band with 24 fresh worlds), then a fresh
# holdout cov phase, then the gated promotion. Same supervision pattern as
# train_chain_r4b.sh: bounded invocations + full-state resume + .done markers.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p evidence model
export JAX_COMPILATION_CACHE_DIR=/tmp/macvo_jax_cache

LOG=evidence/chain_r4.log
hb() { echo "=== $(date -u +%FT%TZ) $*" | tee -a "$LOG"; }
die() { hb "FATAL: $*"; exit 1; }

FLOW_STEPS="${1:-4500}"
COV_STEPS="${2:-3000}"

run_train() {
    local label=$1 marker=$2 tries_max=$3; shift 3
    local tries=0
    while [ ! -f "$marker" ] && [ "$tries" -lt "$tries_max" ]; do
        tries=$((tries + 1))
        hb "$label: invocation $tries/$tries_max"
        timeout 5400 "$@" >>"$LOG" 2>&1
        local rc=$?
        [ $rc -ne 0 ] && hb "$label: rc=$rc (will resume from autosave)"
    done
    [ -f "$marker" ] || die "$label did not complete in $tries_max invocations"
    hb "$label complete ($(cat "$marker"))"
}

run_train "phase FLOW-EXT" model/FlowFormerCov_ext_flow.done 8 \
    python -m macvo_tpu.train.run \
        --config configs/train/FlowFormerCov_randomized_ext.yaml \
        --mode flow --steps "$FLOW_STEPS" --max_session_steps 2500 \
        --restore model/MACVO_FrontendCov.npz \
        --out model/FlowFormerCov_ext_flow.npz

run_train "phase COV-EXT" model/MACVO_FrontendCov_v3.done 6 \
    python -m macvo_tpu.train.run \
        --config configs/train/FlowFormerCov_randomized_cov.yaml \
        --steps "$COV_STEPS" --max_session_steps 2500 \
        --restore model/FlowFormerCov_ext_flow.npz \
        --out model/MACVO_FrontendCov_v3.npz

hb "phase PROMOTE-EXT: gated promotion of the v3 candidate"
timeout 3600 python scripts/promote_checkpoint.py \
    --candidate model/MACVO_FrontendCov_v3.npz >>"$LOG" 2>&1
rc=$?
if [ $rc -eq 0 ]; then
    hb "v3 PROMOTED (beat shipped on both EPE and ATE)"
elif [ $rc -eq 2 ]; then
    hb "v3 NOT promoted (gate failed — shipped checkpoint stands)"
else
    die "promotion errored rc=$rc"
fi
hb "extension chain complete"
