#!/usr/bin/env bash
# Supervised round-4 training chain — v2 of train_chain_r4.sh with a
# RETRY LOOP per training phase (use this one; r4 kept for provenance).
#
# Rationale: two independent failure modes observed on the remote-TPU
# tunnel: (a) indefinite futex stalls mid-step (killed the r3 chain), and
# (b) ~16 MB/step host RSS growth in long-lived processes (~100 GB by step
# 6k). Both are bounded by running each phase as a SEQUENCE OF SHORT
# INVOCATIONS: --max_session_steps caps steps per process, `timeout` caps
# wall-clock per process, and the full-state autosave/resume makes each
# re-invocation lose at most autosave_freq steps. A phase is done when its
# artifact-keyed `.done` marker exists, never when a process exits.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p evidence results model
export JAX_COMPILATION_CACHE_DIR=/tmp/macvo_jax_cache

LOG=evidence/chain_r4.log
hb() { echo "=== $(date -u +%FT%TZ) $*" | tee -a "$LOG"; }
die() { hb "FATAL: $*"; exit 1; }

# run_train <label> <done-marker> <max-tries> <cmd...>
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

# ---------------------------------------------------------------- phase FLOW
run_train "phase FLOW" model/FlowFormerCov_rand_flow.done 12 \
    python -m macvo_tpu.train.run \
        --config configs/train/FlowFormerCov_randomized.yaml \
        --mode flow --steps 7500 --max_session_steps 2500 \
        --restore model/FlowFormerCov_rand_flow.npz \
        --out model/FlowFormerCov_rand_flow.npz

# ----------------------------------------------------------------- phase COV
run_train "phase COV" model/MACVO_FrontendCov_v2.done 8 \
    python -m macvo_tpu.train.run \
        --config configs/train/FlowFormerCov_randomized_cov.yaml \
        --steps 4000 --max_session_steps 2500 \
        --restore model/FlowFormerCov_rand_flow.npz \
        --out model/MACVO_FrontendCov_v2.npz

# ---------------------------------------------------------------- phase EVAL
if [ -f evidence/eval_real_asset_v2.done ]; then
    hb "phase EVAL already done"
else
    hb "phase EVAL: real-asset learned E2E with the v2 checkpoint"
    timeout 3600 python - >>"$LOG" 2>&1 <<'EOF'
import json
from pathlib import Path
from tests.test_real_asset import real_sequence, make_config, run_and_evaluate
seq = real_sequence(gt_frontend=False)
cfg = make_config({"type": "FlowFormerCovFrontend", "args": {
    "weight": "./model/MACVO_FrontendCov_v2.npz",
    "enc_dtype": "fp32", "dec_dtype": "fp32",
    "decoder_depth": 12, "enforce_positive_disparity": False}})
m = run_and_evaluate(cfg, seq)
rec = {k: {"rmse": float(v.rmse), "mean": float(v.mean)} for k, v in m.items()}
Path("eval_real_asset_v2.json").write_text(json.dumps(rec, indent=1) + "\n")
print("real-asset v2 E2E:", json.dumps(rec))
EOF
    [ $? -eq 0 ] && [ -f eval_real_asset_v2.json ] || die "phase EVAL failed"

    hb "phase EVAL: chi^2 covariance calibration (real + synthetic)"
    timeout 3000 python scripts/cov_calibration.py --weight model/MACVO_FrontendCov_v2.npz \
        --data real --out evidence/cov_calibration_real_v2 >>"$LOG" 2>&1 \
        || die "calibration (real) failed"
    timeout 3000 python scripts/cov_calibration.py --weight model/MACVO_FrontendCov_v2.npz \
        --data synthetic --out evidence/cov_calibration_synth_v2 >>"$LOG" 2>&1 \
        || die "calibration (synthetic) failed"
    date -u +%FT%TZ > evidence/eval_real_asset_v2.done
    hb "phase EVAL complete"
fi

# ----------------------------------------------------------------- phase TVO
tvo() {  # mode steps extra...
    local mode=$1 steps=$2; shift 2
    if [ -f "model/TartanVO_${mode}.tvo_done" ]; then
        hb "TVO ${mode} already done"; return 0
    fi
    hb "TVO ${mode}: ${steps} steps"
    timeout 10800 python scripts/train_tartanvo.py --mode "$mode" --steps "$steps" "$@" >>"$LOG" 2>&1
    local rc=$?
    [ $rc -eq 0 ] && [ -f "model/TartanVO_${mode}.npz" ] || die "TVO ${mode} rc=$rc"
    date -u +%FT%TZ > "model/TartanVO_${mode}.tvo_done"
}
tvo flow 3000
tvo stereo 3000
tvo flowcov 1500 --restore model/TartanVO_flow.npz

hb "chain complete — all phases done"
