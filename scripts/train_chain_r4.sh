#!/usr/bin/env bash
# Round-4 resumable training chain (VERDICT r3 next-round #1, #4, #6).
#
# Properties the round-3 chain lacked:
#   * ARTIFACT-KEYED: each phase is skipped iff its `.done` marker exists —
#     never keyed on process liveness.
#   * RESUMABLE: macvo_tpu.train.run autosaves the FULL train state
#     (params + Adam moments + schedule step) every autosave_freq steps and
#     resumes from it on re-invocation; killing this script at any point and
#     re-running it loses < 10 min of work.
#   * OBSERVABLE: heartbeat lines with UTC timestamps to evidence/chain_r4.log.
#   * FAIL-FAST: explicit exit-code checks after each training phase
#     (ADVICE r3: r3_finish.sh lacked -e and evaluated stale checkpoints).
#
# Phases:
#   1. FLOW   resume model/FlowFormerCov_rand_flow.npz (stopped @4600/12000 in
#             r3) for the remaining ~7500 steps on worlds 1000-1019.
#   2. COV    4000 cov-only steps on HOLDOUT worlds 1020-1023 so sigma
#             calibrates to generalization error -> model/MACVO_FrontendCov_v2.npz.
#   3. EVAL   real-asset learned E2E + chi^2 calibration (real + synthetic)
#             -> eval_real_asset_v2.json, evidence/.
#   4. TVO    TartanVO family: flow -> stereo -> flowcov (baseline weights).
# Promotion of v2 -> model/MACVO_FrontendCov.npz is a SEPARATE, gated step
# (the test pins must move in the same commit).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p evidence results model
export JAX_COMPILATION_CACHE_DIR=/tmp/macvo_jax_cache

LOG=evidence/chain_r4.log
hb() { echo "=== $(date -u +%FT%TZ) $*" | tee -a "$LOG"; }
die() { hb "FATAL: $*"; exit 1; }

# ---------------------------------------------------------------- phase FLOW
if [ -f model/FlowFormerCov_rand_flow.done ]; then
    hb "phase FLOW already done ($(cat model/FlowFormerCov_rand_flow.done))"
else
    hb "phase FLOW: resume to 7500 more steps (r3 stopped @4600/12000)"
    timeout 21600 python -m macvo_tpu.train.run \
        --config configs/train/FlowFormerCov_randomized.yaml \
        --mode flow --steps 7500 \
        --restore model/FlowFormerCov_rand_flow.npz \
        --out model/FlowFormerCov_rand_flow.npz >>"$LOG" 2>&1
    rc=$?
    [ $rc -eq 0 ] && [ -f model/FlowFormerCov_rand_flow.done ] \
        || die "phase FLOW rc=$rc (re-invoke this script to resume from autosave)"
    hb "phase FLOW complete"
fi

# ----------------------------------------------------------------- phase COV
if [ -f model/MACVO_FrontendCov_v2.done ]; then
    hb "phase COV already done ($(cat model/MACVO_FrontendCov_v2.done))"
else
    hb "phase COV: 4000 cov-only steps on holdout worlds 1020-1023"
    timeout 14400 python -m macvo_tpu.train.run \
        --config configs/train/FlowFormerCov_randomized_cov.yaml \
        --steps 4000 \
        --restore model/FlowFormerCov_rand_flow.npz \
        --out model/MACVO_FrontendCov_v2.npz >>"$LOG" 2>&1
    rc=$?
    [ $rc -eq 0 ] && [ -f model/MACVO_FrontendCov_v2.done ] \
        || die "phase COV rc=$rc (re-invoke this script to resume from autosave)"
    hb "phase COV complete"
fi

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
