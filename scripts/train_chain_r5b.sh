#!/usr/bin/env bash
# Round-5b: high-res fine-tune at the EVAL resolution (640x640 b1 — probed
# viable by scripts/probe_train_shape.sh; the v4 chain's 448x640 b2 attempt
# hung the remote compile twice). Phases:
#   FLOW-HIRES5  800 steps @640x640 b1, warm-started from the PROMOTED ckpt
#   COV-HIRES5   2000 cov-only steps on holdout worlds @320x448 b4
#   PROMOTE      gated (beats shipped on real-asset EPE AND E2E ATE, or no-op)
# Markers are chain-versioned; evidence commits at every phase boundary.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p evidence model
export JAX_COMPILATION_CACHE_DIR=/tmp/macvo_jax_cache

LOG=evidence/chain_r5b.log
hb() { echo "=== $(date -u +%FT%TZ) $*" | tee -a "$LOG"; }
die() { hb "FATAL: $*"; exit 1; }

commit_evidence() {
    local msg=$1; shift
    stage() {
        local p
        for p in "$LOG" "$@"; do
            [ -e "$p" ] && git add "$p" 2>>"$LOG"
        done
    }
    stage "$@"
    for _ in 1 2 3; do
        if git commit -q -m "$msg" 2>>"$LOG"; then
            hb "committed: $msg"; return 0
        fi
        stage "$@"; sleep 2
    done
    hb "commit skipped (nothing to commit or lock contention): $msg"
}

run_train() {
    local label=$1 marker=$2 tries_max=$3; shift 3
    local tries=0
    while [ ! -f "$marker" ] && [ "$tries" -lt "$tries_max" ]; do
        tries=$((tries + 1))
        hb "$label: invocation $tries/$tries_max"
        timeout 3000 "$@" >>"$LOG" 2>&1
        local rc=$?
        [ $rc -ne 0 ] && hb "$label: rc=$rc (will resume from autosave)"
    done
    [ -f "$marker" ]
}

run_train "phase FLOW-HIRES5" model/FlowFormerCov_hires5_flow.done 3 \
    python -m macvo_tpu.train.run \
        --config configs/train/FlowFormerCov_randomized_ext.yaml \
        --mode flow --steps 800 --max_session_steps 800 \
        --height 640 --width 640 --batch 1 \
        --restore model/MACVO_FrontendCov.npz \
        --out model/FlowFormerCov_hires5_flow.npz \
    || die "FLOW-HIRES5 did not complete"
hb "phase FLOW-HIRES5 complete ($(cat model/FlowFormerCov_hires5_flow.done))"
commit_evidence "HIRES5 flow fine-tune complete (800 steps @640x640 b1)" \
    model/FlowFormerCov_hires5_flow.npz model/FlowFormerCov_hires5_flow_metrics.csv \
    model/FlowFormerCov_hires5_flow.done

run_train "phase COV-HIRES5" model/MACVO_FrontendCov_v5.done 3 \
    python -m macvo_tpu.train.run \
        --config configs/train/FlowFormerCov_randomized_cov.yaml \
        --steps 2000 --max_session_steps 2500 \
        --restore model/FlowFormerCov_hires5_flow.npz \
        --out model/MACVO_FrontendCov_v5.npz \
    || die "COV-HIRES5 did not complete"
hb "phase COV-HIRES5 complete ($(cat model/MACVO_FrontendCov_v5.done))"
commit_evidence "HIRES5 cov phase complete (2000 holdout steps)" \
    model/MACVO_FrontendCov_v5.npz model/MACVO_FrontendCov_v5_metrics.csv \
    model/MACVO_FrontendCov_v5.done

hb "phase PROMOTE: gated promotion of the v5 candidate"
timeout 3600 python scripts/promote_checkpoint.py \
    --candidate model/MACVO_FrontendCov_v5.npz >>"$LOG" 2>&1
rc=$?
if [ $rc -eq 0 ]; then
    hb "v5 PROMOTED (beat shipped on both EPE and ATE)"
elif [ $rc -eq 2 ]; then
    hb "v5 NOT promoted (gate failed — shipped checkpoint stands)"
else
    die "promotion errored rc=$rc"
fi
commit_evidence "Gated promotion decision for the v5 hires candidate" \
    model/MACVO_FrontendCov.npz model/MACVO_FrontendCov.eval.json \
    model/MACVO_FrontendCov_metrics.csv eval_real_asset.json
hb "chain r5b complete"
