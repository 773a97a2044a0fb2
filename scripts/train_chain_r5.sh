#!/usr/bin/env bash
# Round-5 post-promotion chain: covariance-temperature fit + calibration
# evidence + ablation tables, with EVIDENCE COMMITTED AT EVERY PHASE BOUNDARY
# (VERDICT r4 next-round #7: killing the chain at any phase must leave a
# committed, dated record of all completed phases — in round 4 the best
# result of the round existed only in the working tree when the session
# ended).
#
# Markers are VERSIONED per chain (_r5 suffix — ADVICE r4 medium: the v4
# chain reused v3 marker paths, so a stale marker could silently skip a
# phase with a different recipe).
#
# Run AFTER scripts/train_ext_v4.sh has exited (it owns the chip until then):
#     bash scripts/train_chain_r5.sh
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p evidence model
export JAX_COMPILATION_CACHE_DIR=/tmp/macvo_jax_cache

LOG=evidence/chain_r5.log
hb() { echo "=== $(date -u +%FT%TZ) $*" | tee -a "$LOG"; }
die() { hb "FATAL: $*"; exit 1; }

# Commit the named paths (plus the chain log) with retry — leaves a durable
# record even if the session dies mid-chain. Never fails the chain: a commit
# race just retries; "nothing to commit" is fine.
commit_evidence() {
    local msg=$1; shift
    stage() {  # add each path individually: one missing path must not abort
        local p  # the whole staging (git add with any bad pathspec stages
        for p in "$LOG" "$@"; do  # NOTHING — bit the P0 harvest commit)
            [ -e "$p" ] && git add "$p" 2>>"$LOG"
        done
    }
    stage "$@"
    for _ in 1 2 3; do
        if git commit -q -m "$msg" 2>>"$LOG"; then
            hb "committed: $msg"
            return 0
        fi
        stage "$@"
        sleep 2
    done
    hb "commit skipped (nothing to commit or lock contention): $msg"
}

SHIPPED=model/MACVO_FrontendCov.npz
CALIB=model/MACVO_FrontendCov.calib.json

# ---- COV-EXT + PROMOTE (taken over from train_ext_v4.sh) ---------------------
# The v4 chain's FLOW-HIRES phase (448x640 b2) hung the remote compile twice
# at the same point (90 min each, zero step progress — evidence/chain_r4.log
# 06:25 and 07:54); HIRES is optional by design, so the takeover proceeds from
# the completed FLOW-EXT checkpoint exactly as the v4 chain's fallback would.
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
    [ -f "$marker" ]
}

if [ ! -f model/MACVO_FrontendCov_v4.done ]; then
    run_train "phase COV-EXT" model/MACVO_FrontendCov_v4.done 4 \
        python -m macvo_tpu.train.run \
            --config configs/train/FlowFormerCov_randomized_cov.yaml \
            --steps 2000 --max_session_steps 2500 \
            --restore model/FlowFormerCov_ext_flow.npz \
            --out model/MACVO_FrontendCov_v4.npz \
        || die "COV-EXT did not complete"
    hb "phase COV-EXT complete ($(cat model/MACVO_FrontendCov_v4.done))"
    commit_evidence "COV-EXT complete: v4 candidate cov head trained on holdout worlds" \
        model/MACVO_FrontendCov_v4.npz model/MACVO_FrontendCov_v4_metrics.csv \
        model/MACVO_FrontendCov_v4.done evidence/chain_r4.log
fi

if [ ! -f evidence/chain_r5_promote.done ]; then
    hb "phase PROMOTE: gated promotion of the v4 candidate"
    timeout 3600 python scripts/promote_checkpoint.py \
        --candidate model/MACVO_FrontendCov_v4.npz >>"$LOG" 2>&1
    rc=$?
    if [ $rc -eq 0 ]; then
        hb "v4 PROMOTED (beat shipped on both EPE and ATE)"
    elif [ $rc -eq 2 ]; then
        hb "v4 NOT promoted (gate failed — shipped checkpoint stands)"
    else
        die "promotion errored rc=$rc"
    fi
    date -u +%FT%TZ > evidence/chain_r5_promote.done
    commit_evidence "Gated promotion decision for the v4 candidate (see chain_r5.log)" \
        model/MACVO_FrontendCov.npz model/MACVO_FrontendCov.eval.json \
        model/MACVO_FrontendCov_metrics.csv eval_real_asset.json \
        evidence/chain_r5_promote.done
fi

# ---- P0: harvest whatever the r4 chain left ---------------------------------
if [ ! -f evidence/chain_r5_p0.done ]; then
    hb "P0 harvest: committing r4 chain artifacts"
    date -u +%FT%TZ > evidence/chain_r5_p0.done
    commit_evidence "Chain r4 harvest: training log + v4 candidate artifacts" \
        evidence/chain_r4.log model/FlowFormerCov_ext_flow.npz \
        model/FlowFormerCov_ext_flow_metrics.csv model/FlowFormerCov_ext_flow.done \
        model/FlowFormerCov_ext_hires.npz model/FlowFormerCov_ext_hires_metrics.csv \
        model/FlowFormerCov_ext_hires.done model/MACVO_FrontendCov_v4.npz \
        model/MACVO_FrontendCov_v4_metrics.csv model/MACVO_FrontendCov_v4.done \
        model/MACVO_FrontendCov.npz model/MACVO_FrontendCov.eval.json \
        model/MACVO_FrontendCov_metrics.csv model/MACVO_FrontendCov.calib.json \
        eval_real_asset.json evidence/chain_r5_p0.done
fi

# ---- P1: fit covariance temperatures on the permanent holdout ---------------
if [ ! -f evidence/chain_r5_p1.done ]; then
    hb "P1 fit-temperature: $SHIPPED on seq_1049"
    timeout 3600 python scripts/fit_cov_temperature.py \
        --weight "$SHIPPED" --root data/randomized/seq_1049 \
        >>"$LOG" 2>&1 || die "P1 fit_cov_temperature rc=$?"
    [ -f "$CALIB" ] || die "P1 did not produce $CALIB"
    date -u +%FT%TZ > evidence/chain_r5_p1.done
    commit_evidence "Fit per-band covariance temperatures on holdout seq_1049" \
        "$CALIB" evidence/chain_r5_p1.done
fi

# ---- P2: calibration evidence v3 on the real asset (raw vs recalibrated) ----
if [ ! -f evidence/chain_r5_p2.done ]; then
    hb "P2 calibration evidence v3 (real pairs, raw vs recalibrated)"
    timeout 3600 python scripts/cov_calibration.py --weight "$SHIPPED" \
        --data real --calib none --out evidence/cov_calibration_real_v3_raw \
        >>"$LOG" 2>&1 || die "P2 raw calibration rc=$?"
    timeout 3600 python scripts/cov_calibration.py --weight "$SHIPPED" \
        --data real --calib auto --out evidence/cov_calibration_real_v3_recal \
        >>"$LOG" 2>&1 || die "P2 recal calibration rc=$?"
    date -u +%FT%TZ > evidence/chain_r5_p2.done
    commit_evidence "Calibration evidence v3: raw vs temperature-recalibrated sigma on real pairs" \
        evidence/cov_calibration_real_v3_raw.json evidence/cov_calibration_real_v3_raw.png \
        evidence/cov_calibration_real_v3_raw_grid.npz \
        evidence/cov_calibration_real_v3_recal.json evidence/cov_calibration_real_v3_recal.png \
        evidence/cov_calibration_real_v3_recal_grid.npz evidence/chain_r5_p2.done
fi

# ---- P3: ablation tables v3 (in-domain holdout + synthetic holdout) ---------
if [ ! -f evidence/chain_r5_p3.done ]; then
    hb "P3 ablations v3 on Randomized_Holdout (seq_1048)"
    timeout 7200 python scripts/run_ablations.py \
        --data configs/sequence/Randomized_Holdout.yaml \
        --out evidence/ablation_table_v3_rand.md >>"$LOG" 2>&1 \
        || die "P3 randomized ablations rc=$?"
    hb "P3 ablations v3 on Synthetic_Holdout"
    timeout 7200 python scripts/run_ablations.py \
        --data configs/sequence/Synthetic_Holdout.yaml \
        --out evidence/ablation_table_v3_synth.md >>"$LOG" 2>&1 \
        || die "P3 synthetic ablations rc=$?"
    date -u +%FT%TZ > evidence/chain_r5_p3.done
    commit_evidence "Ablation tables v3 (v4 sigma + temperature): randomized + synthetic holdouts" \
        evidence/ablation_table_v3_rand.md evidence/ablation_table_v3_synth.md \
        evidence/chain_r5_p3.done
fi

hb "chain r5 complete"
