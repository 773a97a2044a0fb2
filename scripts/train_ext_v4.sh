#!/usr/bin/env bash
# Round-4 session chain (v4 candidate): three-phase continuation on the
# extended 44-world mixture, then gated promotion.
#
#   FLOW-EXT   4000 steps @ 320x448 b4 — same recipe as train_ext_v3.sh
#   FLOW-HIRES  800 steps @ 448x640 b2 — NEW: attacks the train-res->eval-res
#              gap (shipped ckpt: eval EPE 4.6 px at train res vs 11.2 px at
#              the promotion gate's full 640x640; FlowFormer cost volumes are
#              resolution-sensitive, so a short near-deployment-res fine-tune
#              is the cheapest lever). Pixel throughput per step matches the
#              b4@320x448 phase exactly (448*640*2 == 320*448*4), so step
#              time should hold at ~0.7 s. OPTIONAL: if it fails (e.g. OOM),
#              the chain falls back to the FLOW-EXT checkpoint.
#   COV-EXT    2000 steps on holdout worlds 1020-1023 (flow branches frozen)
#
# Supervision pattern per train_chain_r4b.sh: bounded invocations
# (--max_session_steps) + full-state autosave resume + artifact (.done)
# markers, so a dead session costs <10 min (VERDICT r3 next-round #6).
#
# SUPERSEDED (kept for provenance): this chain reuses train_ext_v3.sh's
# FLOW-EXT marker/checkpoint names (ADVICE r4 medium — a stale marker could
# silently skip a phase with a different recipe) and its FLOW-HIRES shape
# (448x640 b2) hung the remote compile twice. Later chains
# (train_chain_r5.sh / train_chain_r5b.sh) version markers per chain, probe
# train shapes first (scripts/probe_train_shape.sh), and commit evidence at
# every phase boundary.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p evidence model
export JAX_COMPILATION_CACHE_DIR=/tmp/macvo_jax_cache

LOG=evidence/chain_r4.log
hb() { echo "=== $(date -u +%FT%TZ) $*" | tee -a "$LOG"; }
die() { hb "FATAL: $*"; exit 1; }

FLOW_STEPS="${1:-4000}"
HIRES_STEPS="${2:-800}"
COV_STEPS="${3:-2000}"

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

run_train "phase FLOW-EXT" model/FlowFormerCov_ext_flow.done 6 \
    python -m macvo_tpu.train.run \
        --config configs/train/FlowFormerCov_randomized_ext.yaml \
        --mode flow --steps "$FLOW_STEPS" --max_session_steps 2500 \
        --restore model/MACVO_FrontendCov.npz \
        --out model/FlowFormerCov_ext_flow.npz \
    || die "FLOW-EXT did not complete"
hb "phase FLOW-EXT complete ($(cat model/FlowFormerCov_ext_flow.done))"

# Optional high-res fine-tune: fall back to the FLOW-EXT checkpoint on failure.
CAND_FLOW=model/FlowFormerCov_ext_flow.npz
if run_train "phase FLOW-HIRES" model/FlowFormerCov_ext_hires.done 3 \
    python -m macvo_tpu.train.run \
        --config configs/train/FlowFormerCov_randomized_ext.yaml \
        --mode flow --steps "$HIRES_STEPS" --max_session_steps 800 \
        --height 448 --width 640 --batch 2 \
        --restore model/FlowFormerCov_ext_flow.npz \
        --out model/FlowFormerCov_ext_hires.npz; then
    hb "phase FLOW-HIRES complete ($(cat model/FlowFormerCov_ext_hires.done))"
    CAND_FLOW=model/FlowFormerCov_ext_hires.npz
else
    hb "phase FLOW-HIRES FAILED — continuing from FLOW-EXT checkpoint"
fi

run_train "phase COV-EXT" model/MACVO_FrontendCov_v4.done 4 \
    python -m macvo_tpu.train.run \
        --config configs/train/FlowFormerCov_randomized_cov.yaml \
        --steps "$COV_STEPS" --max_session_steps 2500 \
        --restore "$CAND_FLOW" \
        --out model/MACVO_FrontendCov_v4.npz \
    || die "COV-EXT did not complete"
hb "phase COV-EXT complete ($(cat model/MACVO_FrontendCov_v4.done))"

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
hb "session chain v4 complete"
