#!/usr/bin/env bash
# One-shot TPU work session: run the moment the chip is reachable.
# Ordered so that a mid-session tunnel loss still leaves artifacts behind:
# cheap evidence first, then the long training phases, then re-evaluation.
#
#   bash scripts/tpu_session.sh [flow_steps] [cov_steps]
set -uo pipefail
cd "$(dirname "$0")/.."

FLOW_STEPS="${1:-12000}"
COV_STEPS="${2:-4000}"
STAMP=$(date -u +%Y-%m-%dT%H:%MZ)
export JAX_COMPILATION_CACHE_DIR=/tmp/macvo_jax_cache

log() { echo "=== [$STAMP] $* ==="; }

log "1/7 on-chip test suite"
MACVO_TEST_PLATFORM=tpu timeout 3000 python -m pytest tests/test_tpu.py -m tpu -q \
    2>&1 | tail -12 | tee -a results/tpu_session_${STAMP}.log

log "2/7 benchmark (pre-training, shipped checkpoint)"
timeout 3000 python bench.py 2>&1 | tail -3 | tee -a results/tpu_session_${STAMP}.log

log "3/7 phase FLOW on randomized data (${FLOW_STEPS} steps, warm-started from r2 ckpt)"
timeout 28800 python -m macvo_tpu.train.run \
    --config configs/train/FlowFormerCov_randomized.yaml \
    --mode flow --steps "${FLOW_STEPS}" \
    --restore model/MACVO_FrontendCov.npz \
    --out model/FlowFormerCov_rand_flow.npz 2>&1 | tail -20

log "4/7 phase COV (${COV_STEPS} steps, frozen flow branch, HOLDOUT worlds 1020-1023)"
timeout 14400 python -m macvo_tpu.train.run \
    --config configs/train/FlowFormerCov_randomized_cov.yaml \
    --steps "${COV_STEPS}" \
    --restore model/FlowFormerCov_rand_flow.npz \
    --out model/MACVO_FrontendCov_v2.npz 2>&1 | tail -20

log "5/7 calibration of the new checkpoint (real + synthetic)"
timeout 3000 python scripts/cov_calibration.py --weight model/MACVO_FrontendCov_v2.npz \
    --data real --out results/cov_calibration_real_v2 2>&1 | tail -16
timeout 3000 python scripts/cov_calibration.py --weight model/MACVO_FrontendCov_v2.npz \
    --data synthetic --out results/cov_calibration_synth_v2 2>&1 | tail -16

log "6/7 real-asset learned E2E with the new checkpoint"
timeout 3000 python - <<'EOF'
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
print(json.dumps(rec, indent=1))
EOF

log "7/7 ablation re-run with the new checkpoint (point configs at v2 first if promoting)"
echo "If eval_real_asset_v2.json improves on eval_real_asset.json, promote:"
echo "  cp model/MACVO_FrontendCov_v2.npz model/MACVO_FrontendCov.npz"
echo "  python scripts/run_ablations.py --data configs/sequence/Synthetic_Holdout.yaml --out results/ablation_table_v2.md"
echo "  python bench.py   # post-promotion number"
