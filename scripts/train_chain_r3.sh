#!/usr/bin/env bash
# Detached round-3 training chain: flow phase -> cov phase -> calibration ->
# real-asset eval. Launched with setsid so a driver/session restart cannot
# kill it. All artifacts land under model/ and results/.
set -uo pipefail
cd "$(dirname "$0")/.."

FLOW_STEPS="${1:-12000}"
COV_STEPS="${2:-4000}"
export JAX_COMPILATION_CACHE_DIR=/tmp/macvo_jax_cache

echo "=== $(date -u +%FT%TZ) phase FLOW (${FLOW_STEPS} steps, warm-start r2 ckpt)"
timeout 28800 python -m macvo_tpu.train.run \
    --config configs/train/FlowFormerCov_randomized.yaml \
    --mode flow --steps "${FLOW_STEPS}" \
    --restore model/MACVO_FrontendCov.npz \
    --out model/FlowFormerCov_rand_flow.npz 2>&1 | tail -30

echo "=== $(date -u +%FT%TZ) phase COV (${COV_STEPS} steps, holdout worlds)"
timeout 14400 python -m macvo_tpu.train.run \
    --config configs/train/FlowFormerCov_randomized_cov.yaml \
    --steps "${COV_STEPS}" \
    --restore model/FlowFormerCov_rand_flow.npz \
    --out model/MACVO_FrontendCov_v2.npz 2>&1 | tail -30

echo "=== $(date -u +%FT%TZ) calibration (real + synthetic)"
timeout 3000 python scripts/cov_calibration.py --weight model/MACVO_FrontendCov_v2.npz \
    --data real --out results/cov_calibration_real_v2 2>&1 | tail -16
timeout 3000 python scripts/cov_calibration.py --weight model/MACVO_FrontendCov_v2.npz \
    --data synthetic --out results/cov_calibration_synth_v2 2>&1 | tail -16

echo "=== $(date -u +%FT%TZ) real-asset learned E2E (v2 checkpoint)"
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

echo "=== $(date -u +%FT%TZ) chain done"
