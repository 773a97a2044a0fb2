#!/usr/bin/env bash
# Round-3 session-2 finisher: runs the moment the flow phase has written its
# checkpoint. Cov phase on holdout worlds -> full-res real-asset E2E with the
# new checkpoint -> covariance calibration (real + synthetic). Promotion of
# model/MACVO_FrontendCov.npz is a human decision afterwards.
#
#   bash scripts/r3_finish.sh [cov_steps]
set -uo pipefail
cd "$(dirname "$0")/.."

COV_STEPS="${1:-1200}"
export JAX_COMPILATION_CACHE_DIR=/tmp/macvo_jax_cache

echo "=== $(date -u +%FT%TZ) cov phase (${COV_STEPS} steps, holdout worlds 1020-1023)"
timeout 2700 python -m macvo_tpu.train.run \
    --config configs/train/FlowFormerCov_randomized_cov.yaml \
    --steps "${COV_STEPS}" --log_freq 100 \
    --restore model/FlowFormerCov_rand_flow.npz \
    --out model/MACVO_FrontendCov_v2.npz 2>&1 | tail -12

echo "=== $(date -u +%FT%TZ) real-asset learned E2E (v2 checkpoint, bf16 Fast-style)"
timeout 1800 python - <<'EOF'
import json
from pathlib import Path
from tests.test_real_asset import real_sequence, make_config, run_and_evaluate
seq = real_sequence(gt_frontend=False)
cfg = make_config({"type": "FlowFormerCovFrontend", "args": {
    "weight": "./model/MACVO_FrontendCov_v2.npz",
    "enc_dtype": "bf16", "dec_dtype": "bf16",
    "decoder_depth": 12, "enforce_positive_disparity": False}})
m = run_and_evaluate(cfg, seq)
rec = {k: {"rmse": float(v.rmse), "mean": float(v.mean)} for k, v in m.items()}
Path("eval_real_asset_v2.json").write_text(json.dumps(rec, indent=1) + "\n")
print(json.dumps(rec, indent=1))
EOF

echo "=== $(date -u +%FT%TZ) real-asset dense diagnostics (v2, full 640x640, bf16)"
timeout 1500 python - <<'EOF'
from macvo_tpu.data.datasets.tartanair import TartanAirV2
from macvo_tpu.evaluation.dense import evaluate_flow, evaluate_depth
from macvo_tpu.modules.frontend import IMatcher, IStereoDepth
from macvo_tpu.utils.config import build_dynamic_config

seq = TartanAirV2({"root": "assets/test_sequence/TartanAir2_abs_P000",
                   "compressed": True, "gtFlow": True, "gtDepth": True, "gtPose": True})
mcfg, _ = build_dynamic_config({"type": "FlowFormerCovMatcher", "args": {
    "weight": "./model/MACVO_FrontendCov_v2.npz", "enc_dtype": "bf16",
    "dec_dtype": "bf16", "decoder_depth": 12}})
print("FLOW v2:", evaluate_flow(IMatcher.instantiate(mcfg.type, mcfg.args), seq), flush=True)
dcfg, _ = build_dynamic_config({"type": "FlowFormerCovDepth", "args": {
    "weight": "./model/MACVO_FrontendCov_v2.npz", "enc_dtype": "bf16",
    "dec_dtype": "bf16", "decoder_depth": 12, "enforce_positive_disparity": False}})
print("DEPTH v2:", evaluate_depth(IStereoDepth.instantiate(dcfg.type, dcfg.args), seq), flush=True)
EOF

echo "=== $(date -u +%FT%TZ) covariance calibration (real + synthetic holdout)"
mkdir -p results
timeout 1500 python scripts/cov_calibration.py --weight model/MACVO_FrontendCov_v2.npz \
    --data real --out results/cov_calibration_real_v2 2>&1 | tail -14
timeout 1500 python scripts/cov_calibration.py --weight model/MACVO_FrontendCov_v2.npz \
    --data synthetic --out results/cov_calibration_synth_v2 2>&1 | tail -14

echo "=== $(date -u +%FT%TZ) finisher done"
