#!/usr/bin/env bash
# Round-5c: tail-weighted cov-NLL experiment (the sigma-TAIL lever behind the
# paper's SIII.B selection claim — ABLATION.md reading #2). Phases:
#   COV-TAIL    2000 cov-only steps, tail_weight 3.0, holdout worlds, from
#               the promoted checkpoint (flow frozen -> EPE unchanged)
#   CALIB       chi2 coverage of the candidate on the real pairs
#   SELECTION   Full vs CovOpt on the in-domain holdout with the candidate
# Every phase commits its evidence; the shipped checkpoint is NOT touched
# (a cov-only candidate cannot pass the promotion gate by construction —
# this is a measured experiment, promoted only by a human decision).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p evidence model
export JAX_COMPILATION_CACHE_DIR=/tmp/macvo_jax_cache

LOG=evidence/chain_r5c.log
hb() { echo "=== $(date -u +%FT%TZ) $*" | tee -a "$LOG"; }
die() { hb "FATAL: $*"; exit 1; }

commit_evidence() {
    local msg=$1; shift
    stage() { local p; for p in "$LOG" "$@"; do [ -e "$p" ] && git add "$p" 2>>"$LOG"; done; }
    stage "$@"
    for _ in 1 2 3; do
        git commit -q -m "$msg" 2>>"$LOG" && { hb "committed: $msg"; return 0; }
        stage "$@"; sleep 2
    done
    hb "commit skipped: $msg"
}

CAND=model/MACVO_FrontendCov_tailcov.npz

if [ ! -f model/MACVO_FrontendCov_tailcov.done ]; then
    tries=0
    while [ ! -f model/MACVO_FrontendCov_tailcov.done ] && [ $tries -lt 3 ]; do
        tries=$((tries+1))
        hb "phase COV-TAIL: invocation $tries/3"
        timeout 3000 python -m macvo_tpu.train.run \
            --config configs/train/FlowFormerCov_randomized_cov.yaml \
            --steps 2000 --max_session_steps 2500 --tail_weight 3.0 \
            --restore model/MACVO_FrontendCov.npz \
            --out "$CAND" >>"$LOG" 2>&1 || hb "COV-TAIL rc=$? (resume)"
    done
    [ -f model/MACVO_FrontendCov_tailcov.done ] || die "COV-TAIL did not complete"
    hb "phase COV-TAIL complete ($(cat model/MACVO_FrontendCov_tailcov.done))"
    commit_evidence "Tail-weighted cov candidate trained (2000 holdout steps, tail_weight 3.0)" \
        "$CAND" model/MACVO_FrontendCov_tailcov_metrics.csv model/MACVO_FrontendCov_tailcov.done
fi

if [ ! -f evidence/chain_r5c_calib.done ]; then
    hb "phase CALIB: chi2 coverage of the tail-cov candidate on real pairs"
    timeout 3600 python scripts/cov_calibration.py --weight "$CAND" \
        --data real --calib none --out evidence/cov_calibration_real_tailcov \
        >>"$LOG" 2>&1 || die "CALIB rc=$?"
    date -u +%FT%TZ > evidence/chain_r5c_calib.done
    commit_evidence "Tail-cov candidate calibration on real pairs" \
        evidence/cov_calibration_real_tailcov.json evidence/cov_calibration_real_tailcov.png \
        evidence/cov_calibration_real_tailcov_grid.npz evidence/chain_r5c_calib.done
fi

if [ ! -f evidence/chain_r5c_sel.done ]; then
    hb "phase SELECTION: Full vs CovOpt on seq_1048 with the candidate sigma"
    timeout 5400 python - >>"$LOG" 2>&1 <<'PY' || die "SELECTION rc=$?"
import json, sys, time
sys.path.insert(0, ".")
from pathlib import Path
from macvo_tpu.data import SequenceBase
from macvo_tpu.odometry import MACVO
from macvo_tpu.utils.config import load_config
from macvo_tpu.evaluation import evaluate_all
import numpy as np

data_cfg, _ = load_config(Path("configs/sequence/Randomized_Holdout.yaml"))
rows = {}
for name in ("TartanAirv2_Full", "TartanAirv2_CovOpt"):
    cfg, _ = load_config(Path(f"configs/experiment/macvo/ablation/{name}.yaml"))
    cfg.Odometry.optimizer.type = "Local_TwoFrame_PGO"
    cfg.Odometry.optimizer.args.use_fp64 = False
    cfg.Odometry.frontend.args.weight = "model/MACVO_FrontendCov_tailcov.npz"
    seq = SequenceBase.from_config(data_cfg.Sequence)
    sys_ = MACVO.from_config(cfg)
    sys_.receive_frames(seq)
    est = np.asarray(sys_.graph.frames.data["pose"]).astype(np.float64)
    gt = np.stack([np.asarray(seq[i].gt_pose[0]) for i in range(len(seq))]).astype(np.float64)
    m = evaluate_all(gt, est)
    rows[name] = {k: round(float(v.rmse), 5) for k, v in m.items()}
    print(name, json.dumps(rows[name]), flush=True)
rec = {"weight": "model/MACVO_FrontendCov_tailcov.npz",
       "data": "configs/sequence/Randomized_Holdout.yaml",
       "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
       "rows": rows}
Path("evidence/selection_tailcov.json").write_text(json.dumps(rec, indent=1) + "\n")
PY
    date -u +%FT%TZ > evidence/chain_r5c_sel.done
    commit_evidence "Selection experiment with tail-weighted sigma (Full vs CovOpt, seq_1048)" \
        evidence/selection_tailcov.json evidence/chain_r5c_sel.done
fi

hb "chain r5c complete"
