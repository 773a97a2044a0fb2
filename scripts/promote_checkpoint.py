"""Gated checkpoint promotion (VERDICT r3 next-round #1 / weak #1).

Measures a CANDIDATE FlowFormerCov checkpoint on the committed real
TartanAir v2 asset — dense flow EPE (bf16, same recipe as
tests/test_real_asset.py::test_real_asset_learned_flow_quality) and full E2E
ATE (fp32, same config as test_real_asset_learned_frontend) — and promotes it
to the shipped name ONLY if it beats the currently-shipped record on BOTH
numbers. Promotion atomically:

  * copies the candidate to  model/MACVO_FrontendCov.npz
  * rewrites                 model/MACVO_FrontendCov.eval.json   (the file the
    test pins derive from, so the suite stays green and the pins TIGHTEN in
    the same commit)
  * rewrites                 eval_real_asset.json                (README table)

Usage:
    python scripts/promote_checkpoint.py --candidate model/MACVO_FrontendCov_v2.npz
    python scripts/promote_checkpoint.py --candidate ... --force   # skip gate
    python scripts/promote_checkpoint.py --candidate ... --dry-run # measure only
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

REPO = Path(__file__).parent.parent
SHIPPED = REPO / "model" / "MACVO_FrontendCov.npz"
RECORD = REPO / "model" / "MACVO_FrontendCov.eval.json"
E2E_JSON = REPO / "eval_real_asset.json"


def measure(weight: Path) -> dict:
    from tests.test_real_asset import make_config, real_sequence, run_and_evaluate

    from macvo_tpu.evaluation.dense import evaluate_flow
    from macvo_tpu.modules.frontend import IMatcher
    from macvo_tpu.utils.config import build_dynamic_config

    print(f"[measure] dense flow EPE (bf16) for {weight} ...", flush=True)
    seq = real_sequence(gt_frontend=True)
    mcfg, _ = build_dynamic_config({"type": "FlowFormerCovMatcher", "args": {
        "weight": str(weight), "enc_dtype": "bf16",
        "dec_dtype": "bf16", "decoder_depth": 12}})
    perf = evaluate_flow(IMatcher.instantiate(mcfg.type, mcfg.args), seq)
    print(f"[measure] flow EPE {perf.epe:.3f} px  px1 {perf.px1:.3f} px3 {perf.px3:.3f}")

    print(f"[measure] full E2E (fp32) for {weight} ...", flush=True)
    seq = real_sequence(gt_frontend=False)
    cfg = make_config({"type": "FlowFormerCovFrontend", "args": {
        "weight": str(weight), "enc_dtype": "fp32", "dec_dtype": "fp32",
        "decoder_depth": 12, "enforce_positive_disparity": False}})
    m = run_and_evaluate(cfg, seq)
    e2e = {k: {"rmse": float(v.rmse), "mean": float(v.mean)} for k, v in m.items()}
    print("[measure] E2E:", json.dumps({k: round(v["rmse"], 4) for k, v in e2e.items()}))
    return {"flow_epe_px": float(perf.epe), "ate_m": float(m["ATE"].rmse), "e2e": e2e}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--candidate", type=str, required=True)
    ap.add_argument("--force", action="store_true", help="promote even if the gate fails")
    ap.add_argument("--dry-run", action="store_true", help="measure, never promote")
    ap.add_argument("--device", type=str, default=None, choices=["cpu", "tpu"],
                    help="cpu lets promotion run while the chip trains")
    args = ap.parse_args()

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    cand = Path(args.candidate)
    assert cand.exists(), cand
    new = measure(cand)

    cur = json.loads(RECORD.read_text()) if RECORD.exists() else None
    if cur is not None:
        print(f"[gate] shipped: EPE {cur['flow_epe_px']:.2f} px, ATE {cur['ate_m']:.4f} m")
        print(f"[gate] candidate: EPE {new['flow_epe_px']:.2f} px, ATE {new['ate_m']:.4f} m")
        better = (new["flow_epe_px"] < cur["flow_epe_px"]
                  and new["ate_m"] < cur["ate_m"])
    else:
        better = True

    if args.dry_run:
        print("[dry-run] no promotion")
        return
    if not better and not args.force:
        print("[gate] FAILED — candidate does not beat the shipped checkpoint on "
              "both numbers; not promoting (use --force to override)")
        sys.exit(2)

    import jax

    platform = jax.devices()[0].platform
    hardware = f"{jax.devices()[0].device_kind} ({platform})"
    measured_utc = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    # Self-promotion (--candidate <shipped> --force) re-measures the shipped
    # checkpoint under the current code and refreshes the records in place.
    if not (SHIPPED.exists() and cand.resolve() == SHIPPED.resolve()):
        shutil.copyfile(cand, SHIPPED)
    RECORD.write_text(json.dumps({
        "weight": SHIPPED.name,
        "promoted_from": cand.name,
        "measured_utc": measured_utc,
        "platform": platform,
        "hardware": hardware + ", eval dtype bf16 (flow) / fp32 (E2E)",
        "real_asset": "assets/test_sequence/TartanAir2_abs_P000",
        "flow_epe_px": round(new["flow_epe_px"], 4),
        "ate_m": new["ate_m"],
        "note": "Measured numbers of the SHIPPED checkpoint on the committed real "
                "TartanAir v2 asset. Regression-test pins in tests/test_real_asset.py "
                "derive from this file (VERDICT r3 weak #1); this record was written "
                "by scripts/promote_checkpoint.py at promotion time.",
    }, indent=1) + "\n")
    # eval_real_asset.json is the CANONICAL E2E record cited by the README.
    # Only this script writes it, and it carries a platform/provenance stamp
    # (ADVICE r4 high: the slow test used to overwrite it on arbitrary
    # platforms, leaving the repo with contradictory accuracy numbers).
    E2E_JSON.write_text(json.dumps({
        "weight": SHIPPED.name,
        "measured_utc": measured_utc,
        "platform": platform,
        "hardware": hardware,
        "writer": "scripts/promote_checkpoint.py",
        "metrics": new["e2e"],
    }, indent=1) + "\n")
    # Keep the metrics CSV provenance: the candidate's training curve becomes
    # the shipped checkpoint's curve.
    cand_csv = cand.with_name(cand.stem + "_metrics.csv")
    shipped_csv = SHIPPED.with_name(SHIPPED.stem + "_metrics.csv")
    if cand_csv.exists() and cand_csv.resolve() != shipped_csv.resolve():
        shutil.copyfile(cand_csv, shipped_csv)
    # Ship the candidate's covariance-temperature file too (the frontend
    # auto-loads <weight>.calib.json; see scripts/fit_cov_temperature.py).
    # A candidate WITHOUT one must remove any stale shipped calib — the
    # temperatures are fitted per-weight and must never apply to another
    # checkpoint's head.
    cand_calib = cand.with_suffix(".calib.json")
    shipped_calib = SHIPPED.with_suffix(".calib.json")
    if cand_calib.exists() and cand_calib != shipped_calib:
        shutil.copyfile(cand_calib, shipped_calib)
    elif not cand_calib.exists() and shipped_calib.exists():
        shipped_calib.unlink()
        print(f"[promote] removed stale {shipped_calib} (candidate ships no calib)")
    print(f"[promote] {cand} -> {SHIPPED}; eval record + E2E JSON rewritten")


if __name__ == "__main__":
    main()
