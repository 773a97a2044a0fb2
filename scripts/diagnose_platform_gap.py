"""Diagnose the TPU-vs-CPU E2E accuracy gap (VERDICT r4 missing #2).

Same shipped checkpoint, same fp32 config: E2E ATE on the real asset measured
0.409 m on TPU vs 0.0865 m on CPU — a 4.7x platform gap. Suspects (VERDICT):
  (a) TPU default matmul precision: an fp32-typed matmul/conv on the MXU runs
      reduced-precision passes unless precision=HIGHEST is requested (the
      reference manages the same knob explicitly on GPU: TF32 toggles,
      Module/Frontend/Frontend.py:275-278);
  (b) the f32 locally-re-anchored LM solve vs the CPU suite's f64 solve on
      the km-scale 'abs' world coordinates.

This script factorizes the gap in ONE process (the CPU backend coexists with
the TPU backend; CPU legs run under jax.default_device):

  stage A  dense flow EPE + |flow_tpu - flow_cpu| of the matcher at fp32,
           TPU default precision vs TPU HIGHEST vs CPU — isolates (a)
  stage B  full E2E on TPU at default vs HIGHEST matmul precision — measures
           how much of the 0.409 the precision knob recovers
  stage C  full E2E on TPU with the solver fed f64-style (use_fp64 config on
           the re-anchored solver) is not possible on-chip; instead the
           CPU-E2E is re-run in-process under default_device(cpu) as the
           reference point — isolates (b) as the residual after (a)

Writes evidence/tpu_cpu_gap_r5.json. Run on the real chip:
    python scripts/diagnose_platform_gap.py [--stages AB]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

OUT = Path(__file__).parent.parent / "evidence" / "tpu_cpu_gap_r5.json"
WEIGHT = "./model/MACVO_FrontendCov.npz"


def flow_leg(precision: str | None, cpu: bool, seq, calib: str = "none") -> dict:
    """Dense flow EPE of the shipped matcher on the real pairs + raw flow maps."""
    import jax
    import numpy as np

    from macvo_tpu.evaluation.dense import evaluate_flow
    from macvo_tpu.modules.frontend import IMatcher
    from macvo_tpu.utils.config import build_dynamic_config

    mcfg, _ = build_dynamic_config({"type": "FlowFormerCovMatcher", "args": {
        "weight": WEIGHT, "enc_dtype": "fp32", "dec_dtype": "fp32",
        "decoder_depth": 12, "cov_calib": calib}})

    import contextlib
    ctx = contextlib.ExitStack()
    if precision is not None:
        ctx.enter_context(jax.default_matmul_precision(precision))
    if cpu:
        ctx.enter_context(jax.default_device(jax.devices("cpu")[0]))
    with ctx:
        matcher = IMatcher.instantiate(mcfg.type, mcfg.args)
        t0 = time.time()
        perf = evaluate_flow(matcher, seq)
        flows = []
        for i in range(min(3, len(seq) - 1)):
            m = matcher.estimate(seq[i].stereo, seq[i + 1].stereo)
            flows.append(np.asarray(m.flow[0], np.float64))
    return {"epe": float(perf.epe), "px1": float(perf.px1), "px3": float(perf.px3),
            "secs": round(time.time() - t0, 1), "_flows": flows}


def e2e_leg(precision: str | None, cpu: bool) -> dict:
    import contextlib

    import jax
    import numpy as np  # noqa: F401

    from tests.test_real_asset import make_config, real_sequence, run_and_evaluate

    seq = real_sequence(gt_frontend=False)
    cfg = make_config({"type": "FlowFormerCovFrontend", "args": {
        "weight": WEIGHT, "enc_dtype": "fp32", "dec_dtype": "fp32",
        "decoder_depth": 12, "enforce_positive_disparity": False}})
    ctx = contextlib.ExitStack()
    if precision is not None:
        ctx.enter_context(jax.default_matmul_precision(precision))
    if cpu:
        ctx.enter_context(jax.default_device(jax.devices("cpu")[0]))
    t0 = time.time()
    with ctx:
        m = run_and_evaluate(cfg, seq)
    return {k: round(float(v.rmse), 5) for k, v in m.items()} | {
        "secs": round(time.time() - t0, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", type=str, default="AB")
    args = ap.parse_args()

    import jax
    import numpy as np

    from tests.test_real_asset import real_sequence

    rec: dict = {"platform_default": jax.default_backend(),
                 "weight": WEIGHT, "measured_utc":
                 time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}

    if "A" in args.stages:
        seq = real_sequence(gt_frontend=True)
        legs = {}
        for name, prec, cpu in (("tpu_default", None, False),
                                ("tpu_highest", "highest", False),
                                ("cpu", None, True)):
            legs[name] = flow_leg(prec, cpu=cpu, seq=seq)
            print(name, json.dumps({k: legs[name][k] for k in
                                    ("epe", "px1", "px3", "secs")}), flush=True)
        # pairwise flow deltas on the first pairs
        def delta(a, b):
            return [float(np.abs(x - y).mean()) for x, y in zip(a["_flows"], b["_flows"])]
        rec["stageA"] = {
            "epe": {k: {kk: v[kk] for kk in ("epe", "px1", "px3", "secs")}
                    for k, v in legs.items()},
            "mean_abs_flow_delta_px": {
                "tpu_default_vs_cpu": delta(legs["tpu_default"], legs["cpu"]),
                "tpu_highest_vs_cpu": delta(legs["tpu_highest"], legs["cpu"]),
                "tpu_default_vs_highest": delta(legs["tpu_default"], legs["tpu_highest"]),
            },
        }
        print(json.dumps(rec["stageA"], indent=1), flush=True)

    if "B" in args.stages:
        rec["stageB_e2e"] = {
            "tpu_default": e2e_leg(None, cpu=False),
            "tpu_highest": e2e_leg("highest", cpu=False),
        }
        print(json.dumps(rec["stageB_e2e"], indent=1), flush=True)

    if "C" in args.stages:
        rec["stageC_e2e_cpu"] = e2e_leg(None, cpu=True)
        print(json.dumps(rec["stageC_e2e_cpu"], indent=1), flush=True)

    OUT.write_text(json.dumps(rec, indent=1) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
