"""Fit per-band covariance temperatures on a HOLDOUT world (VERDICT r4 #4).

The NLL-trained cov head is calibrated at the median (chi2 p50 coverage 0.44
vs nominal 0.50) but overconfident in the tails (p90 0.63 vs 0.90) — the flow
error distribution is heavier-tailed than the predicted Gaussian. A cheap,
principled post-hoc fix (Kuleshov et al.-style recalibration, reference
behavior to match: Module/Network/FlowFormerCov/covhead.py:116-117 whose
published weights produce selection-grade sigma): partition pixels by
predicted log10(sigma) into quantile bands and scale each band's VARIANCE by
its NLL-optimal temperature

    tau2_b = mean over band b of  (err_u^2/var_u + err_v^2/var_v) / 2

fitted on a world no training phase ever saw (default seq_1049, the permanent
holdout). The fitted {edges, tau2} json is applied inside the jitted frontend
forward (macvo_tpu/modules/frontend_network.py::_FlowFormerRunner._recalibrate)
whenever a ``<weight>.calib.json`` sibling exists.

Usage:
    python scripts/fit_cov_temperature.py --weight model/MACVO_FrontendCov_v4.npz \
        --root data/randomized/seq_1049 --device tpu
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

CHI2_2 = {"p50": 1.386, "p90": 4.605, "p95": 5.991}


def coverage(chi2, mask):
    return {k: float((chi2[mask] < q).mean()) for k, q in CHI2_2.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weight", type=str, required=True)
    ap.add_argument("--root", type=str, default="data/randomized/seq_1049")
    ap.add_argument("--max_pairs", type=int, default=16)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--device", type=str, default=None, choices=["cpu", "tpu"])
    ap.add_argument("--dtype", type=str, default="bf16",
                    help="network dtype for the fit forward passes")
    ap.add_argument("--out", type=str, default=None,
                    help="default: <weight>.calib.json")
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from macvo_tpu.data.datasets.tartanair import TartanAir
    from macvo_tpu.modules.frontend import IMatcher
    from macvo_tpu.utils.config import build_dynamic_config

    seq = TartanAir({"root": args.root, "gtFlow": True, "gtDepth": False,
                     "gtPose": True})
    mcfg, _ = build_dynamic_config({"type": "FlowFormerCovMatcher", "args": {
        "weight": args.weight, "enc_dtype": args.dtype, "dec_dtype": args.dtype,
        "decoder_depth": 12, "cov_calib": "none"}})
    matcher = IMatcher.instantiate(mcfg.type, mcfg.args)

    sig2_u, sig2_v, err_u2, err_v2 = [], [], [], []
    n = min(args.max_pairs, len(seq) - 1)
    for i in range(n):
        f0, f1 = seq[i], seq[i + 1]
        match = matcher.estimate(f0.stereo, f1.stereo)
        est = np.asarray(match.flow[0], np.float64)
        gt = np.asarray(f0.stereo.gt_flow[0], np.float64)
        mask = np.asarray(f0.stereo.flow_mask[0, ..., 0]) > 0.5
        var = np.maximum(np.asarray(match.cov[0, ..., :2], np.float64), 1e-12)
        err = est - gt
        sig2_u.append(var[mask, 0]); sig2_v.append(var[mask, 1])
        err_u2.append(err[mask, 0] ** 2); err_v2.append(err[mask, 1] ** 2)
        print(f"[fit] pair {i}: epe={np.sqrt((err**2).sum(-1))[mask].mean():.3f} px",
              flush=True)

    s2u, s2v = np.concatenate(sig2_u), np.concatenate(sig2_v)
    e2u, e2v = np.concatenate(err_u2), np.concatenate(err_v2)
    # Band index must mirror apply time: per-pixel mean variance.
    log_sigma = 0.5 * np.log10(0.5 * (s2u + s2v))
    # Quantile edges -> balanced band populations.
    edges = np.quantile(log_sigma, np.linspace(0, 1, args.bands + 1)[1:-1])
    idx = np.searchsorted(edges, log_sigma)
    z2 = 0.5 * (e2u / s2u + e2v / s2v)   # NLL-optimal tau^2 = mean z2 per band
    tau2 = np.ones(args.bands)
    for b in range(args.bands):
        sel = idx == b
        if sel.sum() >= 100:
            tau2[b] = float(z2[sel].mean())

    chi2_raw = 2.0 * z2
    chi2_cal = chi2_raw / tau2[idx]
    all_mask = np.ones(len(z2), bool)
    rec = {
        "weight": args.weight,
        "fit_root": args.root,
        "pairs": n,
        "bands": args.bands,
        "log10_sigma_edges": [float(x) for x in edges],
        "tau2": [float(x) for x in tau2],
        "fit_coverage_raw": coverage(chi2_raw, all_mask),
        "fit_coverage_recalibrated": coverage(chi2_cal, all_mask),
        "nominal": {"p50": 0.50, "p90": 0.90, "p95": 0.95},
        "note": "variance temperatures per log10(sigma) band, fitted on the "
                "permanent holdout world (never trained on); applied in "
                "_FlowFormerRunner._recalibrate when this file sits next to "
                "the weight npz.",
    }
    out = Path(args.out) if args.out else Path(args.weight).with_suffix(".calib.json")
    out.write_text(json.dumps(rec, indent=1) + "\n")
    print(json.dumps({k: rec[k] for k in
                      ("tau2", "fit_coverage_raw", "fit_coverage_recalibrated")},
                     indent=1))
    print(f"[fit] wrote {out}")


if __name__ == "__main__":
    main()
