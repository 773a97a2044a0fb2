"""Covariance-calibration evidence for a FlowFormerCov checkpoint
(reference methodology: Utility/Extensions/GridRecorder.py:8-67 calibration
grids + FlowCovPerformance quantile coverage, Utility/Datatypes.py:27-94).

For each evaluated pair the script reports:
  * masked flow EPE and Gaussian NLL;
  * chi-square coverage: fraction of pixels whose normalized squared error
    err_u^2/sigma_u^2 + err_v^2/sigma_v^2 falls below the chi2(2) quantiles at
    50/90/95 % — a CALIBRATED head matches the nominal levels, an
    overconfident head (sigma too small) undershoots them;
  * a GridRecorder density of log10(predicted sigma) vs log10(|error|)
    saved as npz + png (diagonal = calibrated).

Usage:
    python scripts/cov_calibration.py --weight model/MACVO_FrontendCov.npz \
        --data real   # real TartanAir2 asset pairs
    python scripts/cov_calibration.py --weight ... --data synthetic
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

# chi2(2) quantiles at 50/90/95 %
CHI2_2 = {"p50": 1.386, "p90": 4.605, "p95": 5.991}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weight", type=str, default="model/MACVO_FrontendCov.npz")
    ap.add_argument("--data", choices=["real", "synthetic"], default="real")
    ap.add_argument("--out", type=str, default="results/cov_calibration")
    ap.add_argument("--device", type=str, default=None, choices=["cpu", "tpu"])
    ap.add_argument("--max_pairs", type=int, default=6)
    ap.add_argument("--calib", type=str, default="none",
                    help="'none' (raw head), 'auto' (<weight>.calib.json if "
                         "present), or an explicit temperature-file path")
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from macvo_tpu.modules.frontend import IFrontend
    from macvo_tpu.utils.extensions import GridRecorder

    if args.data == "real":
        from macvo_tpu.data.datasets.tartanair import TartanAirV2
        seq = TartanAirV2({"root": "./assets/test_sequence/TartanAir2_abs_P000",
                           "compressed": True, "gtFlow": True, "gtDepth": True,
                           "gtPose": True})
    else:
        from macvo_tpu.data.datasets.synthetic import SyntheticStereo
        seq = SyntheticStereo({"n_frames": args.max_pairs + 1, "width": 320,
                               "height": 240, "fx": 160.0, "fy": 160.0,
                               "seed": 123, "traj_seed": 17})

    from types import SimpleNamespace

    fe = IFrontend.instantiate("FlowFormerCovFrontend", SimpleNamespace(
        weight=args.weight, enc_dtype="fp32", dec_dtype="fp32",
        decoder_depth=12, enforce_positive_disparity=False,
        cov_calib=args.calib))

    grid = GridRecorder((-2.0, 2.0), (-2.0, 2.0), bins=(80, 80))
    nlls, epes, cov = [], [], {k: [] for k in CHI2_2}
    n = min(args.max_pairs, len(seq) - 1)
    for i in range(n):
        f0, f1 = seq[i], seq[i + 1]
        _, match = fe.estimate_pair(f0.stereo, f1.stereo)
        assert match.cov is not None, "frontend must predict flow covariance"
        est = np.asarray(match.flow[0], np.float64)
        gt = np.asarray(f0.stereo.gt_flow[0], np.float64)
        mask = np.asarray(f0.stereo.flow_mask[0, ..., 0]) > 0.5
        if match.mask is not None:
            mask &= np.asarray(match.mask[0, ..., 0])
        var = np.asarray(match.cov[0, ..., :2], np.float64)  # (H,W,2) sigma_uu, sigma_vv
        var = np.maximum(var, 1e-12)
        err = est - gt
        epe = np.sqrt((err ** 2).sum(-1))
        nll = 0.5 * ((err ** 2) / var + np.log(var) + np.log(2 * np.pi)).sum(-1)
        chi2 = ((err ** 2) / var).sum(-1)
        epes.append(float(epe[mask].mean()))
        nlls.append(float(nll[mask].mean()))
        for k, q in CHI2_2.items():
            cov[k].append(float((chi2[mask] < q).mean()))
        grid.record(np.log10(np.sqrt(var[mask]).ravel()),
                    np.log10(np.abs(err[mask]).ravel() + 1e-6))

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    rec = {
        "weight": args.weight, "data": args.data, "pairs": n, "calib": args.calib,
        "epe": float(np.mean(epes)), "nll": float(np.mean(nlls)),
        "chi2_coverage": {k: float(np.mean(v)) for k, v in cov.items()},
        "nominal": {"p50": 0.50, "p90": 0.90, "p95": 0.95},
    }
    Path(str(out) + ".json").write_text(json.dumps(rec, indent=1) + "\n")
    grid.save(str(out) + "_grid.npz")
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(5, 5))
        d = grid.density
        ax.imshow(d.T, origin="lower", extent=(-2, 2, -2, 2), aspect="auto",
                  cmap="viridis")
        ax.plot([-2, 2], [-2, 2], "w--", lw=1, label="calibrated")
        ax.set_xlabel("log10 predicted sigma (px)")
        ax.set_ylabel("log10 |flow error| (px)")
        ax.set_title(f"cov calibration — {args.data}")
        ax.legend()
        fig.tight_layout()
        fig.savefig(str(out) + ".png", dpi=120)
    except Exception as e:  # noqa: BLE001
        print("plot skipped:", e)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
