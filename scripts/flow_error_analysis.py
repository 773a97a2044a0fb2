#!/usr/bin/env python
"""Where does the real-asset flow error live? Regional EPE breakdown.

Buckets the dense EPE of a matcher on a GT-flow sequence by (a) GT flow
magnitude, (b) GT depth band (sky = far field), and (c) image-row band, and
reports each bucket's EPE + pixel share. This tells the training loop WHAT to
fix when the aggregate EPE plateaus: a sky-dominated tail means texture/sky
realism in the randomized generator; a large-motion tail means more
aggressive trajectories; a uniform floor means resolution/steps.

    python scripts/flow_error_analysis.py \
        --data configs/sequence/TartanAirv2_RealAsset.yaml \
        --weight model/MACVO_FrontendCov.npz --out evidence/flow_error_real.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

MAG_BINS = [0.0, 2.0, 8.0, 24.0, 64.0, 400.0]
DEPTH_BINS = [0.0, 5.0, 20.0, 100.0, 1e9]   # last band ≈ sky / far field
ROW_BANDS = 4


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", type=str, required=True)
    ap.add_argument("--weight", type=str, default="model/MACVO_FrontendCov.npz")
    ap.add_argument("--dtype", type=str, default="bf16")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--device", type=str, default=None, choices=["cpu", "tpu"])
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from macvo_tpu.data import SequenceBase
    from macvo_tpu.modules.frontend import IMatcher
    from macvo_tpu.utils.config import build_dynamic_config, load_config

    datacfg, _ = load_config(Path(args.data))
    seq_cfg = datacfg.Sequence if hasattr(datacfg, "Sequence") else datacfg
    seq = SequenceBase.from_config(seq_cfg)

    mcfg, _ = build_dynamic_config({"type": "FlowFormerCovMatcher", "args": {
        "weight": args.weight, "enc_dtype": args.dtype, "dec_dtype": args.dtype,
        "decoder_depth": 12}})
    matcher = IMatcher.instantiate(mcfg.type, mcfg.args)

    err_all, mag_all, depth_all, row_all = [], [], [], []
    for i in range(len(seq) - 1):
        f0, f1 = seq[i], seq[i + 1]
        assert f0.stereo.gt_flow is not None
        out = matcher.estimate(f0.stereo, f1.stereo)
        flow = np.asarray(out.flow).astype(np.float32)[0]
        gt = np.asarray(f0.stereo.gt_flow).astype(np.float32)[0]
        err = np.linalg.norm(flow - gt, axis=-1)
        mag = np.linalg.norm(gt, axis=-1)
        h = err.shape[0]
        rows = np.broadcast_to(np.arange(h)[:, None] * ROW_BANDS // h, err.shape)
        err_all.append(err.ravel()); mag_all.append(mag.ravel())
        row_all.append(rows.ravel())
        if f0.stereo.gt_depth is not None:
            depth_all.append(np.asarray(f0.stereo.gt_depth)[0, ..., 0].ravel())

    err = np.concatenate(err_all); mag = np.concatenate(mag_all)
    rows = np.concatenate(row_all)
    depth = np.concatenate(depth_all) if depth_all else None
    valid = mag < 400.0
    rec: dict = {"weight": args.weight, "epe_overall": float(err[valid].mean()),
                 "n_px": int(valid.sum()), "buckets": {}}

    def bucket(name, key, edges):
        rows_out = []
        for lo, hi in zip(edges[:-1], edges[1:]):
            m = valid & (key >= lo) & (key < hi)
            if m.sum() == 0:
                continue
            rows_out.append({
                "range": [float(lo), float(hi)],
                "share_pct": round(100.0 * m.sum() / valid.sum(), 2),
                "epe": round(float(err[m].mean()), 3),
                "epe_contrib_pct": round(100.0 * float(err[m].sum())
                                         / float(err[valid].sum()), 2),
            })
        rec["buckets"][name] = rows_out
        print(f"\n-- by {name}:")
        for r in rows_out:
            print(f"  [{r['range'][0]:>8.1f},{r['range'][1]:>10.1f})  "
                  f"share {r['share_pct']:5.1f}%  EPE {r['epe']:7.3f}  "
                  f"contributes {r['epe_contrib_pct']:5.1f}% of total error")

    print(f"overall EPE {rec['epe_overall']:.3f} px over {rec['n_px']} px")
    bucket("gt_flow_magnitude_px", mag, MAG_BINS)
    if depth is not None:
        bucket("gt_depth_m", depth, DEPTH_BINS)
    bucket("image_row_band", rows, list(range(ROW_BANDS + 1)))

    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(rec, indent=1) + "\n")
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
