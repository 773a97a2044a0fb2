#!/usr/bin/env python
"""Scaling-throughput harness (BASELINE.json measurement points: frames/s and
sequences/s at 1 chip / 1 host / N hosts).

Runs N synthetic sequences through the batched odometry driver (one
data-sharded frontend forward per step) and reports throughput and scaling
efficiency vs the single-sequence run.

    python scripts/throughput.py --devices 8 --platform cpu   # virtual mesh
    python scripts/throughput.py                              # real devices
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, default=0, help="virtual device count (0 = real)")
    parser.add_argument("--platform", type=str, default=None, choices=[None, "cpu"])
    parser.add_argument("--width", type=int, default=320)
    parser.add_argument("--height", type=int, default=240)
    parser.add_argument("--frames", type=int, default=6)
    args = parser.parse_args()

    import os

    if args.devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from macvo_tpu.data.datasets.synthetic import SyntheticStereo
    from macvo_tpu.parallel import BatchedOdometry, make_mesh
    from macvo_tpu.utils.config import build_dynamic_config

    n_dev = len(jax.devices())
    cfg, _ = build_dynamic_config({
        "Odometry": {
            "args": {"num_point": 128, "edgewidth": 20, "match_cov_default": 0.25,
                     "profile": False, "mapping": False},
            "frontend": {"type": "FlowFormerCovFrontend", "args": {
                "weight": "random:0", "enc_dtype": "bf16", "dec_dtype": "bf16",
                "enforce_positive_disparity": False, "decoder_depth": 12}},
            "motion": {"type": "StaticMotionModel", "args": {}},
            "keypoint": {"type": "RandomSelector", "args": {"mask_width": 24}},
            "mappoint": {"type": "RandomSelector", "args": {"mask_width": 24}},
            "outlier": {"type": "CovarianceSanityFilter", "args": {}},
            "cov": {"obs": {"type": "MatchCovariance", "args": {
                "kernel_size": 7, "match_cov_default": 0.25,
                "min_flow_cov": 0.25, "min_depth_cov": 0.05}}},
            "postprocess": {"type": "PoseInterpolate", "args": {}},
            "keyframe": {"type": "AllKeyframe", "args": {}},
            "optimizer": {"type": "Local_TwoFrame_PGO", "args": {
                "graph_type": "icp", "parallel": True, "capacity": 192}},
        }
    })

    def run(n_seq: int, mesh_axis: int) -> float:
        mesh = make_mesh((mesh_axis,), ("data",))
        seqs = [
            SyntheticStereo({"n_frames": args.frames, "width": args.width,
                             "height": args.height, "fx": args.width / 2.0,
                             "fy": args.width / 2.0, "seed": 7 + i})
            for i in range(n_seq)
        ]
        driver = BatchedOdometry(cfg, n_sequences=n_seq, mesh=mesh)
        driver.step([seq[0] for seq in seqs])  # warm up compiles
        driver.step([seq[1] for seq in seqs])
        t0 = time.perf_counter()
        for i in range(2, args.frames):
            driver.step([seq[i] for seq in seqs])
        elapsed = time.perf_counter() - t0
        return n_seq * (args.frames - 2) / elapsed

    fps_1 = run(1, 1)
    fps_n = run(n_dev, n_dev) if n_dev > 1 else fps_1
    efficiency = fps_n / (fps_1 * n_dev) if n_dev > 1 else 1.0
    print(json.dumps({
        "devices": n_dev,
        "frames_per_s_1seq": round(fps_1, 3),
        "frames_per_s_nseq": round(fps_n, 3),
        "scaling_efficiency": round(efficiency, 3),
    }))


if __name__ == "__main__":
    main()
