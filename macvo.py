#!/usr/bin/env python
"""MAC-VO TPU runner (reference CLI parity: MACVO.py:47-158).

Usage:
    python macvo.py --odom configs/experiment/macvo/MACVO_Synthetic.yaml \
                    --data configs/sequence/Synthetic_Demo.yaml

Builds a Sandbox result directory, runs the odometry over the sequence,
writes poses.npy / ref_poses.npy / tensor_map.npz, and (unless --noeval)
prints the ATE/RTE/ROE/RPE table.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description="MAC-VO TPU-native odometry runner")
    parser.add_argument("--odom", type=str, required=True, help="odometry config yaml")
    parser.add_argument("--data", type=str, default=None,
                        help="sequence config yaml (default: Data section of --odom)")
    parser.add_argument("--seq_from", type=int, default=None, help="clip start frame")
    parser.add_argument("--seq_to", type=int, default=None, help="clip end frame")
    parser.add_argument("--resultRoot", type=str, default="./results")
    parser.add_argument("--preload", action="store_true", help="RAM-preload the sequence")
    parser.add_argument("--autoremove", action="store_true",
                        help="remove the result sandbox on exit")
    parser.add_argument("--noeval", action="store_true", help="skip metric evaluation")
    parser.add_argument("--timing", action="store_true", help="enable the profiler")
    parser.add_argument("--saveplt", action="store_true",
                        help="save trajectory/error figures into the sandbox")
    parser.add_argument("--device", type=str, default=None, choices=["cpu", "tpu"],
                        help="force the JAX backend (reference device directive, "
                             "MACVO.py:52; default: environment's accelerator)")
    args = parser.parse_args()

    if args.device is not None:
        # Must happen before any jax computation; env vars alone are
        # overridden by accelerator site hooks in some environments.
        import jax
        jax.config.update("jax_platforms", args.device)

    from macvo_tpu.data import DevicePrefetcher, SequenceBase, smart_transform
    from macvo_tpu.evaluation import evaluate_sandbox
    from macvo_tpu.odometry import MACVO, TartanVO
    from macvo_tpu.utils import timer
    from macvo_tpu.utils.config import load_config, namespace_to_dict, save_config
    from macvo_tpu.utils.logging import Logger, print_as_table
    from macvo_tpu.utils.sandbox import Sandbox

    odom_cfg, odom_dict = load_config(Path(args.odom))
    if args.data is not None:
        data_cfg, data_dict = load_config(Path(args.data))
        odom_dict["Data"] = data_dict
    else:
        assert hasattr(odom_cfg, "Data"), "--data not given and no Data section in --odom"
        data_cfg = odom_cfg.Data

    project_name = getattr(odom_cfg.Odometry, "name", "MACVO")
    sandbox = Sandbox.create(args.resultRoot, project_name)
    if args.autoremove:
        sandbox.set_autoremove()
    save_config(odom_dict, sandbox.path("config.yaml"))
    timer.setup(args.timing)

    seq = SequenceBase.from_config(data_cfg.Sequence if hasattr(data_cfg, "Sequence") else data_cfg)
    if args.seq_from is not None or args.seq_to is not None:
        seq.clip(args.seq_from, args.seq_to)
    if hasattr(odom_cfg, "Preprocess"):
        seq = smart_transform(seq, odom_cfg.Preprocess)
    if args.preload:
        seq = seq.preload()

    # Odometry-class dispatch (reference: MACVO.py builds the class the
    # --odom config names — MACVO or a baseline, Odometry/BaselineTartanVO.py).
    odom_cls = {"MACVO": MACVO, "TartanVO": TartanVO}[
        getattr(odom_cfg.Odometry, "type", "MACVO")]
    odom_cls.is_valid_config(odom_cfg.Odometry)
    system = odom_cls.from_config(odom_cfg)
    Logger.info(f"Running {project_name} on {seq} -> {sandbox.folder}")
    # Stage frames onto the device one step ahead: decode + upload overlap the
    # previous frame's compute (replaces the reference's thread preloader for
    # streaming use, DataLoader/SequenceBase.py:78-95).
    system.receive_frames(DevicePrefetcher(seq, depth=2), saveto=sandbox)

    if args.timing:
        timer.report()
        timer.save_elapsed(sandbox.path("elapsed_time.json"))

    if args.saveplt and sandbox.path("ref_poses.npy").exists():
        from macvo_tpu.evaluation.plot_seq import plot_separately

        plot_separately([str(sandbox.folder)], sandbox.path("plots"))
        Logger.info(f"figures saved to {sandbox.path('plots')}")

    if not args.noeval and sandbox.path("ref_poses.npy").exists():
        metrics = evaluate_sandbox(sandbox)
        print_as_table(
            ["metric", "mean", "std", "rmse", "max"],
            [[k, f"{v.mean:.6f}", f"{v.std:.6f}", f"{v.rmse:.6f}", f"{v.max:.6f}"]
             for k, v in metrics.items()],
            title=f"Evaluation — {project_name}",
        )


if __name__ == "__main__":
    main()
