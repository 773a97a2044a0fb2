#!/usr/bin/env python
"""Batch experiment runner (reference: Scripts/Experiment/Experiment_MACVO.py).

Runs one odometry config over many sequence configs, collects per-sequence
ATE/RTE/ROE/RPE plus the average row, and writes a CSV.

    python scripts/experiment_macvo.py --odom configs/experiment/macvo/X.yaml \
        --data configs/sequence/A.yaml configs/sequence/B.yaml \
        --resultRoot ./results
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--odom", type=str, required=True)
    parser.add_argument("--data", type=str, nargs="+", required=True)
    parser.add_argument("--resultRoot", type=str, default="./results")
    parser.add_argument("--seq_from", type=int, default=None)
    parser.add_argument("--seq_to", type=int, default=None)
    args = parser.parse_args()

    import numpy as np

    from macvo_tpu.data import SequenceBase, smart_transform
    from macvo_tpu.evaluation import evaluate_sandbox
    from macvo_tpu.odometry import MACVO
    from macvo_tpu.utils.config import load_config
    from macvo_tpu.utils.logging import Logger, print_as_table, save_as_csv
    from macvo_tpu.utils.sandbox import Sandbox

    odom_cfg, _ = load_config(Path(args.odom))
    project = getattr(odom_cfg.Odometry, "name", "MACVO")
    parent = Sandbox.create(args.resultRoot, f"{project}_batch")

    rows = []
    for data_path in args.data:
        data_cfg, _ = load_config(Path(data_path))
        seq_cfg = data_cfg.Sequence if hasattr(data_cfg, "Sequence") else data_cfg
        seq = SequenceBase.from_config(seq_cfg)
        if args.seq_from is not None or args.seq_to is not None:
            seq.clip(args.seq_from, args.seq_to)
        if hasattr(odom_cfg, "Preprocess"):
            seq = smart_transform(seq, odom_cfg.Preprocess)

        child = parent.new_child(Path(data_path).stem)
        Logger.info(f"[{Path(data_path).stem}] running {len(seq)} frames")
        system = MACVO.from_config(odom_cfg)
        system.receive_frames(seq, saveto=child)
        try:
            m = evaluate_sandbox(child)
            rows.append([Path(data_path).stem, m["ATE"].rmse, m["RTE"].rmse,
                         m["ROE"].rmse, m["RPE"].rmse])
        except FileNotFoundError:
            rows.append([Path(data_path).stem, float("nan")] + [float("nan")] * 3)

    if rows:
        avg = ["Average"] + [float(np.nanmean([r[i] for r in rows])) for i in range(1, 5)]
        rows.append(avg)
    headers = ["sequence", "ATE rmse", "RTE rmse", "ROE rmse", "RPE rmse"]
    print_as_table(headers, [[r[0]] + [f"{v:.6f}" for v in r[1:]] for r in rows],
                   title=f"{project} batch evaluation")
    save_as_csv(headers, rows, parent.path("evaluation.csv"))
    Logger.info(f"results -> {parent.folder}")


if __name__ == "__main__":
    main()
