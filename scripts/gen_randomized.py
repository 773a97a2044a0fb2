"""Pre-generate domain-randomized training sequences to disk (TartanAir v1
layout) so TPU training starts instantly and epochs re-read from the page
cache instead of re-rendering.

Usage:
    python scripts/gen_randomized.py --out data/randomized --n_seqs 16 \
        --n_frames 24 [--width 640 --height 480 --workers 4]

Geometry matches TartanAir v1 exactly (fx=fy=320, cx=320, cy=240, 640x480,
baseline 0.25) so the stock ``TartanAir`` loader serves the output.
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import sys
import time
from pathlib import Path

# spawn workers re-import this module without the CWD on sys.path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def gen_one(args: tuple) -> str:
    seed, n_frames, width, height, out_root = args
    from macvo_tpu.data.datasets.randomized import RandomizedStereo
    from macvo_tpu.data.datasets.synthetic import write_sequence_tartanair_layout

    t0 = time.time()
    seq = RandomizedStereo({
        "n_frames": n_frames, "width": width, "height": height,
        "fx": 320.0, "fy": 320.0, "cx": width / 2.0, "cy": height / 2.0,
        "baseline": 0.25, "seed": seed, "supersample": 2,
    })
    out = Path(out_root) / f"seq_{seed:04d}"
    write_sequence_tartanair_layout(seq, out)
    return f"{out} ({n_frames} frames, {time.time() - t0:.0f}s)"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n_seqs", type=int, default=16)
    ap.add_argument("--n_frames", type=int, default=24)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--seed0", type=int, default=1000)
    ap.add_argument("--workers", type=int, default=4)
    args = ap.parse_args()

    jobs = [(args.seed0 + i, args.n_frames, args.width, args.height, args.out)
            for i in range(args.n_seqs)]
    with mp.get_context("spawn").Pool(args.workers) as pool:
        for msg in pool.imap_unordered(gen_one, jobs):
            print("done:", msg, flush=True)


if __name__ == "__main__":
    main()
