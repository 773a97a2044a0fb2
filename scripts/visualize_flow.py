#!/usr/bin/env python
"""Render flow color-wheel visualizations for a sequence
(reference: Scripts/AdHoc/VisualizeFlow.py).

    python scripts/visualize_flow.py --data configs/sequence/<seq>.yaml \
        [--module '{"type": "GTMatcher", "args": {}}'] [--out Results/flow]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", type=str, required=True)
    ap.add_argument("--module", type=str, default=json.dumps({"type": "GTMatcher", "args": {}}))
    ap.add_argument("--out", type=str, default="Results/flow")
    ap.add_argument("--max_frames", type=int, default=10)
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from macvo_tpu.data import SequenceBase
    from macvo_tpu.modules.frontend import IMatcher
    from macvo_tpu.utils.config import build_dynamic_config, load_config
    from macvo_tpu.utils.logging import Logger
    from macvo_tpu.viz.plot_axes import flow_to_color

    datacfg, _ = load_config(Path(args.data))
    seq_cfg = datacfg.Sequence if hasattr(datacfg, "Sequence") else datacfg
    seq = SequenceBase.from_config(seq_cfg)
    mod_cfg, _ = build_dynamic_config(json.loads(args.module))
    matcher = IMatcher.instantiate(mod_cfg.type, mod_cfg.args)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    prev = None
    for i, frame in enumerate(seq):
        if i >= args.max_frames + 1:
            break
        if prev is not None:
            est = matcher.estimate(prev.stereo, frame.stereo)
            flow = np.asarray(est.flow)[0]
            fig, axes = plt.subplots(1, 2, figsize=(12, 4), dpi=120)
            axes[0].imshow(np.asarray(prev.stereo.imageL)[0])
            axes[0].set_title(f"frame {i - 1}")
            axes[1].imshow(flow_to_color(flow))
            axes[1].set_title("flow")
            for ax in axes:
                ax.axis("off")
            fig.tight_layout()
            fig.savefig(out / f"flow_{i - 1:04d}.png")
            plt.close(fig)
        prev = frame
    Logger.info(f"flow visualizations -> {out}")


if __name__ == "__main__":
    main()
