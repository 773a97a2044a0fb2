#!/usr/bin/env python
"""Per-sequence stereo-depth quality report
(reference: Scripts/AdHoc/DepthQuality.py).

Streams a sequence through a configured IStereoDepth module and prints the
depth accuracy / covariance-calibration summary from the dense evaluation
suite:

    python scripts/depth_quality.py --data configs/sequence/<seq>.yaml \
        [--module '{"type": "GTDepth", "args": {}}']
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", type=str, required=True)
    ap.add_argument("--module", type=str, default=json.dumps({
        "type": "FlowFormerCovDepth",
        "args": {"weight": "random:0", "enc_dtype": "bf16", "dec_dtype": "bf16",
                 "decoder_depth": 12},
    }))
    ap.add_argument("--max_depth", type=float, default=80.0)
    args = ap.parse_args()

    from macvo_tpu.data import SequenceBase
    from macvo_tpu.evaluation.dense import evaluate_depth, evaluate_depthcov
    from macvo_tpu.modules.frontend import IStereoDepth
    from macvo_tpu.utils.config import build_dynamic_config, load_config
    from macvo_tpu.utils.logging import Logger

    datacfg, _ = load_config(Path(args.data))
    seq_cfg = datacfg.Sequence if hasattr(datacfg, "Sequence") else datacfg
    seq = SequenceBase.from_config(seq_cfg)
    mod_cfg, _ = build_dynamic_config(json.loads(args.module))
    module = IStereoDepth.instantiate(mod_cfg.type, mod_cfg.args)

    perf = evaluate_depth(module, seq, max_depth=args.max_depth)
    Logger.info(f"Depth quality on {seq}: {perf}")
    print(json.dumps({"depth": perf.__dict__}))
    if getattr(module, "provide_cov", False):
        cov_perf = evaluate_depthcov(module, seq, max_depth=args.max_depth)
        print(json.dumps({"depth_cov": cov_perf.__dict__}))


if __name__ == "__main__":
    main()
