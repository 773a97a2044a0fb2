#!/usr/bin/env python
"""Per-sequence optical-flow matcher quality report
(reference: Scripts/AdHoc/MatchQuality.py — compares matcher configurations
on the same sequence).

    python scripts/match_quality.py --data configs/sequence/<seq>.yaml \
        [--module '{"type": "GTMatcher", "args": {}}'] [--module '{...}']
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
    ap.add_argument("--module", type=str, action="append", default=None,
                    help="matcher config json; repeat to compare several")
    args = ap.parse_args()
    modules = args.module or [json.dumps({
        "type": "FlowFormerCovMatcher",
        "args": {"weight": "random:0", "enc_dtype": "bf16", "dec_dtype": "bf16",
                 "decoder_depth": 12},
    })]

    from macvo_tpu.data import SequenceBase
    from macvo_tpu.evaluation.dense import evaluate_flow, evaluate_flowcov
    from macvo_tpu.modules.frontend import IMatcher
    from macvo_tpu.utils.config import build_dynamic_config, load_config
    from macvo_tpu.utils.logging import Logger

    datacfg, _ = load_config(Path(args.data))
    seq_cfg = datacfg.Sequence if hasattr(datacfg, "Sequence") else datacfg
    seq = SequenceBase.from_config(seq_cfg)

    for mod_json in modules:
        mod_cfg, _ = build_dynamic_config(json.loads(mod_json))
        module = IMatcher.instantiate(mod_cfg.type, mod_cfg.args)
        perf = evaluate_flow(module, seq)
        Logger.info(f"{mod_cfg.type} flow quality on {seq}: {perf}")
        print(json.dumps({"module": mod_cfg.type, "flow": perf.__dict__}))
        if getattr(module, "provide_cov", False):
            cov_perf = evaluate_flowcov(module, seq)
            print(json.dumps({"module": mod_cfg.type, "flow_cov": cov_perf.__dict__}))


if __name__ == "__main__":
    main()
