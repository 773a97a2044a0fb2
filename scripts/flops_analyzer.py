#!/usr/bin/env python
"""FLOP / memory analysis of the frontend network via XLA cost analysis
(reference: Scripts/AdHoc/FLOPS_analyzer.py used fvcore; here XLA's own
compiler cost model reports flops + bytes for the exact compiled program).

    python scripts/flops_analyzer.py [--height 480 --width 640 --batch 2]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--decoder_depth", type=int, default=12)
    ap.add_argument("--dtype", type=str, default="bf16")
    ap.add_argument("--device", type=str, default=None, choices=["cpu", "tpu"],
                    help="cpu analyzes the algorithmic FLOPs without the chip")
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from macvo_tpu.models.flowformer import FlowFormerConfig, FlowFormerCov

    cfg = FlowFormerConfig(encoder_dtype=args.dtype, decoder_dtype=args.dtype,
                           decoder_depth=args.decoder_depth, inference_only=True)
    model = FlowFormerCov(cfg)
    img = jnp.zeros((args.batch, args.height, args.width, 3), jnp.float32)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), img[:1], img[:1])["params"])
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)

    fn = jax.jit(lambda p, a, b: model.apply({"params": p}, a, b)["flow_final"])
    lowered = fn.lower(params, img, img)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    n_params = sum(int(x.size) for x in jax.tree.leaves(params))
    report = {
        "resolution": f"{args.height}x{args.width}",
        "batch": args.batch,
        "params_M": round(n_params / 1e6, 2),
        "flops_G": round(float(cost.get("flops", 0)) / 1e9, 2),
        "hbm_bytes_G": round(float(cost.get("bytes accessed", 0)) / 1e9, 2),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
