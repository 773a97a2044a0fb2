"""Train the TartanVO-family nets so the baseline runs REAL weights.

VERDICT r2 weak #6: the TartanVO baseline (`odometry/baseline_tartanvo.py`)
and the TartanVOMatcher/TartanVODepth modules could only emit random-weight
outputs. This trainer fits the three nets the baseline consumes on the
pre-generated domain-randomized worlds (scripts/gen_randomized.py):

* ``--mode flow``    PWCFlowNet   — supervised on GT optical flow at 1/4 res
                     (net regresses flow * FLOW_NORM = flow/20, the TartanVO
                     train-scale convention; modules/frontend_tartanvo.py:109
                     divides by FLOW_NORM at inference).
* ``--mode stereo``  StereoCovNet — disparity (= fx*b/depth) smooth-L1 at
                     full res + Gaussian NLL for the cov decoder on the
                     DETACHED disparity error (reference trains StereoCov the
                     same way, Train/MatchingNet/loss.py:17-34 pattern).
* ``--mode flowcov`` RAFTFlowCovNet — warm-start the wrapped ``pwc`` from the
                     flow checkpoint, FREEZE it, and fit only the recurrent
                     Gaussian branch: gamma-weighted NLL of the detached
                     flow error per GRU iteration (reference RAFTCov.py).

Eval-during-training reports holdout-world metrics AND the real TartanAir2
asset pairs (never trained on) to model/TartanVO_<mode>_metrics.csv.

    python scripts/train_tartanvo.py --mode flow   --steps 3000
    python scripts/train_tartanvo.py --mode stereo --steps 3000
    python scripts/train_tartanvo.py --mode flowcov --steps 1500 \
        --restore model/TartanVO_flow.npz
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

REAL_ASSET = "./assets/test_sequence/TartanAir2_abs_P000"
CROP_H, CROP_W = 320, 448            # /64 for the PWC pyramid + hourglass


def seq_cfgs(data_root: str, holdout: int):
    roots = sorted(p for p in Path(data_root).glob("seq_*")
                   if (p / "pose_left.txt").exists())
    assert len(roots) > holdout, f"not enough sequences under {data_root}"
    mk = lambda r: {"type": "TartanAir", "args": {
        "root": str(r), "gtFlow": True, "gtDepth": True, "gtPose": True}}
    return [mk(r) for r in roots[:-holdout]], [mk(r) for r in roots[-holdout:]]


def eval_pairs_for(cfgs, height, width, max_frames=6, stereo=False):
    from macvo_tpu.data.datasets.train import TrainPairDataset
    ds = TrainPairDataset(cfgs, transforms=[],
                          stereo_prob=1.0 if stereo else 0.0)
    rng = np.random.default_rng(3)
    out = []
    for i in range(min(max_frames, len(ds))):
        out.append(ds._assemble(np.array([i * max(1, len(ds) // max_frames)]),
                                height, width, rng))
    return out


def real_asset_cfg():
    return [{"type": "TartanAirV2", "args": {
        "root": REAL_ASSET, "compressed": True,
        "gtFlow": True, "gtDepth": True, "gtPose": True}}]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["flow", "stereo", "flowcov"], required=True)
    ap.add_argument("--data", type=str, default="data/randomized")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--holdout", type=int, default=2)
    ap.add_argument("--restore", type=str, default=None,
                    help="flowcov: PWC flow checkpoint to warm-start/freeze")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--eval-freq", type=int, default=250)
    ap.add_argument("--device", type=str, default=None, choices=["cpu", "tpu"])
    args = ap.parse_args()
    out_path = args.out or f"model/TartanVO_{args.mode}.npz"

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    from macvo_tpu.data.datasets.train import TrainPairDataset
    from macvo_tpu.models.flowformer.weights import load_params, save_params
    from macvo_tpu.models.tartanvo.network import FLOW_NORM, normalize_image
    from macvo_tpu.models.tartanvo.pwc import PWCFlowNet
    from macvo_tpu.models.tartanvo.raftcov import RAFTFlowCovNet
    from macvo_tpu.models.tartanvo.stereonet import StereoCovNet

    stereo_task = args.mode == "stereo"
    train_cfgs, hold_cfgs = seq_cfgs(args.data, args.holdout)
    ds = TrainPairDataset(
        train_cfgs,
        transforms=[{"type": "PhotometricJitter", "args": {"strength": 1.0}},
                    {"type": "AddImageNoise", "args": {"stdv": 0.0196}}],
        stereo_prob=1.0 if stereo_task else 0.0,
    )
    ev_hold = eval_pairs_for(hold_cfgs, CROP_H, CROP_W, stereo=stereo_task)
    ev_real = eval_pairs_for(real_asset_cfg(), CROP_H, CROP_W, stereo=stereo_task)
    print(f"mode={args.mode}: {len(ds)} train pairs, "
          f"{len(ev_hold)} holdout + {len(ev_real)} real eval pairs", flush=True)

    rng0 = jax.random.PRNGKey(0)
    probe = (jnp.zeros((1, CROP_H, CROP_W, 3)),) * 2

    from macvo_tpu.data.datasets.train import upcast_batch

    def clean_gt(b):
        """NaN-padded GT (occlusions, crop margins) must not poison masked
        reductions (NaN*0=NaN): zero-fill GT and fold finiteness into the
        mask before any pooling."""
        finite = jnp.all(jnp.isfinite(b["gt_flow"]), -1, keepdims=True)
        m = jnp.asarray(b["flow_mask"])
        m = m if m.dtype == jnp.bool_ else m > 0.5     # loaders may store float masks
        return jnp.nan_to_num(b["gt_flow"]), m & finite

    if args.mode == "flow":
        model = PWCFlowNet()
        params = model.init(rng0, *probe)["params"]
        trainable = None

        def forward_loss(p, b):
            b = upcast_batch(b)
            pred = model.apply({"params": p},
                               normalize_image(b["img1"]), normalize_image(b["img2"]))
            gt_flow, mask = clean_gt(b)
            # target: GT full-res pixel flow, 4x average-pooled, * FLOW_NORM
            gt4 = jax.lax.reduce_window(
                gt_flow, 0.0, jax.lax.add, (1, 4, 4, 1), (1, 4, 4, 1),
                "VALID") / 16.0
            m4 = jax.lax.reduce_window(
                mask.astype(jnp.float32), 0.0, jax.lax.add,
                (1, 4, 4, 1), (1, 4, 4, 1), "VALID") / 16.0
            valid = (m4 > 0.99) & (jnp.linalg.norm(gt4, axis=-1, keepdims=True) < 400.0)
            d = jnp.abs(pred - gt4 * FLOW_NORM)
            sl1 = jnp.where(d < 0.5, d * d, d - 0.25)
            loss = jnp.sum(sl1 * valid) / jnp.maximum(jnp.sum(valid) * 2, 1.0)
            epe = jnp.sum(jnp.linalg.norm(pred / FLOW_NORM - gt4, axis=-1,
                                          keepdims=True) * valid)
            return loss, epe / jnp.maximum(jnp.sum(valid), 1.0)

    elif args.mode == "stereo":
        model = StereoCovNet()
        params = model.init(rng0, *probe)["params"]
        trainable = None

        def forward_loss(p, b):
            b = upcast_batch(b)
            disp_pred, disp_var = model.apply(
                {"params": p}, normalize_image(b["img1"]), normalize_image(b["img2"]))
            gt_flow, mask = clean_gt(b)
            gt_disp = -gt_flow[..., 0:1]               # stereo draw: (-disp, 0)
            valid = mask & (gt_disp > 0.05) & (gt_disp < 400.0)
            d = jnp.abs(disp_pred - gt_disp) * 0.02    # normalize_factor scale
            sl1 = jnp.where(d < 0.5, d * d, d - 0.25)
            err2 = jax.lax.stop_gradient((disp_pred - gt_disp) ** 2)
            nll = err2 / jnp.maximum(disp_var, 1e-4) + jnp.log(
                jnp.maximum(disp_var, 1e-4))
            loss = (jnp.sum((sl1 + 0.05 * nll) * valid)
                    / jnp.maximum(jnp.sum(valid), 1.0))
            mae = jnp.sum(jnp.abs(disp_pred - gt_disp) * valid) / jnp.maximum(
                jnp.sum(valid), 1.0)
            return loss, mae

    else:  # flowcov
        model = RAFTFlowCovNet()
        params = model.init(rng0, *probe)["params"]
        if args.restore:
            pwc_params = load_params(args.restore, params["pwc"])
            params = dict(params) | {"pwc": pwc_params}
            print(f"warm-started pwc from {args.restore}", flush=True)
        trainable = "freeze_pwc"

        def forward_loss(p, b):
            b = upcast_batch(b)
            flow, log_sigmas = model.apply(
                {"params": p}, normalize_image(b["img1"]), normalize_image(b["img2"]))
            gt_flow, mask = clean_gt(b)
            gt4 = jax.lax.reduce_window(
                gt_flow, 0.0, jax.lax.add, (1, 4, 4, 1), (1, 4, 4, 1),
                "VALID") / 16.0
            m4 = jax.lax.reduce_window(
                mask.astype(jnp.float32), 0.0, jax.lax.add,
                (1, 4, 4, 1), (1, 4, 4, 1), "VALID") / 16.0
            valid = (m4 > 0.99) & (jnp.linalg.norm(gt4, axis=-1, keepdims=True) < 400.0)
            err2 = jax.lax.stop_gradient((flow / FLOW_NORM - gt4) ** 2)
            total, gamma, n_it = 0.0, 0.85, log_sigmas.shape[0]
            for i in range(n_it):
                var = jnp.exp(2.0 * log_sigmas[i])
                nll = err2 / jnp.maximum(var, 1e-6) + 2.0 * log_sigmas[i]
                total = total + gamma ** (n_it - 1 - i) * jnp.sum(
                    nll * valid) / jnp.maximum(jnp.sum(valid) * 2, 1.0)
            last_nll = jnp.sum(
                (err2 / jnp.maximum(jnp.exp(2 * log_sigmas[-1]), 1e-6)
                 + 2 * log_sigmas[-1]) * valid) / jnp.maximum(jnp.sum(valid) * 2, 1.0)
            return total, last_nll

    # Zero-length schedule intervals (tiny smoke runs) make optax's piecewise
    # interpolation divide by zero -> NaN lr; same guard as train/step.py.
    if args.steps >= 20:
        sched = optax.linear_onecycle_schedule(args.steps, args.lr)
    else:
        sched = args.lr
    # zero_nans BEFORE the global-norm clip: one non-finite gradient (a
    # pathological batch) otherwise makes the global norm NaN, which the clip
    # multiplies into EVERY update and the parameters never recover — the
    # observed failure on-chip was finite losses for hundreds of steps, then
    # NaN forever. With zero_nans the poisoned batch becomes a skipped step.
    opt = optax.chain(optax.zero_nans(),
                      optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, weight_decay=1e-5))
    if trainable == "freeze_pwc":
        opt = optax.multi_transform(
            {"train": opt, "frozen": optax.set_to_zero()},
            param_labels=lambda tree: {
                k: ("frozen" if k == "pwc" else "train") for k in tree})
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        (loss, metric), grads = jax.value_and_grad(
            forward_loss, has_aux=True)(params, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, metric

    @jax.jit
    def eval_one(params, batch):
        _, metric = forward_loss(params, batch)
        return metric

    def run_eval(params):
        mh = float(np.mean([jax.device_get(eval_one(params, b)) for b in ev_hold]))
        mr = float(np.mean([jax.device_get(eval_one(params, b)) for b in ev_real]))
        return mh, mr

    def to_batch(b):
        d = {k: jnp.asarray(v) for k, v in b.items()}
        if "flow_mask" not in d:
            d["flow_mask"] = jnp.ones(d["gt_flow"].shape[:-1] + (1,), bool)
        return d

    metric_name = {"flow": "epe_px", "stereo": "disp_mae_px",
                   "flowcov": "nll"}[args.mode]
    csv = Path(out_path).with_name(Path(out_path).stem + "_metrics.csv")
    csv.write_text(f"step,loss,holdout_{metric_name},real_{metric_name}\n")
    t0 = time.time()
    it = ds.batches(args.batch, CROP_H, CROP_W, seed=5)
    for i in range(args.steps):
        params, opt_state, loss, metric = step(params, opt_state, to_batch(next(it)))
        if (i + 1) % args.eval_freq == 0 or i + 1 == args.steps:
            mh, mr = run_eval(params)
            rate = (i + 1) / (time.time() - t0)
            print(f"step {i + 1}/{args.steps} loss={float(loss):.4f} "
                  f"train_{metric_name}={float(metric):.3f} "
                  f"holdout={mh:.3f} real={mr:.3f} ({rate:.2f} it/s)", flush=True)
            with csv.open("a") as f:
                f.write(f"{i + 1},{float(loss):.5f},{mh:.5f},{mr:.5f}\n")
            if np.isfinite(mh):
                save_params(out_path, params)
            else:
                print("NONFINITE eval — checkpoint NOT overwritten", flush=True)
    mh, _ = run_eval(params)
    if np.isfinite(mh):
        save_params(out_path, params)
    print(f"saved {out_path}")


if __name__ == "__main__":
    main()
