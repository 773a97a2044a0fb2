"""Cov-head training runner (reference: Train/MatchingNet/train_flowformer.py).

Usage:
    python -m macvo_tpu.train.run --config configs/train/FlowFormerCov.yaml \
        [--steps N] [--out model/FlowFormerCov.npz] [--restore ckpt.npz]

Data-parallel over all available devices (mesh axis ``data``); batches are
consecutive-frame pairs drawn from the configured sequence (the reference's
``TrainDataset`` pair sampling, DataLoader/Dataset/Train.py:10-56). Autosaves
every ``autosave_freq`` steps (train_flowformer.py:119-127).
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import numpy as np


def make_pair_batches(seq, batch_size: int, height: int, width: int, rng: np.random.Generator):
    """Yield dict batches of consecutive-frame training pairs (center-cropped
    to a fixed size so one jit serves all samples)."""
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
        batch = {
            "img1": np.concatenate(img1, 0),
            "img2": np.concatenate(img2, 0),
            "gt_flow": np.concatenate(gt_flow, 0),
        }
        if mask:
            batch["flow_mask"] = np.concatenate(mask, 0)
        yield batch


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--steps", type=int, default=None, help="override num_steps")
    parser.add_argument("--out", type=str, default="model/FlowFormerCov.npz")
    parser.add_argument("--restore", type=str, default=None)
    parser.add_argument("--log_freq", type=int, default=100)
    args = parser.parse_args()

    from ..data import SequenceBase
    from ..models.flowformer import FlowFormerConfig, FlowFormerCov
    from ..models.flowformer.weights import load_params, save_params
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
        training_mode=str(cfg.Train.training_mode),
    )
    model = FlowFormerCov(FlowFormerConfig(
        decoder_depth=int(cfg.Model.decoder_depth),
        encoder_dtype=str(cfg.Model.encoder_dtype),
        decoder_dtype=str(cfg.Model.decoder_dtype),
    ))

    mesh = make_mesh()
    n_dev = mesh.shape["data"]
    batch_size = int(cfg.Train.batch_size)
    if batch_size % n_dev != 0:
        batch_size = max(n_dev, (batch_size // n_dev) * n_dev)
        Logger.warning(f"batch_size rounded to {batch_size} for {n_dev} devices")

    h, w = int(cfg.Train.image_height), int(cfg.Train.image_width)
    state, opt = create_train_state(
        model, tcfg, jax.random.PRNGKey(int(getattr(cfg.Train, "seed", 0))),
        sample_shape=(1, h, w, 3),
    )
    if args.restore:
        state = TrainState(
            params=load_params(args.restore, state.params),
            opt_state=state.opt_state, step=state.step,
        )
    step_fn = make_sharded_train_step(model, opt, tcfg, mesh)

    seq = SequenceBase.from_config(cfg.Data.Sequence)
    rng = np.random.default_rng(int(getattr(cfg.Train, "seed", 0)))
    batches = make_pair_batches(seq, batch_size, h, w, rng)

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    autosave = int(getattr(cfg.Train, "autosave_freq", 5000))

    Logger.info(f"Training {tcfg.num_steps} steps, batch {batch_size} on {n_dev} devices")
    t0 = time.time()
    with mesh:
        for i, batch in enumerate(batches):
            if i >= tcfg.num_steps:
                break
            state, aux = step_fn(state, batch)
            if (i + 1) % args.log_freq == 0:
                loss = float(aux["loss"])
                rate = (i + 1) / (time.time() - t0)
                Logger.info(f"step {i + 1}/{tcfg.num_steps} loss={loss:.4f} ({rate:.2f} it/s)")
            if (i + 1) % autosave == 0:
                save_params(out_path, state.params)
                Logger.info(f"autosaved -> {out_path}")
    save_params(out_path, state.params)
    Logger.info(f"final checkpoint -> {out_path}")


if __name__ == "__main__":
    main()
