"""Multi-sequence training dataset: pair sampling over a dataset mixture
(reference: DataLoader/Dataset/Train.py:10-56 — ``TrainDataset`` +
``mp_instantiation`` + ConcatDataset; train transforms applied per sample,
Train/MatchingNet/train_flowformer.py:150-167).

TPU-first shape: instead of torch DataLoader workers, batches are assembled
host-side by a thread pool (the reference's preload-executor pattern,
SequenceBase.py:78-95) with fixed (H, W) crops so ONE jitted train step
serves every sample, and a one-deep prefetch overlaps assembly with the
device step.
"""

from __future__ import annotations

import concurrent.futures as futures
from types import SimpleNamespace
from typing import Iterator, Optional, Sequence

import numpy as np

from ...utils.logging import Logger
from ..sequence import SequenceBase
from ..transform import IDataTransform


def _quantize_img(a: np.ndarray) -> np.ndarray:
    """float [0,1] image -> uint8 for cheap host->device transfer (the
    sources are 8-bit pngs, so this is lossless up to the additive train
    noise, which is ~1.3 LSB and survives quantization)."""
    if a.dtype == np.uint8:
        return a
    return np.clip(a * 255.0, 0.0, 255.0).round().astype(np.uint8)


def upcast_batch(batch: dict) -> dict:
    """Device-side inverse of the compressed shipping: uint8 images ->
    f32 [0,1], f16 flow -> f32. Jit-traceable; f32 inputs pass through, so
    uncompressed batches (tests, user code) still work."""
    import jax.numpy as jnp

    b = dict(batch)
    for k in ("img1", "img2"):
        if k in b and b[k].dtype == jnp.uint8:
            b[k] = b[k].astype(jnp.float32) / 255.0
    if "gt_flow" in b and b["gt_flow"].dtype != jnp.float32:
        b["gt_flow"] = b["gt_flow"].astype(jnp.float32)
    return b


def _to_ns_list(cfgs) -> list:
    out = []
    for c in cfgs:
        if isinstance(c, dict):
            c = SimpleNamespace(**c)
        out.append(c)
    return out


class TrainPairDataset:
    """Mixture of sequences yielding consecutive-frame training pairs.

    ``configs``: list of ``{type, args}`` sequence specs (the multi-sequence
    yaml of the reference). Sequences are instantiated concurrently
    (reference ``mp_instantiation`` — threads here: instantiation is
    I/O-bound directory scanning). ``transforms``: list of ``{type, args}``
    transform specs applied to every frame at sample time (train-time
    noise/crop/cast).
    """

    def __init__(self, configs: Sequence, transforms: Sequence | None = None,
                 stereo_prob: float = 0.0) -> None:
        # With probability ``stereo_prob`` a drawn sample is the STEREO pair
        # (imageL, imageR) with gt_flow = (-disparity, 0) derived from
        # gt_depth — the same network serves both the temporal-flow and the
        # stereo-disparity pass in the VO frontend (Frontend.py:218-232), so
        # the disparity task is trained explicitly rather than hoped-for by
        # generalization from temporal pairs.
        self.stereo_prob = float(stereo_prob)
        configs = _to_ns_list(configs)
        with futures.ThreadPoolExecutor(max_workers=max(1, len(configs))) as ex:
            self.sequences: list[SequenceBase] = list(
                ex.map(lambda c: SequenceBase.instantiate(c.type, c.args), configs)
            )
        self.transforms: list[IDataTransform] = [
            IDataTransform.instantiate(t.type, t.args)
            for t in _to_ns_list(transforms or [])
        ]
        # Global pair index: (sequence_id, local_frame) for every consecutive
        # pair in every sequence.
        self._pairs: list[tuple[int, int]] = []
        for si, seq in enumerate(self.sequences):
            for fi in range(len(seq) - 1):
                self._pairs.append((si, fi))
        if not self._pairs:
            raise ValueError("TrainPairDataset: no frame pairs in any sequence")
        Logger.info(
            f"TrainPairDataset: {len(self.sequences)} sequences, {len(self._pairs)} pairs"
        )

    def __len__(self) -> int:
        return len(self._pairs)

    def get_pair(self, index: int):
        si, fi = self._pairs[index]
        seq = self.sequences[si]
        f0, f1 = seq[fi], seq[fi + 1]
        for t in self.transforms:
            f0, f1 = t(f0), t(f1)
        return f0, f1

    # -- batch assembly ------------------------------------------------------
    def _assemble(self, idx: np.ndarray, height: int, width: int,
                  rng: np.random.Generator) -> dict[str, np.ndarray]:
        img1, img2, gt_flow, mask = [], [], [], []
        for i in idx:
            f0, f1 = self.get_pair(int(i))
            s = f0.stereo
            stereo = self.stereo_prob > 0 and rng.random() < self.stereo_prob \
                and s.gt_depth is not None
            assert stereo or s.gt_flow is not None, "training needs gt_flow"
            # Random crop (train-time augmentation; the reference center-crops
            # then scales — random crops see more of the image over an epoch).
            h0 = rng.integers(0, max(1, s.height - height))
            w0 = rng.integers(0, max(1, s.width - width))
            sl = (slice(None), slice(h0, h0 + height), slice(w0, w0 + width))
            img1.append(np.asarray(s.imageL)[sl])
            if stereo:
                # Right camera sits at +baseline along +u: a point at depth d
                # moves u -> u - fx*b/d (geometry/camera.py disparity model).
                img2.append(np.asarray(s.imageR)[sl])
                disp = float(s.fx) * float(s.frame_baseline) / np.maximum(
                    np.asarray(s.gt_depth)[sl], 1e-6)
                gt_flow.append(np.concatenate([-disp, np.zeros_like(disp)], -1))
                mask.append(np.isfinite(disp))
            else:
                img2.append(np.asarray(f1.stereo.imageL)[sl])
                gt_flow.append(np.asarray(s.gt_flow)[sl])
                mask.append(np.ones(gt_flow[-1].shape[:-1] + (1,), bool)
                            if s.flow_mask is None else np.asarray(s.flow_mask)[sl])
        # Ship the batch COMPRESSED (uint8 images, f16 flow): on a
        # remote-attached TPU the per-step H2D transfer is on the training
        # critical path, and this cuts the bytes ~3x. `upcast_batch` (consumed
        # inside the jitted train step) restores f32 on device, where the
        # cast fuses with the first op for free.
        # Clip to an f16-safe magnitude before the compressed cast: a
        # near-zero gt_depth makes the synthetic disparity larger than
        # f16 max (65504) and the cast overflowed to inf with a
        # RuntimeWarning. 1e4 is 25x the loss's max_flow cutoff (400), so
        # every clipped pixel was already excluded from the loss — this
        # only keeps the shipped batch finite.
        batch = {
            "img1": _quantize_img(np.concatenate(img1, 0)),
            "img2": _quantize_img(np.concatenate(img2, 0)),
            "gt_flow": np.clip(np.concatenate(gt_flow, 0), -1e4, 1e4).astype(np.float16),
        }
        if mask:
            batch["flow_mask"] = np.concatenate(mask, 0)
        return batch

    def batches(self, batch_size: int, height: int, width: int,
                seed: int = 0) -> Iterator[dict[str, np.ndarray]]:
        """Infinite uniform-over-pairs batch stream with one-deep threaded
        prefetch (host assembly overlaps the device step)."""
        rng = np.random.default_rng(seed)
        pool = futures.ThreadPoolExecutor(max_workers=1)

        def draw():
            idx = rng.integers(0, len(self._pairs), size=batch_size)
            return self._assemble(idx, height, width, rng)

        pending = pool.submit(draw)
        try:
            while True:
                batch = pending.result()
                pending = pool.submit(draw)
                yield batch
        finally:
            pool.shutdown(wait=False, cancel_futures=True)


def make_eval_pairs(seq: SequenceBase, height: int, width: int,
                    max_frames: int = 8) -> list[dict[str, np.ndarray]]:
    """Deterministic center-cropped pairs from a held-out sequence for
    eval-during-training (reference: Train/MatchingNet/evaluate.py)."""
    out = []
    n = min(max_frames, len(seq) - 1)
    for i in range(n):
        f0, f1 = seq[i], seq[i + 1]
        s = f0.stereo
        if s.gt_flow is None:
            continue
        h0 = max(0, (s.height - height) // 2)
        w0 = max(0, (s.width - width) // 2)
        sl = (slice(None), slice(h0, h0 + height), slice(w0, w0 + width))
        d = {
            "img1": _quantize_img(np.asarray(s.imageL)[sl]),
            "img2": _quantize_img(np.asarray(f1.stereo.imageL)[sl]),
            "gt_flow": np.asarray(s.gt_flow)[sl].astype(np.float32),
        }
        if s.flow_mask is not None:
            d["flow_mask"] = np.asarray(s.flow_mask)[sl]
        out.append(d)
        if s.gt_depth is not None:
            # Stereo pair with disparity GT: the VO frontend runs the same
            # network on (imageL, imageR), so eval tracks that task too.
            disp = float(s.fx) * float(s.frame_baseline) / np.maximum(
                np.asarray(s.gt_depth)[sl], 1e-6)
            out.append({
                "img1": d["img1"],
                "img2": _quantize_img(np.asarray(s.imageR)[sl]),
                "gt_flow": np.concatenate(
                    [-disp, np.zeros_like(disp)], -1).astype(np.float32),
                "flow_mask": np.isfinite(disp),
            })
    return out
