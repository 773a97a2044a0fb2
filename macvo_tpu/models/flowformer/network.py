"""FlowFormerCov: joint optical-flow + covariance transformer network.

Top-level assembly (reference: Module/Network/FlowFormerCov/flownet.py:9-53):
images are normalized to [-1, 1], the context encoder (Twins-SVT) encodes
image1, the memory encoder builds the latent cost volume, and the recurrent
cov decoder produces per-iteration flow and log-sigma maps. ``inference``
pads H/W to multiples of 8, unpads, and returns ``(flow, exp(2*log_sigma))``
— the head regresses log-sigma (flownet.py:37-44).

Mixed-precision policy mirrors the reference's Fast mode (enc fp16/dec bf16,
Config/Experiment/MACVO/MACVO_Fast.yaml:8-11): on TPU both use bfloat16;
cost maps and context are cast back to fp32 before the decoder
(flownet.py:25-28), and the fp32 islands live in decoder.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .decoder import MemoryCovDecoder
from .encoder import MemoryEncoder
from .twins import TwinsSVT


@dataclasses.dataclass(frozen=True)
class FlowFormerConfig:
    """latentcostformer hyperparameters, pinned in-tree
    (Config/Train/FlowFormerCovKITTIthings.yaml:17-56)."""

    encoder_latent_dim: int = 256
    query_latent_dim: int = 64
    cost_latent_input_dim: int = 64
    cost_latent_token_num: int = 8
    cost_latent_dim: int = 128
    cost_heads_num: int = 1
    encoder_depth: int = 3
    patch_size: int = 8
    vert_c_dim: int = 64
    decoder_depth: int = 12
    gamma: float = 0.85          # training loss decay
    max_flow: float = 400.0

    # TPU dtype policy ("fp32" | "bf16")
    encoder_dtype: str = "fp32"
    decoder_dtype: str = "fp32"
    # Inference mode: skip the per-iteration upsample stacks (training needs
    # them for the gamma-weighted sequence loss; odometry consumes only the
    # final prediction).
    inference_only: bool = False


def _dtype(name: str):
    return {"fp32": jnp.float32, "bf16": jnp.bfloat16, "fp16": jnp.bfloat16}[name]


def _tracing_on_tpu() -> bool:
    """True when the computation being traced will run on a TPU.

    ``jax.default_device(...)`` overrides the backend for everything traced
    under it (a CPU A/B leg inside a TPU process — scripts/
    diagnose_platform_gap.py); the plain backend default applies otherwise.
    """
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform == "tpu"
    return jax.default_backend() == "tpu"


class FlowFormerCov(nn.Module):
    """images (B,H,W,3) in [0,1] -> dict with flow/cov prediction stacks.

    Exposes the encoder stages as separate methods (``features`` /
    ``context`` / ``decode``) so the VO frontend can CACHE the previous
    frame's Twins features on device: in the odometry loop frame t's left
    image is re-encoded at t+1 as the flow-pair source, and the stereo/flow
    pairs share the current left features — re-using both halves the
    encoder work per frame with bit-identical results (the reference
    re-runs the full fnet/cnet batch every frame, flownet.py:20-31)."""

    cfg: FlowFormerConfig = FlowFormerConfig()

    def setup(self):
        cfg = self.cfg
        enc_dt = _dtype(cfg.encoder_dtype)
        self.context_encoder = TwinsSVT(dtype=enc_dt)
        self.feature_encoder = TwinsSVT(dtype=enc_dt)
        self.memory_encoder = MemoryEncoder(
            cost_latent_input_dim=cfg.cost_latent_input_dim,
            cost_latent_token_num=cfg.cost_latent_token_num,
            cost_latent_dim=cfg.cost_latent_dim,
            encoder_depth=cfg.encoder_depth,
            patch_size=cfg.patch_size,
            vert_c_dim=cfg.vert_c_dim,
            dtype=enc_dt,
            # Fused Pallas input stage: inference-path only (training needs
            # gradients through the plain XLA formulation), bf16 only — it is
            # a throughput-path bandwidth optimization, and at f32 XLA's
            # buffer assignment sporadically scopes the chunk operand/result
            # buffers into the 16 MB VMEM budget and fails the compile
            # (observed at 24.9-29.6 M under precision=HIGHEST fusions). The
            # fp32 accuracy path takes the exact XLA twin instead — same
            # folded-weight math, parity pinned by tests/test_tpu.py.
            fused_input=(cfg.inference_only and _tracing_on_tpu()
                         and enc_dt == jnp.bfloat16),
        )
        self.memory_decoder = MemoryCovDecoder(
            decoder_depth=cfg.decoder_depth,
            query_latent_dim=cfg.query_latent_dim,
            cost_latent_dim=cfg.cost_latent_dim,
            dtype=_dtype(cfg.decoder_dtype),
            inference_only=cfg.inference_only,
        )

    def _normalize(self, images: jnp.ndarray) -> jnp.ndarray:
        return (2.0 * images - 1.0).astype(_dtype(self.cfg.encoder_dtype))

    def features(self, images: jnp.ndarray) -> jnp.ndarray:
        """fnet features of [0,1] images (B,H,W,3) -> (B,H/8,W/8,256)."""
        return self.feature_encoder(self._normalize(images))

    def context(self, images: jnp.ndarray) -> jnp.ndarray:
        """cnet context of [0,1] images (B,H,W,3) -> (B,H/8,W/8,256)."""
        return self.context_encoder(self._normalize(images))

    def decode(self, feat1: jnp.ndarray, feat2: jnp.ndarray, context: jnp.ndarray):
        """Latent cost volume + recurrent decoder on precomputed features."""
        enc_dt = _dtype(self.cfg.encoder_dtype)
        cost_memory, cost_maps = self.memory_encoder(
            feat1, feat2, context.astype(enc_dt)
        )
        # Decoder consumes fp32 context (flownet.py:25-28). Cost maps keep
        # their NATIVE dtype: the decoder samples them with f32 accumulation
        # (decoder.py encode_flow_token), and in bf16 mode an fp32 copy would
        # double the dominant per-iteration HBM read of the whole recurrent
        # loop (327 MB at 640x640) while adding no information — the values
        # were computed in bf16 upstream.
        return self.memory_decoder(
            cost_memory, context.astype(jnp.float32), cost_maps
        )

    def __call__(self, image1: jnp.ndarray, image2: jnp.ndarray):
        context = self.context(image1)
        # One fnet pass over the doubled batch instead of two half-size passes
        # (fewer launches, better MXU utilization at small spatial sizes).
        feats = self.features(jnp.concatenate([image1, image2], axis=0))
        feat1, feat2 = jnp.split(feats, 2, axis=0)
        return self.decode(feat1, feat2, context)


class InputPadder:
    """Pad H,W to multiples of ``factor`` (reference: core.utils.InputPadder,
    spec SURVEY.md §2.9). Channel-last (B,H,W,C)."""

    def __init__(self, shape, factor: int = 8) -> None:
        self.h, self.w = shape[1], shape[2]
        pad_h = (-self.h) % factor
        pad_w = (-self.w) % factor
        # Symmetric-ish padding: top/bottom split like the reference.
        self._pad = (pad_h // 2, pad_h - pad_h // 2, pad_w // 2, pad_w - pad_w // 2)

    def pad(self, *images):
        t, btm, l, r = self._pad
        out = [
            jnp.pad(im, ((0, 0), (t, btm), (l, r), (0, 0)), mode="edge") for im in images
        ]
        return out if len(out) > 1 else out[0]

    def unpad(self, x):
        t, _, l, _ = self._pad
        return x[:, t : t + self.h, l : l + self.w]


def normalize_cov(log_sigma: jnp.ndarray) -> jnp.ndarray:
    """Head regresses log-sigma; variance = exp(2 * log_sigma)
    (flownet.py:44)."""
    return jnp.exp(2.0 * log_sigma)


def make_inference_fn(model: FlowFormerCov):
    """Returns a jittable ``fn(params, image1, image2) -> (flow, cov)`` on
    padded inputs. Padding/unpadding happens outside jit (static shapes)."""

    def fn(params, image1, image2):
        out = model.apply({"params": params}, image1, image2)
        return out["flow_final"], normalize_cov(out["cov_final"])

    return fn
