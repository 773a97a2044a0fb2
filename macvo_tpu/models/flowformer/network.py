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


class FlowFormerCov(nn.Module):
    """images (B,H,W,3) in [0,1] -> dict with flow/cov prediction stacks."""

    cfg: FlowFormerConfig = FlowFormerConfig()

    @nn.compact
    def __call__(self, image1: jnp.ndarray, image2: jnp.ndarray):
        cfg = self.cfg
        enc_dt = _dtype(cfg.encoder_dtype)
        dec_dt = _dtype(cfg.decoder_dtype)

        image1 = (2.0 * image1 - 1.0).astype(enc_dt)
        image2 = (2.0 * image2 - 1.0).astype(enc_dt)

        context = TwinsSVT(name="context_encoder")(image1)

        # One fnet pass over the doubled batch instead of two half-size passes
        # (fewer launches, better MXU utilization at small spatial sizes).
        fnet = TwinsSVT(name="feature_encoder")
        feats = fnet(jnp.concatenate([image1, image2], axis=0))
        feat1, feat2 = jnp.split(feats, 2, axis=0)

        cost_memory, cost_maps = MemoryEncoder(
            cost_latent_input_dim=cfg.cost_latent_input_dim,
            cost_latent_token_num=cfg.cost_latent_token_num,
            cost_latent_dim=cfg.cost_latent_dim,
            encoder_depth=cfg.encoder_depth,
            patch_size=cfg.patch_size,
            vert_c_dim=cfg.vert_c_dim,
            name="memory_encoder",
        )(feat1, feat2, context.astype(enc_dt))

        # Decoder consumes fp32 cost maps / context (flownet.py:25-28).
        cost_maps = cost_maps.astype(jnp.float32)
        context = context.astype(jnp.float32)

        return MemoryCovDecoder(
            decoder_depth=cfg.decoder_depth,
            query_latent_dim=cfg.query_latent_dim,
            cost_latent_dim=cfg.cost_latent_dim,
            dtype=dec_dt,
            inference_only=cfg.inference_only,
            name="memory_decoder",
        )(cost_memory, context, cost_maps)


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
