"""Stereo disparity network with covariance decoder (flax, channel-last).

Capability-equivalent rebuild of the reference StereoNet7 + HourglassDecoder
pair (Module/Network/StereoCov/{StereoNet,decoder}.py, consumed as
``StereoCovNet`` at network.py:49-82): a shared-weight siamese feature
extractor at 1/2 resolution, an hourglass encoder with skip connections down
to 1/64, and TWO decoders sharing the encoder context — one regressing
disparity at full resolution, one regressing disparity variance. Disparity is
scaled by ``1/normalize_factor`` (0.02) as in StereoFeature (network.py:47).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def _relu(x):
    return nn.relu(x)


class ResBlock(nn.Module):
    dim: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = _relu(nn.Conv(self.dim, (3, 3), strides=(self.stride, self.stride),
                          padding="SAME", name="conv1")(x))
        y = nn.Conv(self.dim, (3, 3), padding="SAME", name="conv2")(y)
        if x.shape[-1] != self.dim or self.stride != 1:
            x = nn.Conv(self.dim, (1, 1), strides=(self.stride, self.stride),
                        name="short")(x)
        return _relu(x + y)


class SiameseFeature(nn.Module):
    """Per-image feature extractor at 1/2 resolution, 64 channels."""

    @nn.compact
    def __call__(self, img):
        x = _relu(nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME", name="stem")(img))
        x = ResBlock(32, name="res1")(x)
        x = ResBlock(48, name="res2")(x)
        x = ResBlock(64, name="res3")(x)
        return x


class HourglassEncoder(nn.Module):
    """1/2 -> 1/64 encoder, returns bottleneck + skip features."""

    @nn.compact
    def __call__(self, x):
        skips = []
        dims = (64, 128, 192, 256, 384)
        for i, dim in enumerate(dims):
            x = ResBlock(dim, name=f"enc{i}a")(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _relu(nn.Conv(512, (3, 3), padding="SAME", name="bottleneck")(x))
        return x, skips


class HourglassDecoder(nn.Module):
    """Bottleneck + skips -> full-res 1-channel map (reference: decoder.py:8-67)."""

    out_channels: int = 1
    final_softplus: bool = False

    @nn.compact
    def __call__(self, x, skips):
        dims = (320, 192, 128, 64, 64)
        for i, dim in enumerate(dims):
            x = _relu(nn.ConvTranspose(dim, (4, 4), strides=(2, 2), padding="SAME",
                                       name=f"dec{i}")(x))
            skip = skips[-(i + 1)]
            x = jnp.concatenate([x, skip], axis=-1)
        # 1/2 -> 1/1
        x = _relu(nn.ConvTranspose(64, (4, 4), strides=(2, 2), padding="SAME",
                                   name="dec_full")(x))
        x = _relu(nn.Conv(16, (1, 1), name="head1")(x))
        out = nn.Conv(self.out_channels, (1, 1), name="head2")(x)
        if self.final_softplus:
            out = nn.softplus(out)
        return out


class StereoCovNet(nn.Module):
    """(imgL, imgR) -> (disparity (B,H,W,1), disparity variance (B,H,W,1)).

    The cov decoder mirrors the reference HourglassDecoder consuming the
    shared hourglass context (StereoCov/network.py:57-61); softplus keeps the
    variance positive.
    """

    normalize_factor: float = 0.02

    @nn.compact
    def __call__(self, img_l, img_r):
        feat = SiameseFeature(name="feature")
        f_l = feat(img_l)
        f_r = feat(img_r)
        # 1/2-res image context concat (reference StereoNet7.forward cats x2).
        img_ds = nn.avg_pool(jnp.concatenate([img_l, img_r], axis=-1),
                             (2, 2), strides=(2, 2))
        x = jnp.concatenate([f_l, f_r, img_ds], axis=-1)
        x = _relu(nn.Conv(64, (3, 3), padding="SAME", name="fuse")(x))

        bottleneck, skips = HourglassEncoder(name="encoder")(x)
        disparity = HourglassDecoder(1, final_softplus=True, name="disp_decoder")(
            bottleneck, skips
        ) / self.normalize_factor
        disparity_cov = HourglassDecoder(1, final_softplus=True, name="cov_decoder")(
            bottleneck, skips
        )
        return disparity, disparity_cov
