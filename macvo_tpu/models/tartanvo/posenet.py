"""VOFlowRes pose-regression head (flax, channel-last).

Capability-equivalent rebuild of the reference posenet
(Module/Network/TartanVOStereo/FlowPoseNet.py:45-165, config 1): ResNet
backbone over the (flow, normalized inverse depth, intrinsic-layer) stack at
112x160, separate translation / rotation FC heads producing a 6-d se3 output
scaled by ``pose_norm`` downstream (StereoVO_Interface.py:51-53).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    dim: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.relu(nn.Conv(self.dim, (3, 3), strides=(self.stride, self.stride),
                            padding="SAME", name="conv1")(x))
        y = nn.Conv(self.dim, (3, 3), padding="SAME", name="conv2")(y)
        if x.shape[-1] != self.dim or self.stride != 1:
            x = nn.Conv(self.dim, (1, 1), strides=(self.stride, self.stride),
                        name="down")(x)
        return nn.relu(x + y)


class VOFlowRes(nn.Module):
    """(B,H,W,C) motion stack -> (B,6) [trans(3), rot(3)] se3."""

    blocknums: Sequence[int] = (2, 2, 3, 4, 6, 7, 3)
    outputnums: Sequence[int] = (32, 64, 64, 128, 128, 256, 256)

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME", name="stem1")(x))
        x = nn.relu(nn.Conv(32, (3, 3), padding="SAME", name="stem2")(x))
        x = nn.relu(nn.Conv(32, (3, 3), padding="SAME", name="stem3")(x))
        for stage, (blocks, dim) in enumerate(zip(self.blocknums, self.outputnums)):
            for blk in range(blocks):
                x = BasicBlock(dim, stride=2 if blk == 0 else 1,
                               name=f"stage{stage}_blk{blk}")(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, C)

        def head(name):
            h = nn.relu(nn.Dense(128, name=f"{name}_fc1")(x))
            h = nn.relu(nn.Dense(32, name=f"{name}_fc2")(h))
            return nn.Dense(3, name=f"{name}_fc3")(h)

        return jnp.concatenate([head("trans"), head("rot")], axis=-1)
