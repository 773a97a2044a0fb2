"""Keyframe selectors (reference: Module/KeyframeSelector.py:9-39)."""

from __future__ import annotations

from types import SimpleNamespace

from ..data.frame import StereoFrame
from ..utils.registry import RegisteredConfigTestable


class IKeyframeSelector(RegisteredConfigTestable, register=False):
    def __init__(self, config: SimpleNamespace) -> None:
        self.config = config

    def is_keyframe(self, frame: StereoFrame) -> bool:
        raise NotImplementedError


class AllKeyframe(IKeyframeSelector):
    def is_keyframe(self, frame: StereoFrame) -> bool:
        return True

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {})


class UniformKeyframe(IKeyframeSelector):
    """Every k-th frame is a keyframe; the rest are interpolated at the end."""

    def is_keyframe(self, frame: StereoFrame) -> bool:
        return (frame.frame_idx % self.config.keyframe_freq) == 0

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {
            "keyframe_freq": lambda f: isinstance(f, int) and f >= 1,
        })
