"""TartanVO baseline odometry (reference: Odometry/BaselineTartanVO.py:12-81).

Pure learned odometry, no backend optimization: per keyframe, optical flow
(t-1 -> t) + stereo depth feed the TartanVO pose network whose se3 output is
chained onto the previous pose. Non-keyframes copy the previous pose with
``need_interp`` set.
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Optional

import numpy as np

from ..modules.frontend import IMatcher, IStereoDepth
from ..modules.frontend_tartanvo import TartanMotionNet
from ..modules.keyframe import IKeyframeSelector
from ..utils.registry import ConfigTestable
from ..worldmap import VisualMap
from .interface import IOdometry
from .macvo import MACVO


class TartanVO(IOdometry, ConfigTestable):
    def __init__(
        self,
        match_estimator: IMatcher,
        depth_estimator: IStereoDepth,
        kf_selector: IKeyframeSelector,
        tvo_cfg: SimpleNamespace,
    ) -> None:
        super().__init__()
        self.graph = VisualMap()
        self.tartanvo = TartanMotionNet(tvo_cfg)
        self.match_estimator = match_estimator
        self.depth_estimator = depth_estimator
        self.keyframe_select = kf_selector
        self.prev_frame = None

    @classmethod
    def from_config(cls, cfg: SimpleNamespace) -> "TartanVO":
        odomcfg = cfg.Odometry
        return cls(
            match_estimator=IMatcher.instantiate(odomcfg.match.type, odomcfg.match.args),
            depth_estimator=IStereoDepth.instantiate(odomcfg.depth.type, odomcfg.depth.args),
            kf_selector=IKeyframeSelector.instantiate(odomcfg.keyframe.type, odomcfg.keyframe.args),
            tvo_cfg=odomcfg.tartanvo.args,
        )

    def _push(self, frame, pose: np.ndarray, need_interp: bool) -> None:
        self.graph.frames.push({
            "K": np.asarray(frame.stereo.K, dtype=np.float32).reshape(1, 3, 3),
            "baseline": np.asarray(frame.stereo.baseline, np.float32).reshape(1)[:1],
            "need_interp": np.array([need_interp]),
            "time_ns": np.asarray(frame.stereo.time_ns).reshape(1)[:1].astype(np.int64),
            "pose": np.asarray(pose, dtype=np.float32).reshape(1, 7),
            "T_BS": np.asarray(frame.stereo.T_BS, np.float32).reshape(1, 7),
        })

    def run(self, frame) -> None:
        if not self.keyframe_select.is_keyframe(frame):
            prev_pose = self.graph.frames.data["pose"][-1]
            self._push(frame, prev_pose, need_interp=True)
            return

        flow_map = None
        if self.prev_frame is not None:
            flow_map = self.match_estimator.estimate(
                self.prev_frame.stereo, frame.stereo
            ).flow
        est_depth = self.depth_estimator.estimate(frame.stereo)
        est_pose = np.asarray(self.tartanvo.predict(frame, flow_map, est_depth.depth))
        self._push(frame, est_pose, need_interp=False)
        self.tartanvo.update(est_pose)
        self.prev_frame = frame

    def get_map(self) -> VisualMap:
        return self.graph

    @classmethod
    def is_valid_config(cls, config: SimpleNamespace) -> None:
        assert config is not None
        IMatcher.is_valid_config(config.match)
        IStereoDepth.is_valid_config(config.depth)
        IKeyframeSelector.is_valid_config(config.keyframe)
        TartanMotionNet.is_valid_config(config.tartanvo.args)
