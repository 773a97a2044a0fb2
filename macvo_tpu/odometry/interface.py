"""Odometry runtime base: the receive-frames loop (reference: Odometry/Interface.py:18-89).

``receive_frames`` iterates a sequence, calls ``run(frame)`` per frame,
accumulates GT poses, and on completion converts sensor poses to body frame
(``T_BS @ pose @ T_BS^-1``), writes ``poses.npy`` (time + SE3),
``tensor_map.npz`` (serialized map) and ``ref_poses.npy`` — catching
exceptions so partial results always land on disk.
"""

from __future__ import annotations

import traceback
from typing import Callable, Generic, Iterable, Optional, TypeVar

import numpy as np

from ..data.frame import StereoFrame
from ..geometry import se3
from ..utils import timer
from ..utils.logging import Logger
from ..utils.sandbox import Sandbox
from ..worldmap import VisualMap

T_Frame = TypeVar("T_Frame", bound=StereoFrame)


class IOdometry(Generic[T_Frame]):
    def __init__(self, profile: bool = False) -> None:
        self.profile = profile
        self.gt_poses: list[np.ndarray] = []
        self.terminated = False

    def run(self, frame: T_Frame) -> None:
        raise NotImplementedError

    def get_map(self) -> VisualMap:
        raise NotImplementedError

    def terminate(self) -> None:
        self.terminated = True

    def receive_frames(
        self,
        sequence: Iterable[T_Frame],
        saveto: Optional[Sandbox] = None,
        on_frame_finished: Optional[Callable[[T_Frame, "IOdometry"], None]] = None,
    ) -> None:
        try:
            for i, frame in enumerate(sequence):
                if self.profile and i == 2:
                    with timer.trace(saveto.path("trace") if saveto else "/tmp/macvo_trace"):
                        self.run(frame)
                else:
                    self.run(frame)
                if frame.gt_pose is not None:
                    self.gt_poses.append(np.asarray(frame.gt_pose).reshape(7))
                if on_frame_finished is not None:
                    on_frame_finished(frame, self)
        except Exception as exc:  # always terminate + persist partial results
            Logger.error(f"Odometry failed: {exc}\n{traceback.format_exc()}")
        finally:
            self.terminate()
            if saveto is not None:
                self.save_results(saveto)

    def save_results(self, saveto: Sandbox) -> None:
        graph = self.get_map()
        frames = graph.frames
        n = len(frames)
        if n > 0:
            poses = frames.data["pose"].astype(np.float64)
            T_BS = frames.data["T_BS"].astype(np.float64)
            # Sensor -> body frame: T_BS @ pose @ T_BS^-1 (reference: Interface.py:47-50)
            body = np.asarray(
                se3.mul(se3.mul(T_BS, poses), se3.inv(T_BS)), dtype=np.float64
            )
            time_s = frames.data["time_ns"].astype(np.float64)[:, None] / 1e9
            np.save(saveto.path("poses.npy"), np.concatenate([time_s, body], axis=1))
            # Lost-track status per frame — consumed by the plotting suite's
            # lost-track markers (reference: Trajectory.from_sandbox:91-121).
            np.save(saveto.path("need_interp.npy"), frames.data["need_interp"][:n])
            graph.save(saveto.path("tensor_map.npz"))
        if self.gt_poses:
            gt = np.stack(self.gt_poses).astype(np.float64)
            time_s = frames.data["time_ns"].astype(np.float64)[: gt.shape[0], None] / 1e9
            np.save(saveto.path("ref_poses.npy"), np.concatenate([time_s, gt], axis=1))
