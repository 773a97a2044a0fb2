"""Multi-device tests on the 8-device CPU mesh: sharded BA equivalence,
batched multi-sequence odometry, data-parallel train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macvo_tpu.parallel import make_mesh, make_sharded_solver
from macvo_tpu.backend.solver import solve_two_frame
from macvo_tpu.geometry import se3


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_ba_matches_single_device():
    """Observation-sharded LM (psum'd normal equations) must reproduce the
    single-device solve bit-for-bit-ish."""
    from tests.test_solver import make_problem

    data, true_pose = make_problem(n=64)
    single = solve_two_frame(data, graph_type="icp")

    mesh = make_mesh((8,), ("obs",))
    solve = make_sharded_solver(mesh, graph_type="icp")
    sharded = solve(data)

    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-8)
    err = float(jnp.linalg.norm(se3.log(se3.mul(se3.inv(true_pose), sharded))))
    assert err < 1e-5


def test_sharded_ba_uneven_padding():
    from tests.test_solver import make_problem

    data, _ = make_problem(n=37)  # not divisible by 8 -> exercises pad path
    mesh = make_mesh((8,), ("obs",))
    solve = make_sharded_solver(mesh, graph_type="disp")
    single = solve_two_frame(data, graph_type="disp")
    np.testing.assert_allclose(np.asarray(solve(data)), np.asarray(single), atol=1e-8)


def test_batched_odometry_multi_sequence():
    """4 synthetic sequences, one sharded frontend: each trajectory must stay
    within the E2E accuracy bound. (GT modules can't batch through the network
    path, so this drives the real FlowFormerCov with random weights only for
    the *machinery*; accuracy is asserted via the GT-composed variant below.)"""
    from macvo_tpu.data.datasets.synthetic import SyntheticStereo
    from macvo_tpu.parallel import BatchedOdometry
    from macvo_tpu.utils.config import build_dynamic_config
    from macvo_tpu.evaluation import evaluate_all

    mesh = make_mesh((4,), ("data",))
    cfg, _ = build_dynamic_config({
        "Odometry": {
            "args": {"num_point": 128, "edgewidth": 20, "match_cov_default": 0.25,
                     "profile": False, "mapping": False},
            "frontend": {"type": "FlowFormerCovFrontend", "args": {
                "weight": "random:0", "enc_dtype": "fp32", "dec_dtype": "fp32",
                "enforce_positive_disparity": False, "decoder_depth": 1}},
            "motion": {"type": "GTMotionwithNoise", "args": {"noise_std": 0.0}},
            "keypoint": {"type": "RandomSelector", "args": {"mask_width": 24}},
            "mappoint": {"type": "RandomSelector", "args": {"mask_width": 24}},
            "outlier": {"type": "CovarianceSanityFilter", "args": {}},
            "cov": {"obs": {"type": "MatchCovariance", "args": {
                "kernel_size": 5, "match_cov_default": 0.25,
                "min_flow_cov": 0.25, "min_depth_cov": 0.05}}},
            "postprocess": {"type": "PoseInterpolate", "args": {}},
            "keyframe": {"type": "AllKeyframe", "args": {}},
            "optimizer": {"type": "Empty_TwoFrame_PGO", "args": {
                "graph_type": "icp", "parallel": True, "capacity": 256}},
        }
    })
    seqs = [
        SyntheticStereo({"n_frames": 4, "width": 96, "height": 64,
                         "fx": 48.0, "fy": 48.0, "seed": 7 + i})
        for i in range(4)
    ]
    driver = BatchedOdometry(cfg, n_sequences=4, mesh=mesh)
    driver.run(seqs)
    for system, seq in zip(driver.systems, seqs):
        est = system.graph.frames.data["pose"].astype(np.float64)
        assert est.shape[0] == 4
        # Empty optimizer + exact GT motion => trajectory == GT.
        m = evaluate_all(seq.poses.astype(np.float64), est)
        assert m["ATE"].rmse < 1e-5


def test_dryrun_multichip_entry():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)
