"""Trained TartanVO pose network (model/TartanVO_posenet.npz) — functional
checks for the learned motion prior (VERDICT r2 weak #6).

Skipped when the checkpoint has not been trained yet
(scripts/train_posenet.py writes it)."""

from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

CKPT = Path(__file__).parent.parent / "model" / "TartanVO_posenet.npz"

pytestmark = pytest.mark.skipif(not CKPT.exists(),
                                reason="posenet checkpoint not trained yet")


def _angle_deg(q):
    return np.degrees(2 * np.arccos(np.clip(abs(q[..., 6]), -1, 1)))


def test_trained_motion_prior_beats_static():
    """On a held-out randomized sequence, the learned prior's per-frame motion
    error must clearly beat the static (zero-motion) prior."""
    from macvo_tpu.data.datasets.randomized import RandomizedStereo
    from macvo_tpu.geometry import se3_np
    from macvo_tpu.modules.frontend_tartanvo import TartanMotionNet

    seq = RandomizedStereo({"n_frames": 6, "width": 320, "height": 240,
                            "fx": 160.0, "fy": 160.0, "seed": 4242})
    net = TartanMotionNet(SimpleNamespace(weight=str(CKPT)))

    err_net, err_static = [], []
    prev_pose = None
    for i in range(len(seq) - 1):
        f0, f1 = seq[i], seq[i + 1]
        if prev_pose is None:
            net.predict(f0, None, None)  # initializes at identity
            prev_pose = np.asarray(f0.gt_pose[0])
        # feed GT pose of frame i as the optimizer would (update()),
        # then predict frame i+1 from GT flow/depth
        net.update(np.asarray(f0.gt_pose[0], np.float32))
        import jax.numpy as jnp
        pred = np.asarray(net.predict(
            f1, jnp.asarray(f0.stereo.gt_flow), jnp.asarray(f1.stereo.gt_depth)))
        gt1 = np.asarray(f1.gt_pose[0], np.float64)
        rel_net = se3_np.mul(se3_np.inv(gt1), pred.astype(np.float64))
        rel_static = se3_np.mul(se3_np.inv(gt1), np.asarray(f0.gt_pose[0], np.float64))
        err_net.append(np.linalg.norm(se3_np.log(rel_net)))
        err_static.append(np.linalg.norm(se3_np.log(rel_static)))

    e_net, e_static = float(np.mean(err_net)), float(np.mean(err_static))
    assert e_net < 0.6 * e_static, (e_net, e_static)


def test_tartanvo_baseline_runs_with_trained_posenet():
    """GT-frontend TartanVO baseline with the trained pose net produces a
    finite, non-degenerate trajectory (baseline row is functional in this
    configuration — PARITY.md row 27)."""
    from macvo_tpu.data.datasets.randomized import RandomizedStereo
    from macvo_tpu.odometry.baseline_tartanvo import TartanVO
    from macvo_tpu.utils.config import build_dynamic_config

    cfg, _ = build_dynamic_config({
        "Odometry": {
            "match": {"type": "GTMatcher", "args": {}},
            "depth": {"type": "GTDepth", "args": {}},
            "keyframe": {"type": "AllKeyframe", "args": {}},
            "tartanvo": {"args": {"weight": str(CKPT)}},
        }
    })
    seq = RandomizedStereo({"n_frames": 5, "width": 320, "height": 240,
                            "fx": 160.0, "fy": 160.0, "seed": 77})
    system = TartanVO.from_config(cfg)
    system.receive_frames(seq)
    poses = np.asarray(system.graph.frames.data["pose"][:5])
    assert np.isfinite(poses).all()
    # it must actually move (not frozen at identity)
    assert np.linalg.norm(poses[-1, :3] - poses[0, :3]) > 0.05
