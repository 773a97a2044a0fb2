"""Loader tests against synthesized on-disk layouts (EuRoC ASL, KITTI odometry).

The reference exercises its loaders only on real downloads; here miniature
directory trees are generated so the parsing/rectification/GT-interpolation
paths run in CI.
"""

from pathlib import Path

import cv2
import numpy as np
import pytest
import yaml


def _write_png(path: Path, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    path.parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(path), img)


@pytest.fixture(scope="module")
def euroc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("euroc") / "MH_01"
    times = (np.arange(6) * 5e7 + 1e9).astype(np.int64)  # 20 Hz
    for ci, cam in enumerate(("cam0", "cam1")):
        T_BS = np.eye(4)
        T_BS[0, 3] = ci * 0.11  # stereo baseline along body x
        sensor = {
            "intrinsics": [458.654, 457.296, 367.215, 248.375],
            "T_BS": {"data": T_BS.reshape(-1).tolist()},
        }
        (root / cam).mkdir(parents=True)
        with open(root / cam / "sensor.yaml", "w") as f:
            yaml.safe_dump(sensor, f)
        for i, t in enumerate(times):
            _write_png(root / cam / "data" / f"{t}.png", h=480, w=752, seed=i)

    gt_time = (np.arange(40) * 1e7 + 0.95e9).astype(np.int64)
    gt = np.zeros((40, 17))
    gt[:, 0] = gt_time
    gt[:, 1] = np.linspace(0, 1, 40)       # x position ramp
    gt[:, 4] = 1.0                          # qw (file stores wxyz)
    (root / "state_groundtruth_estimate0").mkdir()
    np.savetxt(root / "state_groundtruth_estimate0" / "data.csv", gt,
               delimiter=",", header="t", comments="#")

    imu = np.zeros((400, 7))
    imu[:, 0] = (np.arange(400) * 5e6 + 0.95e9).astype(np.int64)
    imu[:, 4:7] = [0.0, 0.0, -9.81]
    (root / "imu0").mkdir()
    np.savetxt(root / "imu0" / "data.csv", imu, delimiter=",", header="t", comments="#")
    return root


def test_euroc_loader(euroc_root):
    from macvo_tpu.data.datasets.euroc import EuRoC

    seq = EuRoC({"root": str(euroc_root), "gt_pose": True})
    assert len(seq) >= 4
    frame = seq[1]
    assert frame.stereo.imageL.shape == (1, 480, 752, 3)
    assert frame.gt_pose is not None and frame.gt_pose.shape == (1, 7)
    # GT x ramps over time: interpolated pose must be strictly increasing.
    xs = [float(seq[i].gt_pose[0, 0]) for i in range(len(seq))]
    assert all(b > a for a, b in zip(xs, xs[1:]))


def test_euroc_imu_loader(euroc_root):
    from macvo_tpu.data.datasets.euroc import EuRoC_IMU

    seq = EuRoC_IMU({"root": str(euroc_root), "gt_pose": True})
    frame = seq[2]
    assert frame.imu is not None and frame.attitude is not None
    assert frame.imu.acc.shape[2] == 3
    assert frame.imu.acc.shape[1] >= 5     # ~10 samples between 20 Hz frames at 200 Hz
    np.testing.assert_allclose(frame.imu.acc[0, 0], [0, 0, -9.81])


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    base = tmp_path_factory.mktemp("kitti")
    root = base / "sequences" / "00"
    for cam in ("image_2", "image_3"):
        for i in range(4):
            _write_png(root / cam / f"{i:06d}.png", h=94, w=310, seed=i)
    fx, cx, cy, bl = 718.856, 607.19, 185.21, 0.537
    p2 = f"P2: {fx} 0 {cx} 0 0 {fx} {cy} 0 0 0 1 0"
    p3 = f"P3: {fx} 0 {cx} {-fx * bl} 0 {fx} {cy} 0 0 0 1 0"
    (root / "calib.txt").write_text(f"P0: x\nP1: x\n{p2}\n{p3}\n")
    np.savetxt(root / "times.txt", np.arange(4) * 0.1)
    poses = np.tile(np.eye(3, 4).reshape(-1), (4, 1))
    poses[:, 3] = np.arange(4) * 0.5  # x translation
    (base / "poses").mkdir()
    np.savetxt(base / "poses" / "00.txt", poses)
    return root


def test_kitti_loader(kitti_root):
    from macvo_tpu.data.datasets.kitti import KITTI

    seq = KITTI({"root": str(kitti_root), "gt_pose": True})
    assert len(seq) == 4
    frame = seq[2]
    assert frame.stereo.imageL.shape == (1, 94, 310, 3)
    assert frame.stereo.frame_baseline == pytest.approx(0.537, rel=1e-3)
    assert frame.stereo.fx == pytest.approx(718.856, rel=1e-4)
    np.testing.assert_allclose(frame.gt_pose[0, :3], [1.0, 0, 0], atol=1e-5)
