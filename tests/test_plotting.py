"""Plotting suite: figure builders + sandbox CLI paths produce files
(reference: Utility/Plot/PlotTraj.py, Evaluation/{PlotSeq,PlotSpeed}.py)."""

from __future__ import annotations

import json

import numpy as np
import pytest

from macvo_tpu.utils.sandbox import Sandbox
from macvo_tpu.viz.plot_trajectory import (
    analyze_rotation,
    analyze_roe_cdf,
    analyze_rte_cdf,
    analyze_translation,
    plot_speed_figure,
    plot_trajectory_figure,
)


def _traj(n=30, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.spatial.transform import Rotation

    ts = np.linspace(0, 2 * np.pi, n)
    pos = np.stack([np.cos(ts), np.sin(ts), 0.05 * ts], axis=1)
    quat = Rotation.from_euler("z", ts[:, None]).as_quat()
    poses = np.concatenate([pos, quat], axis=1)
    noisy = poses.copy()
    noisy[:, :3] += 0.01 * rng.standard_normal((n, 3))
    return poses, noisy


def test_figure_builders(tmp_path):
    gt, est = _traj()
    paths = [
        plot_trajectory_figure([("GT", gt), ("est", est)], tmp_path / "traj.png",
                               need_interp=np.arange(len(gt)) % 7 == 0),
        analyze_translation([("est", gt, est)], tmp_path / "trans.png"),
        analyze_rotation([("est", gt, est)], tmp_path / "rot.png"),
        analyze_rte_cdf([("est", gt, est)], tmp_path / "rtecdf.png"),
        analyze_roe_cdf([("est", gt, est)], tmp_path / "roecdf.png"),
        plot_speed_figure([("run", np.abs(np.random.default_rng(0).normal(0.1, 0.02, 50)))],
                          tmp_path / "speed.png"),
    ]
    for p in paths:
        assert p.exists() and p.stat().st_size > 1000, p


@pytest.fixture()
def fake_sandbox(tmp_path):
    box = Sandbox.create(tmp_path, "FakeRun")
    gt, est = _traj()
    t = np.arange(len(gt), dtype=np.float64)[:, None] * 0.1
    np.save(box.path("poses.npy"), np.concatenate([t, est], axis=1))
    np.save(box.path("ref_poses.npy"), np.concatenate([t, gt], axis=1))
    np.save(box.path("need_interp.npy"), np.zeros(len(gt), bool))
    with open(box.path("elapsed_time.json"), "w") as f:
        json.dump({"Odom_Runtime": [100.0 + i for i in range(len(gt))]}, f)
    return box


def test_plot_seq_from_sandbox(fake_sandbox, tmp_path):
    from macvo_tpu.evaluation.plot_seq import plot_jointly, plot_separately

    out = tmp_path / "figs"
    plot_separately([str(fake_sandbox.folder)], out)
    pngs = list(out.glob("*.png"))
    assert len(pngs) == 3, pngs
    # Joint needs >= 2 spaces; with the same space twice it must still work.
    plot_jointly([str(fake_sandbox.folder), str(fake_sandbox.folder)], out)
    assert (out / "Combined_RTEcdf.png").exists()
    assert (out / "Combined_Trajectory.png").exists()


def test_plot_speed_cli(fake_sandbox, tmp_path, monkeypatch):
    from macvo_tpu.evaluation import plot_speed

    out = tmp_path / "speed.png"
    monkeypatch.setattr(
        "sys.argv",
        ["plot_speed", "--spaces", str(fake_sandbox.folder), "--out", str(out)],
    )
    plot_speed.main()
    assert out.exists()


def test_sandbox_get_leaves(tmp_path):
    root = Sandbox.create(tmp_path, "root")
    c1 = root.new_child("a")
    root.new_child("b")
    c1.new_child("a1")
    leaves = {s.folder.name for s in root.get_leaves()}
    assert leaves == {"a1", "b"}


def test_cov_eigen_axes_and_colormap():
    """Eigen-axis / colormap covariance rendering math (reference
    Rerun_Visualize.py:119-152) — validated without the rerun sdk."""
    from macvo_tpu.viz.rerun_viz import cov_det_colormap, cov_eigen_axes

    rng = np.random.default_rng(0)
    pos = rng.standard_normal((5, 3)).astype(np.float32)
    A = rng.standard_normal((5, 3, 3))
    cov = A @ A.transpose(0, 2, 1) + 0.1 * np.eye(3)

    a, b = cov_eigen_axes(pos, cov)
    assert a.shape == (15, 3) and b.shape == (15, 3)
    # Segment midpoints are the point positions; half-length^2 = 0.01*eigval.
    np.testing.assert_allclose((a + b) / 2, np.repeat(pos, 3, axis=0), atol=1e-5)
    half = np.linalg.norm((a - b) / 2, axis=1).reshape(5, 3)
    w = np.sort(np.linalg.eigvalsh(cov), axis=1)
    np.testing.assert_allclose(np.sort(half, axis=1), 0.1 * np.sqrt(w), rtol=1e-6)

    c = cov_det_colormap(cov)
    assert c.shape == (5, 3) and (c >= 0).all() and (c <= 1).all()


def test_matplotlib_figure_builders(tmp_path):
    """plot_macvo / plot_reprojerr grids produce files (reference:
    Matplotlib_Visualize.py:284-328)."""
    from types import SimpleNamespace

    from macvo_tpu.viz.interface import fig_plt
    from macvo_tpu.viz.matplotlib_viz import plot_macvo, plot_reprojerr

    fig_plt.set_mode(None, "image")
    fig_plt.set_save_dir(tmp_path)
    rng = np.random.default_rng(0)
    frame = SimpleNamespace(imageL=rng.uniform(size=(1, 48, 64, 3)).astype(np.float32))
    kp = rng.uniform(0, 40, size=(20, 2)).astype(np.float32)
    obs = {
        "pixel1_uv": kp,
        "pixel2_uv": kp + 1.0,
        "pixel2_uv_cov": np.tile(np.array([1.0, 1.0, 0.1], np.float32), (20, 1)),
    }
    depth_out = SimpleNamespace(cov=rng.uniform(0.01, 1, size=(1, 48, 64, 1)))
    match_out = SimpleNamespace(cov=rng.uniform(0.1, 1, size=(1, 48, 64, 3)))
    p1 = plot_macvo(obs, frame, frame, depth_out, match_out,
                    save_path=tmp_path / "macvo.png")
    cov2 = np.tile(np.eye(2, dtype=np.float32)[None], (20, 1, 1))
    p2 = plot_reprojerr(kp, kp + 1.0, cov2, frame, save_path=tmp_path / "reproj.png")
    fig_plt.set_mode(None, "none")  # restore global gating for other tests
    for p in (p1, p2):
        assert p is not None and p.stat().st_size > 1000
