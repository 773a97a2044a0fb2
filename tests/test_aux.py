"""Auxiliary subsystem tests: IMU simulator/noise, extensions, viz gating,
dense evaluation suites, network smoke tests."""

import numpy as np
import pytest

from macvo_tpu.data.datasets.synthetic import SyntheticStereo
from macvo_tpu.data.imu import EPSON_M365, IMUNoiseGenerator, IMUSimulator
from macvo_tpu.utils.extensions import Chain, CircularBuffer, GridRecorder


# -- IMU -------------------------------------------------------------------

@pytest.fixture(scope="module")
def imu_sim():
    seq = SyntheticStereo({"n_frames": 12, "width": 64, "height": 48, "fx": 32.0, "fy": 32.0})
    return IMUSimulator(seq.poses, cam_fps=10.0, imu_fps=100.0)


def test_imu_simulator_shapes(imu_sim):
    d = imu_sim.data
    assert d.acc.shape == d.gyro.shape == d.gt_pos.shape
    assert d.acc.shape[0] >= 100  # 1.1s of 100 Hz samples
    assert d.gt_rot.shape[1] == 4


def test_imu_simulator_gravity(imu_sim):
    """A (nearly) static body must measure ~|g| specific force."""
    static = IMUSimulator(
        np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (10, 1))
        + np.random.default_rng(0).normal(0, 1e-9, (10, 7)).astype(np.float32) * 0,
        cam_fps=10.0, imu_fps=100.0,
    )
    mags = np.linalg.norm(static.data.acc, axis=1)
    np.testing.assert_allclose(mags, 9.81, atol=0.05)


def test_imu_between_frames(imu_sim):
    imu, att = imu_sim.between_frames(3)
    assert imu.acc.shape[0] == 1 and imu.acc.shape[2] == 3
    assert imu.acc.shape[1] >= 9  # ~10 samples between 10 Hz frames at 100 Hz
    assert att.init_pos.shape == (1, 3)


def test_imu_noise_biases_signal():
    gen = IMUNoiseGenerator(**EPSON_M365, seed=0)
    acc = np.zeros((100, 3))
    gyro = np.zeros((100, 3))
    nacc, ngyro = gen.propagate(acc, gyro)
    assert np.abs(nacc).mean() > 0.001   # bias + noise applied
    assert np.abs(ngyro).mean() > 1e-6
    assert not np.allclose(gen.acc_bias, EPSON_M365["acc_bias"])  # bias walked


# -- extensions ------------------------------------------------------------

def test_circular_buffer_wraparound():
    buf = CircularBuffer(4, row_shape=(2,))
    buf.push(np.arange(6, dtype=np.float32).reshape(3, 2))
    assert len(buf) == 3
    buf.push(np.arange(6, 12, dtype=np.float32).reshape(3, 2))
    assert len(buf) == 4
    np.testing.assert_array_equal(buf.array[0], [4, 5])  # oldest kept
    np.testing.assert_array_equal(buf.array[-1], [10, 11])
    # oversized push keeps the newest `capacity` rows
    buf.push(np.arange(20, dtype=np.float32).reshape(10, 2))
    np.testing.assert_array_equal(buf.array[0], [12, 13])


def test_grid_recorder(tmp_path):
    rec = GridRecorder((0, 1), (0, 1), bins=(4, 4))
    rec.record(np.array([0.1, 0.9]), np.array([0.1, 0.9]))
    assert rec.grid.sum() == 2
    rec.save(tmp_path / "grid.npz")
    rec2 = GridRecorder.load(tmp_path / "grid.npz")
    np.testing.assert_array_equal(rec.grid, rec2.grid)


def test_chain_composition():
    f = Chain(lambda x: x + 1) >> (lambda x: x * 2) >> (lambda x: x - 3)
    assert f(4) == 7


# -- viz -------------------------------------------------------------------

def test_viz_gating(tmp_path):
    from macvo_tpu.modules import GTDepth, GTMatcher
    from macvo_tpu.viz import fig_plt, plot_imatcher, plot_istereo

    seq = SyntheticStereo({"n_frames": 2, "width": 64, "height": 48, "fx": 32.0, "fy": 32.0})
    f0, f1 = seq[0], seq[1]
    d = GTDepth(None).estimate(f0.stereo)
    m = GTMatcher(None).estimate(f0.stereo, f1.stereo)

    # Default mode 'none': plot calls are no-ops.
    assert plot_imatcher(m, f0.stereo, f1.stereo) is None
    # Image mode: files land in the save dir.
    fig_plt.set_save_dir(tmp_path)
    fig_plt.set_mode("plot_istereo", "image")
    path = plot_istereo(d, f0.stereo)
    assert path is not None and path.exists()
    fig_plt.set_mode(None, "none")


def test_rerun_gated_noop():
    from macvo_tpu.viz import rerun_viz

    # rerun sdk is absent in this image: every call must no-op, not raise.
    rerun_viz.log_trajectory("world/traj", np.zeros((5, 3)))
    rerun_viz.log_points("world/pts", np.zeros((5, 3)), covariances=np.tile(np.eye(3), (5, 1, 1)))


# -- dense evaluation -------------------------------------------------------

def test_evaluate_flow_oracle():
    from macvo_tpu.evaluation import evaluate_depth, evaluate_flow
    from macvo_tpu.modules import GTDepth, GTMatcher

    seq = SyntheticStereo({"n_frames": 4, "width": 64, "height": 48, "fx": 32.0, "fy": 32.0})
    perf = evaluate_flow(GTMatcher(None), seq)
    assert perf.masked_epe < 1e-5 and perf.px1 == 1.0
    dperf = evaluate_depth(GTDepth(None), seq)
    assert dperf.masked_err < 1e-6


def test_evaluate_flowcov_calibrated():
    """A perfectly calibrated unit-variance error field should have NLL ~= 1
    (err^2/var + log var = 1 + 0 in expectation)."""
    from macvo_tpu.evaluation import evaluate_flowcov
    from macvo_tpu.modules import GTMatcher, MatchOutput

    rng = np.random.default_rng(0)

    class NoisyUnitCovMatcher(GTMatcher):
        def estimate(self, f0, f1):
            out = super().estimate(f0, f1)
            import jax.numpy as jnp
            noise = jnp.asarray(rng.normal(0, 1, out.flow.shape).astype(np.float32))
            cov = jnp.ones(out.flow.shape, jnp.float32)
            return MatchOutput.from_partial_cov(flow=out.flow + noise, cov=cov)

    seq = SyntheticStereo({"n_frames": 4, "width": 64, "height": 48, "fx": 32.0, "fy": 32.0})
    perf = evaluate_flowcov(NoisyUnitCovMatcher(None), seq)
    assert 0.7 < perf.masked_nll < 1.3
