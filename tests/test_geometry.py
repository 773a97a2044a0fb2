import jax.numpy as jnp
import numpy as np

from macvo_tpu.geometry import camera, gaussian, interp, se3


def test_pixel_point_roundtrip(rng):
    K = camera.intrinsics(320.0, 320.0, 320.0, 240.0)
    uv = jnp.asarray(rng.uniform(0, 640, size=(100, 2)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.5, 50, size=(100,)).astype(np.float32))
    pts = camera.pixel_to_point_ned(uv, depth, K)
    back = camera.point_to_pixel_ned(pts, K)
    np.testing.assert_allclose(back, uv, atol=1e-3)
    np.testing.assert_allclose(pts[:, 0], depth, atol=1e-5)


def test_in_bounds():
    uv = jnp.asarray([[0.0, 0.0], [639.0, 479.0], [-1.0, 5.0], [640.0, 100.0]])
    mask = camera.in_bounds(uv, 640, 480)
    assert mask.tolist() == [True, True, False, False]
    mask_margin = camera.in_bounds(uv, 640, 480, margin=2.0)
    assert mask_margin.tolist() == [False, False, False, False]


def test_disparity_depth():
    disp = jnp.asarray([1.0, 2.0, 4.0])
    depth = camera.disparity_to_depth(disp, baseline=0.25, fx=320.0)
    np.testing.assert_allclose(depth, [80.0, 40.0, 20.0])
    cov = camera.disparity_to_depth_cov(disp, jnp.ones(3), baseline=0.25, fx=320.0)
    np.testing.assert_allclose(cov, (0.25 * 320.0) ** 2 / disp**4)


def test_gaussian_kernels_isotropic():
    cov = jnp.broadcast_to(jnp.eye(2) * 4.0, (3, 2, 2))
    k = gaussian.gaussian_full_kernels(cov, 31)
    assert k.shape == (3, 31, 31)
    np.testing.assert_allclose(jnp.sum(k, axis=(1, 2)), 1.0, atol=1e-5)
    # Peak at center, symmetric
    assert float(k[0, 15, 15]) == float(jnp.max(k[0]))
    np.testing.assert_allclose(k[0], k[0].T, atol=1e-6)


def test_gaussian_kernels_anisotropic():
    cov = jnp.asarray([[[25.0, 0.0], [0.0, 1.0]]])
    k = gaussian.gaussian_full_kernels(cov, 31)
    # Wider spread along the first (row) axis than the second.
    row_marginal = jnp.sum(k[0], axis=1)
    col_marginal = jnp.sum(k[0], axis=0)
    assert float(row_marginal.std()) < float(col_marginal.std())


def test_mixture_mean_var():
    means = jnp.asarray([[0.0, 10.0]])
    variances = jnp.asarray([[1.0, 1.0]])
    probs = jnp.asarray([[0.5, 0.5]])
    mean, var = gaussian.gaussian_mixture_mean_var(means, variances, probs)
    np.testing.assert_allclose(mean, [5.0], atol=1e-6)
    # (1 + 25) - 25 = wait: E[v+m^2] - mean^2 = (0.5*1 + 0.5*101) - 25 = 26; /2 = 13
    np.testing.assert_allclose(var, [13.0], atol=1e-5)


def test_mixture_prob_floor():
    means = jnp.asarray([[0.0, 100.0]])
    variances = jnp.asarray([[1.0, 1.0]])
    probs = jnp.asarray([[1.0 - 1e-5, 1e-5]])
    mean, _ = gaussian.gaussian_mixture_mean_var(means, variances, probs)
    np.testing.assert_allclose(mean, [0.0], atol=1e-6)


def test_mahalanobis():
    x = jnp.asarray([[1.0, 0.0]])
    mu = jnp.zeros((1, 2))
    sigma = jnp.broadcast_to(jnp.eye(2) * 4.0, (1, 2, 2))
    d = gaussian.mahalanobis(x, mu, sigma)
    np.testing.assert_allclose(d, [0.5], atol=1e-6)
    d2 = gaussian.mahalanobis_inv(x, mu, gaussian.inv_2x2(sigma))
    np.testing.assert_allclose(d2, [0.5], atol=1e-6)


def test_interpolate_pose():
    t0 = se3.identity()
    t1 = se3.exp(jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.0, 0.5]))
    poses = jnp.stack([t0, t1])
    ts = jnp.asarray([0.0, 1.0])
    query = jnp.asarray([-0.5, 0.0, 0.5, 1.0, 2.0])
    interp_poses, clamped = interp.interpolate_pose(poses, ts, query)
    # Boundary queries (== endpoints) count as clamped, matching the
    # reference's before/after mask semantics (Utility/Math.py:100).
    assert clamped.tolist() == [True, True, False, True, True]
    np.testing.assert_allclose(interp_poses[0], t0, atol=1e-6)
    np.testing.assert_allclose(interp_poses[-1], t1, atol=1e-6)
    # Midpoint twist is half the endpoint twist.
    mid_twist = se3.log(interp_poses[2])
    np.testing.assert_allclose(mid_twist, se3.log(t1) * 0.5, atol=1e-5)


def test_slerp_endpoints(rng):
    from scipy.spatial.transform import Rotation

    q = Rotation.random(2, random_state=rng).as_quat().astype(np.float32)
    q0, q1 = jnp.asarray(q[0])[None], jnp.asarray(q[1])[None]
    np.testing.assert_allclose(interp.slerp(q0, q1, jnp.asarray([0.0])), q0, atol=1e-5)
    s1 = np.asarray(interp.slerp(q0, q1, jnp.asarray([1.0])))[0]
    assert abs(float(np.dot(s1, q[1]))) > 1 - 1e-5


def test_cumulative_motions():
    motion = se3.exp(jnp.asarray([0.1, 0.0, 0.0, 0.0, 0.0, 0.0]))
    motions = jnp.broadcast_to(motion, (10, 7))
    traj = interp.cumulative_motions(se3.identity(), motions)
    assert traj.shape == (11, 7)
    np.testing.assert_allclose(traj[-1, 0], 1.0, atol=1e-5)
