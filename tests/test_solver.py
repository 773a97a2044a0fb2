"""LM solver tests: convergence per graph type + analytic-Jacobian cross-check
against jax autodiff (mirrors the reference's AnalyticModule.verify_jacobian,
Module/Optimization/PyposeOptimizers.py:60-73)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macvo_tpu.backend.solver import (
    TwoFrameData,
    _icp_terms,
    _reproj_disp_terms,
    _reproj_terms,
    solve_two_frame,
)
from macvo_tpu.geometry import camera, se3


def make_problem(n=64, seed=0, init_twist=(0.1, -0.05, 0.08, 0.02, -0.01, 0.03)):
    rng = np.random.default_rng(seed)
    K = jnp.array([[320.0, 0, 320], [0, 320.0, 240], [0, 0, 1]], dtype=jnp.float64)
    true_pose = se3.normalize(
        jnp.asarray(np.concatenate([rng.normal(0, 0.5, 3), [0.05, 0.02, -0.03, 1.0]]))
    )
    pts_c = jnp.asarray(
        np.stack([rng.uniform(4, 20, n), rng.uniform(-3, 3, n), rng.uniform(-2, 2, n)], 1)
    )
    pts_w = se3.act(true_pose, pts_c)
    kp2 = camera.point_to_pixel_ned(pts_c, K)
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float64) * 0.01, (n, 3, 3))
    eye2 = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float64) * 0.25, (n, 2, 2))
    init = se3.mul(true_pose, se3.exp(jnp.asarray(init_twist, jnp.float64)))
    data = TwoFrameData(
        pose0=init,
        points_w=pts_w,
        points_c=pts_c,
        kp2=kp2,
        disp2=K[0, 0] * 0.25 / pts_c[:, 0],
        cov_obs_c=eye3,
        cov_pts_w=eye3,
        cov_kp2=eye2,
        disp2_cov=jnp.full((n,), 0.25),
        K=K,
        baseline=jnp.asarray(0.25),
        mask=jnp.ones((n,), bool),
    )
    return data, true_pose


@pytest.mark.parametrize("graph_type", ["icp", "reproj", "disp"])
def test_solver_converges(graph_type):
    data, true_pose = make_problem()
    pose = solve_two_frame(data, graph_type=graph_type)
    err = float(jnp.linalg.norm(se3.log(se3.mul(se3.inv(true_pose), pose))))
    assert err < 1e-5, f"{graph_type}: residual pose error {err}"


def test_solver_masked_padding_invariant():
    """Padded rows with zero weight must not change the solution."""
    data, true_pose = make_problem(n=32)
    pose_full = solve_two_frame(data, graph_type="icp")

    pad = 32
    def pad0(x):
        return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    padded = data._replace(
        points_w=pad0(data.points_w), points_c=pad0(data.points_c),
        kp2=pad0(data.kp2), disp2=pad0(data.disp2),
        cov_obs_c=pad0(data.cov_obs_c), cov_pts_w=pad0(data.cov_pts_w),
        cov_kp2=pad0(data.cov_kp2), disp2_cov=pad0(data.disp2_cov),
        mask=jnp.concatenate([data.mask, jnp.zeros((pad,), bool)]),
    )
    pose_pad = solve_two_frame(padded, graph_type="icp")
    np.testing.assert_allclose(np.asarray(pose_pad), np.asarray(pose_full), atol=1e-10)


@pytest.mark.parametrize(
    "terms_fn,res_dim",
    [(_icp_terms, 3), (_reproj_terms, 2), (_reproj_disp_terms, 3)],
)
def test_analytic_jacobian_matches_autodiff(terms_fn, res_dim):
    data, _ = make_problem(n=16)

    def residual_of_twist(twist):
        pose = se3.mul(data.pose0, se3.exp(twist))
        r, _, _ = terms_fn(pose, data)
        return r

    twist0 = jnp.zeros((6,), jnp.float64)
    J_auto = jax.jacfwd(residual_of_twist)(twist0)          # (N, D, 6)
    _, J_analytic, _ = terms_fn(data.pose0, data)
    assert J_analytic.shape == (16, res_dim, 6)
    np.testing.assert_allclose(np.asarray(J_analytic), np.asarray(J_auto), atol=1e-6)


def test_solver_noise_weighted():
    """With heteroscedastic noise, the whitened solve should beat unweighted
    accuracy — sanity check that covariances actually steer the solution."""
    data, true_pose = make_problem(n=128, seed=3)
    rng = np.random.default_rng(11)
    # Corrupt half the ICP targets heavily and tell the solver via covariance.
    noisy = rng.permutation(128)[:64]
    noise = np.zeros((128, 3))
    noise[noisy] = rng.normal(0, 0.5, (64, 3))
    cov = np.tile(np.eye(3) * 1e-4, (128, 1, 1))
    cov[noisy] = np.eye(3) * 0.25
    data_w = data._replace(
        points_w=data.points_w + jnp.asarray(noise),
        cov_pts_w=jnp.asarray(cov),
        cov_obs_c=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float64) * 1e-6, (128, 3, 3)),
    )
    pose = solve_two_frame(data_w, graph_type="icp")
    err = float(jnp.linalg.norm(se3.log(se3.mul(se3.inv(true_pose), pose))))
    assert err < 0.02, f"weighted solve error too large: {err}"


@pytest.mark.parametrize("graph_type", ["reproj", "disp"])
def test_packed_solver_identity_init_with_padding(graph_type):
    """Regression: zero-padded rows project through x=0 at an IDENTITY init
    (the Local re-anchored steady state) — the NaN used to defeat the mask
    (NaN * 0 = NaN) and silently freeze every pose at its initialization."""
    from macvo_tpu.backend.solver import pack_two_frame, solve_two_frame_packed

    data, true_pose = make_problem(n=24, init_twist=(0.0,) * 6)
    # Re-anchor so the init pose is exactly identity (true pose = the motion).
    anchor = data.pose0
    data = data._replace(
        pose0=jnp.asarray([0, 0, 0, 0, 0, 0, 1.0], jnp.float64),
        points_w=se3.act(se3.inv(anchor), data.points_w),
    )
    true_local = se3.mul(se3.inv(anchor), true_pose)

    pad = 40
    def pad0(x):
        return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    padded = data._replace(
        points_w=pad0(data.points_w), points_c=pad0(data.points_c),
        kp2=pad0(data.kp2), disp2=pad0(data.disp2),
        cov_obs_c=pad0(data.cov_obs_c), cov_pts_w=pad0(data.cov_pts_w),
        cov_kp2=pad0(data.cov_kp2), disp2_cov=pad0(data.disp2_cov),
        mask=jnp.concatenate([data.mask, jnp.zeros((pad,), bool)]),
    )
    pose = solve_two_frame_packed(
        jnp.asarray(pack_two_frame(jax.tree.map(np.asarray, padded))),
        graph_type=graph_type)
    assert np.isfinite(np.asarray(pose)).all()
    err = float(jnp.linalg.norm(se3.log(se3.mul(se3.inv(true_local), pose))))
    assert err < 1e-4, f"{graph_type}: pose error {err} (solver froze?)"


@pytest.mark.parametrize("graph_type", ["icp", "disp"])
def test_sync_packed_nan_in_masked_rows(graph_type):
    """Regression (ADVICE r2): a NaN/Inf in a masked-OUT row of the packed
    sync (e.g. bf16 frontend overflow in a rejected observation) must not
    poison the device-chained solve — benign substitution happens before any
    residual math (backend/two_frame_pgo.py solve_sync_packed)."""
    from macvo_tpu.backend.two_frame_pgo import solve_sync_packed
    from macvo_tpu.odometry.layout import COL_KEEP, OBS_COLS, PACKED_SYNC_WIDTH

    rng = np.random.default_rng(3)
    n, cap = 32, 48
    K = np.array([[160.0, 0, 160], [0, 160.0, 120], [0, 0, 1]])
    anchor = np.array([0.3, -0.2, 0.1, 0.02, -0.01, 0.03, 1.0], np.float32)
    anchor = np.asarray(se3.normalize(jnp.asarray(anchor)), np.float32)
    motion = np.asarray(se3.exp(jnp.asarray([0.2, -0.05, 0.03, 0.01, -0.02, 0.015])), np.float64)
    # camera-1 landmarks, their pixels/depths; camera-2 view after `motion`
    pts_c1 = np.stack([rng.uniform(4, 15, n), rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n)], 1)
    uv1 = np.asarray(camera.point_to_pixel_ned(jnp.asarray(pts_c1), jnp.asarray(K)))
    pts_c2 = np.asarray(se3.act(se3.inv(jnp.asarray(motion)), jnp.asarray(pts_c1)))
    uv2 = np.asarray(camera.point_to_pixel_ned(jnp.asarray(pts_c2), jnp.asarray(K)))

    sync = np.zeros((cap + 1, PACKED_SYNC_WIDTH), np.float32)
    def put(name, val):
        lo, hi = OBS_COLS[name]
        sync[:n, lo:hi] = np.asarray(val, np.float32).reshape(n, hi - lo)
    put("pixel1_uv", uv1); put("pixel2_uv", uv2)
    put("pixel1_d", pts_c1[:, :1]); put("pixel2_d", pts_c2[:, :1])
    put("pixel2_disp", K[0, 0] * 0.25 / pts_c2[:, :1])
    put("pixel2_disp_cov", np.full((n, 1), 0.25))
    put("pixel2_uv_cov", np.tile([0.25, 0.25, 0.0], (n, 1)))
    put("obs1_covTc", np.tile((np.eye(3) * 0.01).ravel(), (n, 1)))
    put("obs2_covTc", np.tile((np.eye(3) * 0.01).ravel(), (n, 1)))
    sync[:n, COL_KEEP] = 1.0
    # POISON the padded/masked rows with NaN and Inf everywhere
    sync[n:cap, :] = np.nan
    sync[n + 1:cap:2, :] = np.inf
    sync[n:cap, COL_KEEP] = 0.0  # masked out
    # init DIFFERS from truth: a NaN-frozen solve returns this perturbed pose
    # (err ~ 0.13) and fails the bound — only a working solve converges
    perturb = se3.exp(jnp.asarray([0.08, -0.04, 0.05, 0.02, -0.01, 0.03], jnp.float64))
    est_pose = np.asarray(se3.mul(se3.mul(jnp.asarray(anchor, jnp.float64),
                                          jnp.asarray(motion)), perturb), np.float32)
    sync[cap, 0:7] = est_pose

    cam = jnp.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], jnp.float32)
    pose = solve_sync_packed(jnp.asarray(sync), jnp.asarray(anchor),
                             cam, jnp.asarray(0.25, jnp.float32), graph_type)
    pose = np.asarray(pose)
    assert np.isfinite(pose).all(), "NaN in masked rows leaked into the solve"
    want = np.asarray(se3.mul(jnp.asarray(anchor, jnp.float64), jnp.asarray(motion)))
    err = float(jnp.linalg.norm(se3.log(se3.mul(se3.inv(jnp.asarray(want)),
                                                jnp.asarray(pose, jnp.float64)))))
    assert err < 1e-2, f"pose error {err} with poisoned masked rows"
