"""Cross-validate the native metric suite against an independent
re-derivation of evo's algorithm (reference: Evaluation/MetricsSeq.py:9-51).

``evo`` itself is not installable in this environment, so the expected values
are produced by an INDEPENDENT implementation written here from evo's
published definitions (scipy rotations, explicit per-step loops, evo's
operation order: umeyama align -> align_origin -> per-pose errors), and the
resulting statistics are additionally pinned as literals so that both
implementations cannot drift together unnoticed.

evo semantics encoded below (evo.main_ape / evo.main_rpe):
* align=True: Umeyama over positions, model ref ~= s*R*est + t
  (s=1 unless correct_scale), applied as p -> s R p + t, R_i -> R R_i.
* align_origin=True: after alignment, left-multiply by gt[0] @ aligned[0]^-1.
* APE translation_part: ||t_gt,i - t_est,i||.
* RPE delta=1 frames: E_i = (Q_i^-1 Q_{i+1})^-1 (P_i^-1 P_{i+1});
  translation_part = ||t(E_i)||, rotation_angle_deg = deg(arccos((tr-1)/2)),
  full_transformation = ||E_i - I||_F.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation

from macvo_tpu.evaluation.metrics import evaluate_all, evaluate_ate


def _make_trajectories():
    """Deterministic synthetic GT + noisy estimate, as (N,7) [t, q_xyzw]."""
    rng = np.random.default_rng(42)
    n = 40
    ts = np.linspace(0.0, 4 * np.pi, n)
    gt_t = np.stack([np.cos(ts), np.sin(ts), 0.1 * ts], axis=1)
    gt_R = Rotation.from_euler("zyx", np.stack([ts, 0.1 * ts, 0.05 * ts], axis=1))
    gt = np.concatenate([gt_t, gt_R.as_quat()], axis=1)

    # Estimate = GT disturbed by a global rigid offset + per-pose noise; the
    # global offset must be absorbed by the alignment, the noise must not.
    T_off = np.eye(4)
    T_off[:3, :3] = Rotation.from_euler("xyz", [0.3, -0.2, 0.5]).as_matrix()
    T_off[:3, 3] = [2.0, -1.0, 0.5]
    noise_t = 0.01 * rng.standard_normal((n, 3))
    noise_R = Rotation.from_rotvec(0.005 * rng.standard_normal((n, 3)))
    est_t = (gt_t + noise_t) @ T_off[:3, :3].T + T_off[:3, 3]
    est_R = Rotation.from_matrix(T_off[:3, :3] @ (noise_R * gt_R).as_matrix())
    est = np.concatenate([est_t, est_R.as_quat()], axis=1)
    return gt, est


def _to_mats(poses):
    out = np.tile(np.eye(4), (len(poses), 1, 1))
    out[:, :3, :3] = Rotation.from_quat(poses[:, 3:]).as_matrix()
    out[:, :3, 3] = poses[:, :3]
    return out


def _evo_reference(gt, est, correct_scale=False):
    """Independent evo re-derivation (loops, scipy)."""
    gt_m, est_m = _to_mats(gt), _to_mats(est)
    x = est_m[:, :3, 3]  # source
    y = gt_m[:, :3, 3]  # target
    mx, my = x.mean(0), y.mean(0)
    cov = np.zeros((3, 3))
    for i in range(len(x)):
        cov += np.outer(y[i] - my, x[i] - mx)
    cov /= len(x)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    s = float((D * np.diag(S)).sum() / ((x - mx) ** 2).sum() * len(x)) if correct_scale else 1.0
    t = my - s * R @ mx

    aligned = []
    for i in range(len(x)):
        Ti = np.eye(4)
        Ti[:3, :3] = R @ est_m[i, :3, :3]
        Ti[:3, 3] = s * R @ est_m[i, :3, 3] + t
        aligned.append(Ti)
    aligned = np.stack(aligned)
    T0 = gt_m[0] @ np.linalg.inv(aligned[0])
    aligned = np.stack([T0 @ Ti for Ti in aligned])

    ate = [np.linalg.norm(gt_m[i, :3, 3] - aligned[i, :3, 3]) for i in range(len(x))]
    rte, roe, rpe = [], [], []
    for i in range(len(x) - 1):
        Qrel = np.linalg.inv(gt_m[i]) @ gt_m[i + 1]
        Prel = np.linalg.inv(aligned[i]) @ aligned[i + 1]
        E = np.linalg.inv(Qrel) @ Prel
        rte.append(np.linalg.norm(E[:3, 3]))
        roe.append(np.degrees(np.arccos(np.clip((np.trace(E[:3, :3]) - 1) / 2, -1, 1))))
        rpe.append(np.linalg.norm(E - np.eye(4)))

    def stats(e):
        e = np.asarray(e)
        return {"mean": e.mean(), "rmse": np.sqrt((e**2).mean()), "std": e.std()}

    return {"ATE": stats(ate), "RTE": stats(rte), "ROE": stats(roe), "RPE": stats(rpe)}


def test_metrics_match_independent_evo_rederivation():
    gt, est = _make_trajectories()
    ours = evaluate_all(gt, est)
    ref = _evo_reference(gt, est)
    for name in ("ATE", "RTE", "ROE", "RPE"):
        got = ours[name]
        want = ref[name]
        np.testing.assert_allclose(got.mean, want["mean"], rtol=1e-9, err_msg=name)
        np.testing.assert_allclose(got.rmse, want["rmse"], rtol=1e-9, err_msg=name)
        np.testing.assert_allclose(got.std, want["std"], rtol=1e-9, err_msg=name)


def test_metrics_pinned_values():
    """Literal pins so the suite cannot silently drift (computed 2026-08-17
    from the independent re-derivation above)."""
    gt, est = _make_trajectories()
    ours = evaluate_all(gt, est)
    np.testing.assert_allclose(ours["ATE"].rmse, 0.018244373, rtol=1e-5)
    np.testing.assert_allclose(ours["RTE"].rmse, 0.019688471, rtol=1e-5)
    np.testing.assert_allclose(ours["ROE"].rmse, 0.793182294, rtol=1e-5)
    np.testing.assert_allclose(ours["RPE"].rmse, 0.027765413, rtol=1e-5)


def test_sim3_alignment_absorbs_scale():
    gt, est = _make_trajectories()
    est_scaled = est.copy()
    est_scaled[:, :3] *= 3.7  # monocular-style scale ambiguity
    ate_se3 = evaluate_ate(gt, est_scaled, correct_scale=False)
    ate_sim3 = evaluate_ate(gt, est_scaled, correct_scale=True)
    assert ate_sim3.rmse < 0.1 * ate_se3.rmse
    # Sim3 on the scaled estimate recovers (almost exactly) the unscaled SE3
    # residual.
    ate_ref = evaluate_ate(gt, est, correct_scale=False)
    np.testing.assert_allclose(ate_sim3.rmse, ate_ref.rmse, rtol=1e-2)


def test_exact_rigid_offset_gives_zero_error():
    gt, _ = _make_trajectories()
    T = np.eye(4)
    T[:3, :3] = Rotation.from_euler("xyz", [0.1, 0.7, -0.4]).as_matrix()
    T[:3, 3] = [5.0, -2.0, 1.0]
    mats = _to_mats(gt)
    est_m = np.stack([T @ m for m in mats])
    est = np.concatenate(
        [est_m[:, :3, 3], Rotation.from_matrix(est_m[:, :3, :3]).as_quat()], axis=1
    )
    res = evaluate_all(gt, est)
    assert res["ATE"].rmse < 1e-9
    assert res["RTE"].rmse < 1e-9
    assert res["ROE"].rmse < 1e-5  # float arccos noise near angle 0
