"""Module-family tests: selectors, filters, covariance models, GT frontends
(mirrors reference shape-contract tests, Scripts/UnitTest/test_{matching,
stereo_depth,frontend}.py, on the synthetic oracle sequence)."""

import jax.numpy as jnp
import numpy as np
import pytest

from macvo_tpu.data.datasets.synthetic import SyntheticStereo
from macvo_tpu.modules import (
    ApplyGTDepthCov,
    ApplyGTMatchCov,
    CovarianceSanityFilter,
    CovAwareSelector,
    FilterCompose,
    FrontendCompose,
    GridSelector,
    GTDepth,
    GTMatcher,
    LikelyFrontOfCamFilter,
    MatchCovariance,
    Modifier_Diagonalize,
    NoCovariance,
    RandomSelector,
    SelectorCompose,
    SimpleDepthFilter,
    retrieve_pixels,
)
from macvo_tpu.utils.config import build_dynamic_config


def ns(d):
    return build_dynamic_config(d)[0]


@pytest.fixture(scope="module")
def frames():
    seq = SyntheticStereo({"n_frames": 3, "width": 160, "height": 120, "fx": 80.0, "fy": 80.0})
    return seq[0], seq[1]


@pytest.fixture(scope="module")
def outputs(frames):
    f0, f1 = frames
    depth = ApplyGTDepthCov(ns({"module": {"type": "GTDepth", "args": {}}}))
    match = ApplyGTMatchCov(ns({"module": {"type": "GTMatcher", "args": {}}}))
    d0 = depth.estimate(f0.stereo)
    d1 = depth.estimate(f1.stereo)
    m01 = match.estimate(f0.stereo, f1.stereo)
    return d0, d1, m01


def test_gt_frontend_contracts(frames, outputs):
    f0, _ = frames
    d0, _, m01 = outputs
    h, w = f0.stereo.height, f0.stereo.width
    assert d0.depth.shape == (1, h, w, 1)
    assert d0.cov.shape == (1, h, w, 1)
    assert m01.flow.shape == (1, h, w, 2)
    assert m01.cov.shape == (1, h, w, 3)
    # GT modifiers on the GT oracle => zero error => zero covariance.
    assert float(jnp.nanmax(d0.cov)) == 0.0
    assert float(jnp.nanmax(m01.cov)) == 0.0


def test_frontend_compose(frames):
    f0, f1 = frames
    fe = FrontendCompose(ns({
        "depth": {"type": "GTDepth", "args": {}},
        "match": {"type": "GTMatcher", "args": {}},
    }))
    assert fe.provide_cov == (False, False)
    d1, m01 = fe.estimate_pair(f0.stereo, f1.stereo)
    assert d1.depth.shape[0] == 1 and m01.flow.shape[-1] == 2
    d0, d1b, _ = fe.estimate_triplet(f0.stereo, f1.stereo)
    np.testing.assert_allclose(np.asarray(d1b.depth), np.asarray(d1.depth))


def test_retrieve_pixels(frames, outputs):
    f0, _ = frames
    d0, _, _ = outputs
    uv = jnp.array([[10, 20], [100, 80]], dtype=jnp.int32)
    vals = retrieve_pixels(uv, d0.depth)
    assert vals.shape == (2, 1)
    expected = np.asarray(d0.depth)[0, 20, 10, 0]
    assert float(vals[0, 0]) == pytest.approx(expected)
    assert retrieve_pixels(uv, None) is None


@pytest.mark.parametrize("sel_cfg", [
    {"type": "RandomSelector", "args": {"mask_width": 16}},
    {"type": "GridSelector", "args": {"mask_width": 16}},
    {"type": "GradientSelector", "args": {"mask_width": 16, "grad_std": 1.0}},
    {"type": "SparseGradientSelector", "args": {"mask_width": 16, "grad_std": 0.5, "nms_size": 3}},
])
def test_selector_contract(frames, outputs, sel_cfg):
    from macvo_tpu.modules import IKeypointSelector

    f0, _ = frames
    d0, d1, m01 = outputs
    IKeypointSelector.is_valid_config(ns(sel_cfg))
    sel = IKeypointSelector.instantiate(sel_cfg["type"], ns(sel_cfg["args"]))
    uv, valid = sel.select_point(f0.stereo, 64, d0, d1, m01)
    assert uv.shape == (64, 2) and valid.shape == (64,)
    uv_np, valid_np = np.asarray(uv), np.asarray(valid)
    w, h = f0.stereo.width, f0.stereo.height
    sel_uv = uv_np[valid_np]
    assert (sel_uv[:, 0] >= 16).all() and (sel_uv[:, 0] < w - 16).all()
    assert (sel_uv[:, 1] >= 16).all() and (sel_uv[:, 1] < h - 16).all()


def test_cov_aware_selector(frames, outputs):
    f0, _ = frames
    d0, d1, m01 = outputs
    # Build synthetic covariance maps with a clear quality structure.
    h, w = f0.stereo.height, f0.stereo.width
    rng = np.random.default_rng(0)
    cov_map = jnp.asarray(rng.uniform(0.01, 1.0, (1, h, w, 1)).astype(np.float32))
    d0 = d0.__class__(depth=d0.depth, cov=cov_map)
    d1 = d1.__class__(depth=d1.depth, cov=cov_map)
    sel = CovAwareSelector(ns({
        "mask_width": 16, "max_depth": "auto", "kernel_size": 3,
        "max_depth_cov": 100.0, "max_match_cov": 100.0,
    }))
    uv, valid = sel.select_point(f0.stereo, 32, d0, d1, None)
    assert uv.shape == (32, 2)
    assert int(np.asarray(valid).sum()) > 0


def test_selector_compose(frames, outputs):
    f0, _ = frames
    d0, d1, m01 = outputs
    sel = SelectorCompose(ns({
        "selector_args": [
            {"type": "RandomSelector", "args": {"mask_width": 8}},
            {"type": "GridSelector", "args": {"mask_width": 8}},
        ],
        "weight": [1.0, 1.0],
    }))
    uv, valid = sel.select_point(f0.stereo, 64, d0, d1, m01)
    assert uv.shape == (64, 2)


def _obs(n=8):
    return {
        "pixel1_d": jnp.full((n, 1), 5.0),
        "pixel2_d": jnp.full((n, 1), 5.0),
        "pixel1_d_cov": jnp.full((n, 1), 0.01),
        "pixel2_d_cov": jnp.full((n, 1), 0.01),
        "obs1_covTc": jnp.broadcast_to(jnp.eye(3), (n, 3, 3)),
        "obs2_covTc": jnp.broadcast_to(jnp.eye(3), (n, 3, 3)),
    }


def test_filters():
    obs = {k: np.asarray(v).copy() for k, v in _obs().items()}
    obs["pixel1_d"][0] = 1000.0        # too far
    obs["obs2_covTc"][1] = np.nan      # insane cov
    obs["pixel2_d_cov"][2] = 9.0       # 5 - 2*3 < 0 (maybe behind camera)
    obs = {k: jnp.asarray(v) for k, v in obs.items()}

    f = FilterCompose(ns({"filter_args": [
        {"type": "CovarianceSanityFilter", "args": {}},
        {"type": "SimpleDepthFilter", "args": {"min_depth": 0.1, "max_depth": 100.0}},
        {"type": "LikelyFrontOfCamFilter", "args": {}},
    ]}))
    assert f.verify_shape(_obs())
    mask = np.asarray(f.filter(obs))
    assert not mask[0] and not mask[1] and not mask[2]
    assert mask[3:].all()


def test_match_covariance_oracle(frames, outputs):
    """On a constant-depth region, weighted depth variance ~ 0, so the 3x3 cov
    reduces to the closed-form projection of the flow cov."""
    f0, _ = frames
    d0, _, _ = outputs
    model = MatchCovariance(ns({
        "kernel_size": 5, "match_cov_default": 0.25,
        "min_flow_cov": 0.25, "min_depth_cov": 0.0001,
    }))
    kp = jnp.array([[50.0, 60.0], [80.0, 40.0]])
    cov = model.estimate(f0.stereo, kp, d0, None, None)
    assert cov.shape == (2, 3, 3) and cov.dtype == jnp.float64
    cov_np = np.asarray(cov)
    assert np.isfinite(cov_np).all()
    # symmetry + positive diagonal
    np.testing.assert_allclose(cov_np, np.swapaxes(cov_np, 1, 2), atol=1e-12)
    assert (np.diagonal(cov_np, axis1=1, axis2=2) > 0).all()


def test_no_covariance_and_diagonalize(frames, outputs):
    f0, _ = frames
    d0, _, _ = outputs
    kp = jnp.array([[50.0, 60.0]])
    base = NoCovariance(ns({}))
    np.testing.assert_allclose(np.asarray(base.estimate(f0.stereo, kp, d0, None, None))[0], np.eye(3))
    mod = Modifier_Diagonalize(ns({
        "type": "MatchCovariance",
        "args": {"kernel_size": 5, "match_cov_default": 0.25, "min_flow_cov": 0.25, "min_depth_cov": 0.01},
    }))
    cov = np.asarray(mod.estimate(f0.stereo, kp, d0, None, None))[0]
    assert cov[0, 1] == 0 and cov[0, 2] == 0 and cov[1, 2] == 0
