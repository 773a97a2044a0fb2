"""Covariance-temperature recalibration hook (scripts/fit_cov_temperature.py
+ _FlowFormerRunner._recalibrate): fitted per-band variance temperatures must
scale the predicted covariance inside the jitted forward."""

import json

import numpy as np
import pytest

from macvo_tpu.modules.frontend import IMatcher
from macvo_tpu.utils.config import build_dynamic_config


def _matcher(calib: str):
    cfg, _ = build_dynamic_config({"type": "FlowFormerCovMatcher", "args": {
        "weight": "random:3", "enc_dtype": "fp32", "dec_dtype": "fp32",
        "decoder_depth": 1, "cov_calib": calib}})
    return IMatcher.instantiate(cfg.type, cfg.args)


def _frames(rng):
    from macvo_tpu.data.datasets.synthetic import SyntheticStereo

    seq = SyntheticStereo({"n_frames": 2, "width": 96, "height": 64,
                           "fx": 48.0, "fy": 48.0, "seed": 5})
    return seq[0].stereo, seq[1].stereo


def test_uniform_temperature_scales_variance(tmp_path, rng):
    f0, f1 = _frames(rng)
    raw = _matcher("none").estimate(f0, f1)

    calib = tmp_path / "t.calib.json"
    calib.write_text(json.dumps({
        "log10_sigma_edges": [], "tau2": [4.0]}))
    cal = _matcher(str(calib)).estimate(f0, f1)

    np.testing.assert_allclose(np.asarray(cal.flow), np.asarray(raw.flow))
    np.testing.assert_allclose(
        np.asarray(cal.cov[..., :2]), 4.0 * np.asarray(raw.cov[..., :2]),
        rtol=1e-5)


def test_banded_temperature_routes_by_sigma(tmp_path, rng):
    """Two bands split at the median predicted sigma: small-sigma pixels get
    tau2=1, large-sigma pixels get tau2=9."""
    f0, f1 = _frames(rng)
    raw = _matcher("none").estimate(f0, f1)
    var = np.asarray(raw.cov[..., :2], np.float64)
    log_sigma = 0.5 * np.log10(0.5 * (var[..., 0] + var[..., 1]))
    split = float(np.median(log_sigma))

    calib = tmp_path / "t.calib.json"
    calib.write_text(json.dumps({
        "log10_sigma_edges": [split], "tau2": [1.0, 9.0]}))
    cal = _matcher(str(calib)).estimate(f0, f1)

    ratio = np.asarray(cal.cov[..., 0], np.float64) / np.maximum(var[..., 0], 1e-30)
    lo, hi = log_sigma < split, log_sigma >= split
    assert np.allclose(ratio[lo], 1.0, atol=1e-4), ratio[lo]
    assert np.allclose(ratio[hi], 9.0, rtol=1e-4), ratio[hi]


def test_auto_without_file_is_noop():
    m = _matcher("auto")
    assert m.runner.calib is None


def test_missing_explicit_calib_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        _matcher(str(tmp_path / "missing.calib.json"))
