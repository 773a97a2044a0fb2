"""Domain-randomized scene generator correctness (data/datasets/randomized.py).

The GT contract is what training depends on: flow must map frame-a pixels to
photometrically identical frame-b pixels (textures are view-independent and
the light is static), the occlusion mask must hide disoccluded pixels, and the
depth/disparity geometry must be consistent with the stereo baseline.
"""

import numpy as np
import pytest

from macvo_tpu.data.datasets.randomized import RandomizedStereo


@pytest.fixture(scope="module")
def seq():
    return RandomizedStereo({"n_frames": 3, "width": 256, "height": 192,
                             "fx": 128.0, "fy": 128.0, "seed": 3})


def _bilinear(img: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """img (H,W,C), sample at float (u,v) — east-down convention."""
    H, W = img.shape[:2]
    u0 = np.clip(np.floor(u).astype(int), 0, W - 2)
    v0 = np.clip(np.floor(v).astype(int), 0, H - 2)
    fu, fv = u - u0, v - v0
    out = (img[v0, u0] * ((1 - fu) * (1 - fv))[..., None]
           + img[v0, u0 + 1] * (fu * (1 - fv))[..., None]
           + img[v0 + 1, u0] * ((1 - fu) * fv)[..., None]
           + img[v0 + 1, u0 + 1] * (fu * fv)[..., None])
    return out


def test_shapes_and_ranges(seq):
    f = seq[0]
    s = f.stereo
    assert s.imageL.shape == (1, 192, 256, 3)
    assert s.gt_depth.shape == (1, 192, 256, 1)
    assert s.gt_flow.shape == (1, 192, 256, 2)
    assert 0.0 <= float(s.imageL.min()) and float(s.imageL.max()) <= 1.0
    assert float(s.flow_mask.mean()) > 0.5, "most pixels should be trackable"
    assert np.isfinite(np.asarray(s.gt_flow)).all()


def test_flow_photometric_consistency(seq):
    """Warp frame t+1 back by GT flow: matches frame t on valid pixels."""
    f0, f1 = seq[0], seq[1]
    imgA = np.asarray(f0.stereo.imageL[0])
    imgB = np.asarray(f1.stereo.imageL[0])
    flow = np.asarray(f0.stereo.gt_flow[0])
    valid = np.asarray(f0.stereo.flow_mask[0, ..., 0]) > 0.5
    H, W = imgA.shape[:2]
    u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    warped = _bilinear(imgB, u + flow[..., 0], v + flow[..., 1])
    err = np.abs(warped - imgA).mean(-1)
    # bilinear blur + texture frequency keep this from being exact; the mean
    # over ~40k valid pixels must still be tight if flow/occlusion are correct
    assert float(err[valid].mean()) < 0.035, float(err[valid].mean())
    # control: zero flow must be much worse (scene moves)
    base = np.abs(imgB - imgA).mean(-1)
    assert err[valid].mean() < 0.5 * base[valid].mean()


def test_stereo_disparity_consistency(seq):
    """Right image sampled at u - fx*b/d matches the left image."""
    f = seq[0]
    s = f.stereo
    imgL = np.asarray(s.imageL[0])
    imgR = np.asarray(s.imageR[0])
    depth = np.asarray(s.gt_depth[0, ..., 0])
    disp = 128.0 * 0.25 / np.maximum(depth, 1e-6)
    H, W = imgL.shape[:2]
    u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    us = u - disp
    inb = (us >= 0) & (us <= W - 1) & (depth < 1e4)
    warped = _bilinear(imgR, us, v)
    err = np.abs(warped - imgL).mean(-1)
    # stereo has its own disocclusions (no mask computed) — use the median
    assert float(np.median(err[inb])) < 0.02, float(np.median(err[inb]))


def test_depth_statistics_outdoor(seq):
    """Bimodal outdoor depth like the real asset: near structure + far sky."""
    d = np.asarray(seq[0].stereo.gt_depth[0, ..., 0])
    assert (d < 60).mean() > 0.2, "some near structure"
    assert (d > 1000).mean() > 0.05, "some sky at effectively infinite range"


def test_seed_determinism_and_diversity():
    a1 = RandomizedStereo({"n_frames": 2, "width": 64, "height": 48, "seed": 11})
    a2 = RandomizedStereo({"n_frames": 2, "width": 64, "height": 48, "seed": 11})
    b = RandomizedStereo({"n_frames": 2, "width": 64, "height": 48, "seed": 12})
    np.testing.assert_array_equal(a1[0].stereo.imageL, a2[0].stereo.imageL)
    assert np.abs(np.asarray(a1[0].stereo.imageL) - np.asarray(b[0].stereo.imageL)).mean() > 0.01
