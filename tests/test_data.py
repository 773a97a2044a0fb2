import numpy as np
import pytest

from macvo_tpu.data import SequenceBase, StereoFrame, smart_transform
from macvo_tpu.data.transform import ScaleFrame
from macvo_tpu.data.datasets.synthetic import SyntheticStereo, write_tartanair_layout
from macvo_tpu.data.datasets.tartanair import TartanAir
from macvo_tpu.geometry import se3


SMALL = {"n_frames": 4, "width": 160, "height": 120, "fx": 80.0, "fy": 80.0}


@pytest.fixture(scope="module")
def synth_seq():
    return SyntheticStereo(dict(SMALL))


def test_synthetic_shapes(synth_seq):
    frame = synth_seq[0]
    s = frame.stereo
    assert s.imageL.shape == (1, 120, 160, 3)
    assert s.imageR.shape == (1, 120, 160, 3)
    assert s.gt_depth.shape == (1, 120, 160, 1)
    assert s.gt_flow.shape == (1, 120, 160, 2)
    assert s.flow_mask.shape == (1, 120, 160, 1)
    assert frame.gt_pose.shape == (1, 7)
    assert float(s.imageL.min()) >= 0.0 and float(s.imageL.max()) <= 1.0
    assert np.all(np.asarray(s.gt_depth) > 0)


def test_synthetic_stereo_disparity_consistent(synth_seq):
    """Disparity implied by GT depth must reproject imageL pixels onto imageR."""
    frame = synth_seq[0]
    s = frame.stereo
    depth = np.asarray(s.gt_depth)[0, ..., 0]
    fx, bl = s.fx, s.frame_baseline
    disparity = fx * bl / depth
    # Sample the right image at (u - disparity, v) and compare to left image.
    H, W = depth.shape
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    ur = u - disparity
    valid = (ur >= 0) & (ur <= W - 1)
    ur0 = np.clip(np.floor(ur).astype(int), 0, W - 1)
    ur1 = np.clip(ur0 + 1, 0, W - 1)
    a = (ur - ur0)[..., None]
    imgR = np.asarray(s.imageR)[0]
    sampled = imgR[v, ur0] * (1 - a) + imgR[v, ur1] * a
    imgL = np.asarray(s.imageL)[0]
    err = np.abs(sampled - imgL)[valid]
    # Planar scene + smooth texture: sub-pixel sampling error stays small.
    assert float(np.median(err)) < 0.03


def test_synthetic_flow_consistent(synth_seq):
    """GT flow must map frame-0 pixels to the correct frame-1 pixels: check by
    sampling frame-1's image at uv+flow and comparing colors."""
    f0, f1 = synth_seq[0], synth_seq[1]
    flow = np.asarray(f0.stereo.gt_flow)[0]
    mask = np.asarray(f0.stereo.flow_mask)[0, ..., 0]
    H, W = mask.shape
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    ut, vt = u + flow[..., 0], v + flow[..., 1]
    valid = mask > 0
    ut0 = np.clip(np.floor(ut).astype(int), 0, W - 1)
    vt0 = np.clip(np.floor(vt).astype(int), 0, H - 1)
    img1 = np.asarray(f1.stereo.imageL)[0]
    img0 = np.asarray(f0.stereo.imageL)[0]
    err = np.abs(img1[vt0, ut0] - img0)[valid]
    assert float(np.median(err)) < 0.05


def test_clip_and_iter(synth_seq):
    seq = SyntheticStereo(dict(SMALL)).clip(1, 4, 2)
    assert len(seq) == 2
    frames = list(seq)
    assert frames[0].frame_idx == 0  # local index restamped
    # underlying data differs between the two frames
    assert not np.allclose(frames[0].stereo.imageL, frames[1].stereo.imageL)


def test_registry_from_config():
    from macvo_tpu.utils.config import build_dynamic_config

    cfg, _ = build_dynamic_config({"type": "SyntheticStereo", "args": dict(SMALL)})
    seq = SequenceBase.from_config(cfg)
    assert isinstance(seq, SyntheticStereo)
    SequenceBase.is_valid_config(cfg)


def test_transforms(synth_seq):
    # Reference divide semantics (Transform.py:62-66): scale 2.0 HALVES the
    # frame — a config ported verbatim from the reference must behave the same.
    trans = [
        {"type": "ScaleFrame", "args": {"scale_u": 2.0, "scale_v": 2.0}},
        {"type": "CenterCropFrame", "args": {"width": 64, "height": 48}},
    ]
    seq = smart_transform(SyntheticStereo(dict(SMALL)), trans)
    frame = seq[0]
    assert frame.stereo.imageL.shape == (1, 48, 64, 3)
    # fx halves; cx: 80/2 = 40, crop (80-64)/2=8 -> 32
    K = np.asarray(frame.stereo.K)[0]
    assert abs(K[0, 0] - 40.0) < 1e-4
    assert abs(K[0, 2] - 32.0) < 1e-4
    # Flow values scaled by 0.5 as well
    assert frame.stereo.gt_flow.shape == (1, 48, 64, 2)


def test_scale_frame_parity_with_reference_semantics(synth_seq):
    """K / flow / GT rescaling parity with the reference's rounded-scale math
    (reference: DataLoader/Transform.py:41-94)."""
    frame = synth_seq[0]
    H, W = 120, 160
    su, sv = 1.5, 1.3  # non-integer targets exercise the rounding path
    out = ScaleFrame({"scale_u": su, "scale_v": sv})(frame)
    tw, th = int(W / su), int(H / sv)
    assert out.stereo.imageL.shape == (1, th, tw, 3)
    r_su, r_sv = W / tw, H / th
    K0 = np.asarray(frame.stereo.K)[0]
    K1 = np.asarray(out.stereo.K)[0]
    np.testing.assert_allclose(K1[0, 0], K0[0, 0] / r_su, rtol=1e-5)
    np.testing.assert_allclose(K1[1, 1], K0[1, 1] / r_sv, rtol=1e-5)
    np.testing.assert_allclose(K1[0, 2], K0[0, 2] / r_su, rtol=1e-5)
    np.testing.assert_allclose(K1[1, 2], K0[1, 2] / r_sv, rtol=1e-5)
    # Flow VALUES divide by the rounded scale (pixels shrink with the image).
    f0 = np.asarray(frame.stereo.gt_flow)
    f1 = np.asarray(out.stereo.gt_flow)
    assert abs(np.nanmax(np.abs(f1[..., 0])) - np.nanmax(np.abs(f0[..., 0])) / r_su) < 0.35
    # Projection consistency: a 3D point projected with K1 lands at u/r_su of
    # its K0 projection.
    pt = np.array([4.0, 0.7, -0.3])  # NED: x forward
    u0 = K0[0, 0] * pt[1] / pt[0] + K0[0, 2]
    u1 = K1[0, 0] * pt[1] / pt[0] + K1[0, 2]
    np.testing.assert_allclose(u1, u0 / r_su, rtol=1e-5)


def test_smart_resize(synth_seq):
    trans = [{"type": "SmartResizeFrame", "args": {"width": 96, "height": 96}}]
    frame = smart_transform(SyntheticStereo(dict(SMALL)), trans)[0]
    assert frame.stereo.imageL.shape == (1, 96, 96, 3)


def test_tartanair_roundtrip(tmp_path, synth_seq):
    """Materialize synthetic sequence in TartanAir v1 layout, reload via the
    real loader, and compare pixel/depth/flow/pose content."""
    out = write_tartanair_layout(tmp_path / "seq", dict(SMALL))
    seq = TartanAir(
        {"root": str(out), "gtFlow": True, "gtDepth": True, "gtPose": True, "compressed": False}
    )
    assert len(seq) == 3  # flow count limits length to n_frames - 1
    frame = seq[0]
    ref = synth_seq[0]
    assert frame.stereo.imageL.shape == ref.stereo.imageL.shape
    # png roundtrip quantizes to 1/255
    assert float(np.abs(frame.stereo.imageL - ref.stereo.imageL).max()) < 2 / 255
    np.testing.assert_allclose(frame.stereo.gt_depth, ref.stereo.gt_depth, atol=1e-5)
    np.testing.assert_allclose(frame.stereo.gt_flow, ref.stereo.gt_flow, atol=1e-5)
    np.testing.assert_allclose(frame.gt_pose, ref.gt_pose, atol=1e-6)


def test_collate(synth_seq):
    batch = StereoFrame.collate([synth_seq[0], synth_seq[1]])
    assert batch.stereo.imageL.shape[0] == 2
    assert batch.gt_pose.shape == (2, 7)


def test_preload_and_prefetch(synth_seq):
    from macvo_tpu.data import DevicePrefetcher

    seq = SyntheticStereo(dict(SMALL)).preload()
    assert len(seq) == 4
    fetched = list(DevicePrefetcher(seq, depth=2))
    assert len(fetched) == 4
    import jax

    assert isinstance(fetched[0].stereo.imageL, jax.Array)


def test_trajectory_is_smooth(synth_seq):
    poses = synth_seq.poses
    steps = np.asarray(se3.log(se3.mul(se3.inv(poses[:-1]), poses[1:])))
    assert np.all(np.linalg.norm(steps[:, :3], axis=-1) < 1.0)
    assert np.all(np.abs(steps[:, 3:]) < 0.2)
