"""XYZLut API parity tests (ref: python/tests/test_xyzlut.py)."""

import numpy as np
import pytest

from ouster_sdk_tpu import ChanField, LidarMode, SensorInfo, XYZLutFactory, \
    make_xyz_lut


def _info():
    info = SensorInfo.from_default(LidarMode.from_string("1024x10"))
    info.extrinsic = np.array([
        [0, -1, 0, 1.0], [1, 0, 0, 2.0], [0, 0, 1, 0.5], [0, 0, 0, 1]])
    return info


def test_lut_rejects_mixed_angle_table_sizes():
    """Both tables must be per-beam (h) or per-pixel (w*h) — mixed sizes
    get the reference's diagnostic, not a downstream broadcast error
    (ref: xyzlut.cpp 'unexpected scan dimensions')."""
    info = _info()
    h, w = info.h, info.w
    with pytest.raises(ValueError, match="unexpected scan dimensions"):
        make_xyz_lut(
            w, h=h,
            azimuth_angles_deg=np.zeros(h),
            altitude_angles_deg=np.zeros(w * h),
            beam_to_lidar_transform=np.eye(4),
            transform=np.eye(4))


def test_lut_zero_range_is_origin():
    info = _info()
    lut = make_xyz_lut(info)
    rng = np.zeros((info.h, info.w), dtype=np.uint32)
    xyz = lut(rng)
    assert not xyz.any()


def test_lut_extrinsics_transform():
    info = _info()
    lut = make_xyz_lut(info)
    lut_ext = make_xyz_lut(info, use_extrinsics=True)
    rng = np.full((info.h, info.w), 10_000, dtype=np.uint32)
    a = lut(rng)
    b = lut_ext(rng)
    # extrinsic frame = extrinsic matrix applied to the sensor frame
    ext = info.extrinsic
    expected = a @ ext[:3, :3].T + ext[:3, 3]
    np.testing.assert_allclose(b, expected, atol=1e-9)


def test_lut_factory_accepts_scan_and_range():
    from ouster_sdk_tpu.core.lidar_scan import LidarScan

    info = _info()
    proj = XYZLutFactory(info)
    scan = LidarScan(info)
    scan.field(ChanField.RANGE)[:] = 5_000
    a = proj(scan)
    b = proj(scan.field(ChanField.RANGE))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (info.h, info.w, 3)
    # ranges are ~5 m
    d = np.linalg.norm(a, axis=-1)
    assert np.all(np.abs(d - 5.0) < 0.2)


def test_lut_range_magnitude_along_beam():
    info = _info()
    lut = make_xyz_lut(info)
    r1 = np.full((info.h, info.w), 10_000, dtype=np.uint32)
    r2 = np.full((info.h, info.w), 20_000, dtype=np.uint32)
    a = lut(r1)
    b = lut(r2)
    # the range delta moves points along the per-pixel unit direction
    np.testing.assert_allclose(b - a, 10_000 * lut.direction, atol=1e-9)


def test_source_full_index():
    import os

    path = "/root/reference/tests/osfs/OS-1-128_v2.3.0_1024x10_lb_n3.osf"
    if not os.path.exists(path):
        pytest.skip("fixture missing")
    from ouster_sdk_tpu.io.osf import OsfScanSource

    src = OsfScanSource(path)
    fi = src.full_index()
    assert len(fi) == 1 and len(fi[0]) == 3
    ts = [t for t, _ in fi[0]]
    assert ts == sorted(ts)
    lo, hi = src.time_range()
    assert lo <= ts[0] and ts[-1] <= hi
