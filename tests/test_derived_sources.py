"""Derived-source parity matrix mirroring the reference scenarios
(ref: python/tests/test_scan_ops.py test_reduce/test_clip/test_mask)."""

import os

import numpy as np
import pytest

from ouster_sdk_tpu import ChanField, LidarScan
from ouster_sdk_tpu.io.derived import (ClippedScanSource, MaskedScanSource,
                                       ReducedScanSource)
from ouster_sdk_tpu.io.sources import open_source
from ouster_sdk_tpu.ops.destagger import destagger

OSF = "/root/reference/tests/osfs/OS-1-128_v2.3.0_1024x10_lb_n3.osf"


@pytest.fixture
def src():
    if not os.path.exists(OSF):
        pytest.skip("fixture missing")
    return open_source(OSF)


def test_reduce_rejects_factor_count_mismatch(src):
    with pytest.raises(ValueError):
        ReducedScanSource(src, [32, 32])


@pytest.mark.parametrize("beams", [0, -1, 7, 100])
def test_reduce_rejects_invalid_factors(src, beams):
    with pytest.raises(ValueError):
        ReducedScanSource(src, [beams])


@pytest.mark.parametrize("beams", [1, 8, 16, 32])
def test_reduce_rewrites_metadata_and_shapes(src, beams):
    red = ReducedScanSource(src, [beams])
    assert red.sensor_info[0].format.pixels_per_column == beams
    normal = [s[0] for s in open_source(OSF) if s]
    reduced = [s[0] for s in red if s]
    for n, r in zip(normal, reduced):
        # scans carry the REDUCED metadata, not the original
        # (ref: test_scan_ops.py:77-83)
        assert r.sensor_info == red.sensor_info[0]
        assert r.sensor_info != n.sensor_info
        assert n.w == r.w and r.h == beams


def test_clip_rejects_inverted_range(src):
    with pytest.raises(ValueError, match="can't be less than"):
        ClippedScanSource(src, [ChanField.RANGE], 5000, 1000)


def test_clip_zeroes_out_of_band(src):
    lower, upper = 5000, 15000
    clipped = ClippedScanSource(src, [ChanField.RANGE], lower, upper)
    for s in clipped:
        arr = s[0].field(ChanField.RANGE)
        nz = arr[arr != 0]
        assert nz.size and nz.min() >= lower and nz.max() <= upper


def _half_mask(src):
    H = src.sensor_info[0].format.pixels_per_column
    W = src.sensor_info[0].format.columns_per_frame
    return np.vstack([np.ones((H // 2, W), np.uint8),
                      np.zeros((H // 2, W), np.uint8)]), H


def test_mask_rejects_count_mismatch(src):
    mask, _ = _half_mask(src)
    with pytest.raises(ValueError, match="number of masks"):
        MaskedScanSource(src, [], [mask] * 2)


def test_mask_applies_in_destaggered_frame_and_copies(src):
    """Masks are authored in destaggered image coordinates; the top half
    stays intact, the bottom half zeroes, and the parent's scans are NOT
    mutated (ref: test_scan_ops.py:135-158 + masked_scan_source.py)."""
    mask, H = _half_mask(src)
    masked = MaskedScanSource(src, [], [mask])
    normal = [s[0] for s in open_source(OSF) if s]
    out = [s[0] for s in masked if s]
    for n, m in zip(normal, out):
        for f in n.fields:
            dn = destagger(n.sensor_info, n.field(f))
            dm = destagger(m.sensor_info, m.field(f))
            assert np.max(dn[:H // 2]) == np.max(dm[:H // 2])
            assert np.max(dn[H // 2:]) != 0 and np.max(dm[H // 2:]) == 0


def test_lidar_scan_copy_constructor(src):
    """LidarScan(LidarScan) deep-copies fields and headers
    (ref: lidar_scan.h copy ctor)."""
    s = next(iter(src))[0]
    c = LidarScan(s)
    assert c is not s and sorted(c.fields) == sorted(s.fields)
    np.testing.assert_array_equal(c.field(ChanField.RANGE),
                                  s.field(ChanField.RANGE))
    c.field(ChanField.RANGE)[:] = 0
    assert s.field(ChanField.RANGE).max() > 0  # deep copy, not a view
    assert c.frame_id == s.frame_id
