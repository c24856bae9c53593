"""OSF device route: host PNG/zstd decode + device projection.

The OSF replay path's device half (device_engine.OsfDeviceProjector):
decoded RANGE/RANGE2 planes batch through the fused dd-precision device
projection and each scan carries a snapshot-guarded XYZ cache that
XYZLutFactory serves in place of the host f64 re-projection
(ref: osf_scan_source.h:29 — OSF is a first-class ScanSource on the
same hot path as pcap; stream_lidar_scan.h:204 decode stays host-side,
like the reference's libpng path). Tests force the route on CPU via
OUSTER_SDK_TPU_DEVICE_DECODE=1 (same pattern as
tests/test_device_scan_source.py)."""

import os

import numpy as np
import pytest

from ouster_sdk_tpu import ChanField, XYZLutFactory, open_source
from ouster_sdk_tpu.io import device_engine
from ouster_sdk_tpu.io.osf import OsfScanSource, Reader, Writer
from ouster_sdk_tpu.ops.xyzlut import make_xyz_lut

OSF_FIXTURE = \
    "/root/reference/tests/osfs/OS-0-128_v3.0.1_1024x10_20241017_141645.osf"


def _reset_stats():
    for k in device_engine.stats:
        device_engine.stats[k] = 0


@pytest.fixture()
def force_device(monkeypatch):
    monkeypatch.setenv("OUSTER_SDK_TPU_DEVICE_DECODE", "1")
    _reset_stats()


def _fixture_or_skip():
    if not os.path.exists(OSF_FIXTURE):
        pytest.skip("fixture missing")
    return OSF_FIXTURE


def test_osf_iteration_attaches_device_xyz(force_device):
    """Iterating an OSF on a device host runs the projector (batches > 0)
    and every scan's served XYZ is <= 0.5 f32 ulp of the f64 host LUT."""
    src = OsfScanSource(_fixture_or_skip())
    info = src.sensor_info[0]
    lut64 = make_xyz_lut(info)
    n = 0
    for ls_set in src:
        for s in ls_set:
            if s is None:
                continue
            rng = s.field(ChanField.RANGE)
            hit = s.cached_xyz(0, False, rng)
            assert hit is not None, "no device XYZ attached"
            ref = lut64(rng)
            err = np.abs(hit.astype(np.float64) - ref)
            ulp = np.spacing(np.abs(ref).astype(np.float32)) \
                .astype(np.float64)
            assert (err <= np.maximum(ulp * 0.5 + 1e-30, 1e-7)).all(), \
                f"max err {err.max()}"
            n += 1
    assert n > 0
    assert device_engine.stats["osf_batches"] > 0
    assert device_engine.stats["batches"] > 0


def test_xyzlut_factory_serves_cache_and_guards_mutation(force_device):
    src = OsfScanSource(_fixture_or_skip())
    info = src.sensor_info[0]
    proj = XYZLutFactory(info)
    s = next(iter(src)).valid()[0]
    rng = s.field(ChanField.RANGE)
    served = proj(s)
    # the served array IS the f32 cache (cast) — f32 granularity proves
    # the device value was used, not the f64 host path
    cache = s.cached_xyz(0, False, rng)
    np.testing.assert_array_equal(served, cache.astype(np.float64))
    # range array form never consults the cache: exact f64
    host = proj(np.asarray(rng))
    assert np.abs(served - host).max() <= \
        np.spacing(np.abs(host).astype(np.float32)).max()

    # in-place mutation invalidates: the factory falls back to exact f64
    rng_view = s.field(ChanField.RANGE)
    rng_view[:] = np.where(rng_view > 0, rng_view + 7, 0)
    recomputed = proj(s)
    np.testing.assert_array_equal(
        recomputed, make_xyz_lut(info)(s.field(ChanField.RANGE)))

    # kill switch
    os.environ["OUSTER_SDK_TPU_DEVICE_XYZ"] = "0"
    try:
        s2 = src[0].valid()[0]
        served2 = proj(s2)
        np.testing.assert_array_equal(
            served2, make_xyz_lut(info)(s2.field(ChanField.RANGE)))
    finally:
        os.environ.pop("OUSTER_SDK_TPU_DEVICE_XYZ", None)


def test_random_access_and_open_source_route(force_device):
    src = open_source(_fixture_or_skip())
    info = src.sensor_info[0]
    sets = src[0]
    s = sets.valid()[0] if hasattr(sets, "valid") else sets[0]
    assert s.cached_xyz(0, False, s.field(ChanField.RANGE)) is not None
    assert device_engine.stats["osf_batches"] > 0


def test_dual_return_and_collated_write(force_device, tmp_path):
    """A written dual-return OSF (collation stream included by default
    when saved via save_scans path) re-reads with device XYZ on BOTH
    returns."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _make_info

    from ouster_sdk_tpu.core.lidar_scan import LidarScan

    info = _make_info(w=512, h=32, dual=True)
    rng = np.random.default_rng(3)
    scans = []
    for k in range(3):
        s = LidarScan(info)
        s.frame_id = k + 1
        s.status[:] = 1
        s.field(ChanField.RANGE)[:] = rng.integers(
            0, 1 << 19, s.field(ChanField.RANGE).shape, dtype=np.uint32)
        s.field(ChanField.RANGE2)[:] = rng.integers(
            0, 1 << 19, s.field(ChanField.RANGE2).shape, dtype=np.uint32)
        scans.append(s)
    out = str(tmp_path / "dual.osf")
    with Writer(out) as w:
        idx = w.add_sensor(info, scans[0].field_types)
        for k, s in enumerate(scans):
            w.save(idx, s, ts=1000 + k)

    src = OsfScanSource(out)
    lut64 = make_xyz_lut(info)
    got = 0
    for ls_set in src:
        for s in ls_set:
            if s is None:
                continue
            for ret, name in ((0, ChanField.RANGE), (1, ChanField.RANGE2)):
                r = s.field(name)
                hit = s.cached_xyz(ret, False, r)
                assert hit is not None, f"return {ret} missing"
                ref = lut64(r)
                err = np.abs(hit.astype(np.float64) - ref)
                ulp = np.spacing(np.abs(ref).astype(np.float32)) \
                    .astype(np.float64)
                assert (err <= np.maximum(ulp * 0.5 + 1e-30, 1e-7)).all()
            got += 1
    assert got == 3


def test_extrinsics_variant(force_device, tmp_path):
    """A sensor with a non-identity extrinsic gets BOTH frames cached;
    XYZLutFactory(use_extrinsics=True) serves the extrinsics-frame one."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _make_info

    from ouster_sdk_tpu.core.lidar_scan import LidarScan

    info = _make_info(w=512, h=32, dual=False)
    ext = np.eye(4)
    ext[:3, 3] = [1.0, -2.0, 0.5]
    info.extrinsic = ext
    s = LidarScan(info)
    s.frame_id = 1
    s.status[:] = 1
    s.field(ChanField.RANGE)[:] = 5000
    out = str(tmp_path / "ext.osf")
    with Writer(out) as w:
        idx = w.add_sensor(info, s.field_types)
        w.save(idx, s, ts=1000)

    src = OsfScanSource(out, extrinsics=[ext])
    info_r = src.sensor_info[0]
    back = next(iter(src)).valid()[0]
    for use_ext in (False, True):
        rng_b = back.field(ChanField.RANGE)
        hit = back.cached_xyz(0, use_ext, rng_b)
        assert hit is not None, f"use_extrinsics={use_ext} missing"
        ref = make_xyz_lut(info_r, use_ext)(rng_b)
        err = np.abs(hit.astype(np.float64) - ref)
        assert err.max() < 1e-5


def test_policy_off_attaches_nothing(monkeypatch):
    monkeypatch.setenv("OUSTER_SDK_TPU_DEVICE_DECODE", "0")
    _reset_stats()
    src = OsfScanSource(_fixture_or_skip())
    s = next(iter(src)).valid()[0]
    assert s.cached_xyz(0, False, s.field(ChanField.RANGE)) is None
    assert device_engine.stats["osf_batches"] == 0


def test_cli_osf_stats_runs_device_projection(force_device):
    """`source x.osf stats` engages the device projector on device hosts
    (same user-path contract as the pcap route —
    test_device_scan_source.test_cli_stats_runs_device_decode)."""
    from click.testing import CliRunner

    from ouster_sdk_tpu.cli.core import cli

    res = CliRunner().invoke(cli, ["source", _fixture_or_skip(), "stats"])
    assert res.exit_code == 0, res.output
    assert device_engine.stats["osf_batches"] > 0
    assert device_engine.stats["batches"] > 0
