"""Viz depth (VERDICT r1 missing #6): view-mode/palette cycling, 2D AOI
selection, IMU subplot, pose-optimizer snapshots — all headless snapshot
tests (ref: sdk/viz/model.py:113,194, viz/view_mode.py,
cli/plugins/source_po_viz.py)."""

import os

import numpy as np
import pytest

from ouster_sdk_tpu import ChanField
from ouster_sdk_tpu.io.sources import open_source
from ouster_sdk_tpu.viz.core import (CLOUD_PALETTE_ORDER, COLORMAPS,
                                     LidarScanViz)

PCAP = "/root/reference/tests/pcaps/OS-2-128-U1_v2.3.0_1024x10.pcap"


@pytest.fixture(scope="module")
def sensor_info():
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    from ouster_sdk_tpu import sensor_info_from_metadata
    return sensor_info_from_metadata(
        open(PCAP.replace(".pcap", ".json")).read())


@pytest.fixture(scope="module")
def scan_and_info():
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    src = open_source(PCAP)
    return list(src)[0].valid()[0], src.sensor_info[0]


def test_view_mode_cycling_changes_render(scan_and_info):
    scan, info = scan_and_info
    lsv = LidarScanViz([info])
    frames = []
    names = []
    for _ in range(len(lsv.cloud_modes[0])):
        lsv.update([scan])
        frames.append(lsv.draw())
        names.append(lsv.cloud_mode.name)
        lsv.cycle_cloud_mode()
    # full cycle returns to the first mode
    assert lsv.cloud_mode.name == names[0]
    assert len(set(names)) == len(names), "mode names must be distinct"
    # at least some modes produce visibly different frames
    diffs = [np.abs(frames[0].astype(int) - f.astype(int)).mean()
             for f in frames[1:]]
    assert max(diffs) > 1.0


def test_palette_cycling(scan_and_info):
    scan, info = scan_and_info
    lsv = LidarScanViz([info])
    assert lsv.cloud_palette == CLOUD_PALETTE_ORDER[0]
    seen = {lsv.cycle_cloud_palette()
            for _ in range(len(CLOUD_PALETTE_ORDER))}
    assert seen == set(CLOUD_PALETTE_ORDER)
    for name in CLOUD_PALETTE_ORDER:
        assert COLORMAPS[name].shape == (256, 3)


def test_image_mode_cycling(scan_and_info):
    scan, info = scan_and_info
    lsv = LidarScanViz([info])
    n = len(lsv.image_modes[0])
    names = [lsv.cycle_img_mode(0) for _ in range(n)]
    assert len(set(names)) == n


def test_aoi_selection_stats_and_overlay(scan_and_info):
    scan, info = scan_and_info
    lsv = LidarScanViz([info])
    sel = lsv.select_aoi((10, 100), (40, 200))
    st = sel.stats(scan)
    assert st["num_points"] > 0
    assert 0 < st["min_range_m"] <= st["mean_range_m"] <= st["max_range_m"]
    # mask covers exactly the rectangle's pixel count (staggered)
    assert sel.mask(scan.h, scan.w).sum() == 31 * 101
    lsv.update([scan])
    with_sel = lsv.draw()
    lsv.clear_selections()
    lsv.update([scan])
    without = lsv.draw()
    assert np.abs(with_sel.astype(int) - without.astype(int)).sum() > 0


def test_imu_subplot_renders():
    """Synthesize a scan with IMU fields and check the subplot appears."""
    from ouster_sdk_tpu import LidarScan, LidarMode, SensorInfo
    from ouster_sdk_tpu.core.types import UDPProfileIMU

    info = SensorInfo.from_default(LidarMode.from_string("512x10"))
    info.format.udp_profile_imu = UDPProfileIMU.ACCEL32_GYRO32_NMEA
    info.format.imu_packets_per_frame = 10
    info.format.imu_measurements_per_packet = 8
    scan = LidarScan(info)
    assert scan.has_field(ChanField.IMU_ACC)
    n = scan.field(ChanField.IMU_ACC).shape[0]
    assert n == 80
    t = np.linspace(0, 4 * np.pi, n)
    scan.field(ChanField.IMU_ACC)[:] = np.stack(
        [np.sin(t), np.cos(t), 0.1 * t], axis=1)
    scan.field(ChanField.IMU_GYRO)[:] = np.stack(
        [np.cos(t), -np.sin(t), 0 * t], axis=1)
    scan.field(ChanField.RANGE)[:] = 1000
    scan.status[:] = 1

    lsv = LidarScanViz([info])
    lsv.update([scan])
    with_imu = lsv.draw()
    lsv.show_imu = False
    lsv.update([scan])
    without = lsv.draw()
    assert np.abs(with_imu.astype(int) - without.astype(int)).sum() > 0


def test_refl_mode_normalization_by_fw_version(scan_and_info):
    """fw >= v2.1 -> fixed /255 normalization; older fw -> AutoExposure;
    no metadata -> normalized (ref: viz/view_mode.py:418-455)."""
    import copy

    from ouster_sdk_tpu.viz.view_mode import (ReflMode,
                                              is_norm_reflectivity_mode)

    scan, info = scan_and_info
    mode = ReflMode(info)   # fixture fw is v2.3.0
    assert is_norm_reflectivity_mode(mode)
    key = mode.prepare(scan)
    refl = scan.field(ChanField.REFLECTIVITY)
    # linear /255, not data-dependent auto-exposure
    np.testing.assert_allclose(
        key, np.clip(refl / 255.0, 0, 1), atol=1e-12)

    old = copy.deepcopy(info)
    old.fw_rev = "v2.0.0"
    old.image_rev = "ousteros-image-prod-aries-v2.0.0"
    assert not is_norm_reflectivity_mode(ReflMode(old))
    assert is_norm_reflectivity_mode(ReflMode(None))


def test_simple_mode_names_single_and_dual():
    from ouster_sdk_tpu.viz.view_mode import SimpleMode

    assert SimpleMode(ChanField.NEAR_IR).names == [ChanField.NEAR_IR]
    assert SimpleMode(ChanField.RANGE).names == \
        [ChanField.RANGE, ChanField.RANGE2]


def test_rgb_mode_dtype_normalization(scan_and_info):
    """u8 / 255, u16 / 65535 — brightness must not depend on frame content
    (ref: viz/view_mode.py:238-255)."""
    from ouster_sdk_tpu.core.lidar_scan import FieldClass
    from ouster_sdk_tpu.viz.view_mode import RGBMode

    scan, info = scan_and_info
    scan = scan.copy() if hasattr(scan, "copy") else scan
    import copy as _copy
    scan = _copy.deepcopy(scan)
    rgb16 = np.zeros((scan.h, scan.w, 3), np.uint16)
    rgb16[..., 0] = 300   # dim frame: max well below dtype max
    scan.add_field("rgb16", rgb16, FieldClass.PIXEL_FIELD)
    mode = RGBMode("rgb16")
    assert mode.enabled(scan)
    key = mode.prepare(scan)
    np.testing.assert_allclose(key[..., 0], 300 / 65535.0, atol=1e-9)
    # 2D (non-RGB-shaped) fields are not eligible
    assert not RGBMode(ChanField.RANGE).enabled(scan)


def test_default_cloud_modes_include_flags(sensor_info):
    from ouster_sdk_tpu.viz.view_mode import default_cloud_modes

    names = [m.name for m in default_cloud_modes(sensor_info)]
    assert ChanField.FLAGS in names and "RING" in names


def test_po_viz_snapshots(tmp_path):
    from ouster_sdk_tpu.slam.pose_optimizer import (AbsolutePoseConstraint,
                                                    Node,
                                                    PoseToPoseConstraint)
    from ouster_sdk_tpu.viz.po_viz import save_po_viz_snapshots

    ts = np.arange(10) * 10**8
    before = []
    after = []
    for i, t in enumerate(ts):
        p = np.eye(4)
        p[:3, 3] = [i * 1.0, 0.1 * i * i, 0]
        before.append(Node(int(t), p.copy()))
        p2 = p.copy()
        p2[:3, 3] += [0, -0.05 * i, 0]
        after.append(Node(int(t), p2))
    cons = [AbsolutePoseConstraint(int(ts[0]), np.eye(4)),
            PoseToPoseConstraint(int(ts[0]), int(ts[-1]), np.eye(4))]
    paths = save_po_viz_snapshots(before, after, cons,
                                  str(tmp_path / "po.png"))
    assert len(paths) == 2
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 1000


def test_seekable_invariants():
    """_Seekable keeps absolute indexes stable over a bounded cache
    (ref: sdk/viz/core.py:1031)."""
    from ouster_sdk_tpu.viz.core import _Seekable

    sk = _Seekable(iter(range(10)), maxlen=4)
    assert [next(sk) for _ in range(5)] == [0, 1, 2, 3, 4]
    assert sk.seek(2) and next(sk) == 2
    assert next(sk) == 3 and next(sk) == 4 and next(sk) == 5
    assert not sk.seek(0)       # evicted from the bounded cache
    # forward seek past the read head consumes the source (reference
    # semantics) and the skipped items land in the back-cache
    assert sk.seek(9) and next(sk) == 9
    assert sk.seek(7) and next(sk) == 7
    assert not sk.seek(15)      # beyond the end of the stream


def test_simpleviz_playback_controls(sensor_info):
    """pause_at / seek_relative / resume / modify_rate semantics
    (ref: sdk/viz/core.py:1330-1420)."""
    import threading
    import time

    import ouster_sdk_tpu as o
    from ouster_sdk_tpu.io.sources import LidarScanSet
    from ouster_sdk_tpu.viz.core import SimpleViz

    def sets(n):
        for k in range(n):
            s = o.LidarScan(sensor_info)
            s.field(o.ChanField.RANGE)[:] = 1000 + k
            s.status[:] = 1
            yield LidarScanSet([s])

    sv = SimpleViz([sensor_info], rate=0.0, pause_at=1)
    done = []
    t = threading.Thread(target=lambda: done.append(sv.run(sets(5))))
    t.start()
    deadline = time.monotonic() + 5
    while not sv.paused and time.monotonic() < deadline:
        time.sleep(0.02)
    assert sv.paused
    sv.seek_relative(1)      # single-step while paused
    time.sleep(0.2)
    assert sv.paused
    sv.resume()
    t.join(5)
    assert done and done[0] >= 5
    assert sv.modify_rate(1) in SimpleViz._playback_rates
    with pytest.raises(ValueError):
        SimpleViz([sensor_info], rate=0.33)


def test_live_consumer_drops_when_slow(sensor_info):
    """LiveConsumer keeps a depth-1 queue and counts drops
    (ref: sdk/viz/core.py:1130)."""
    import ouster_sdk_tpu as o
    from ouster_sdk_tpu.io.sources import LidarScanSet
    from ouster_sdk_tpu.viz.core import LiveConsumer

    def sets(n):
        for k in range(n):
            s = o.LidarScan(sensor_info)
            yield LidarScanSet([s])

    lc = LiveConsumer(sets(30))
    got = sum(1 for _ in lc)
    assert got + lc.dropped == 30
