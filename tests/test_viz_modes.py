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
