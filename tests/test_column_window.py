"""Azimuth window semantics: lidar_packets_per_frame, complete(),
batching with restricted windows (ref: types.h:849-856, lidar_scan.h:700,
scan_batcher_test window cases)."""

import numpy as np
import pytest

from ouster_sdk_tpu import (
    ChanField,
    DataFormat,
    LidarMode,
    LidarPacket,
    LidarScan,
    PacketWriter,
    ScanBatcher,
    SensorInfo,
)
from ouster_sdk_tpu.core.types import UDPProfileLidar


def test_packets_per_frame_windows():
    fmt = DataFormat(pixels_per_column=32, columns_per_packet=16,
                     columns_per_frame=1024,
                     pixel_shift_by_row=[0] * 32,
                     column_window=(0, 1023))
    assert fmt.lidar_packets_per_frame() == 64
    fmt.column_window = (0, 15)
    assert fmt.lidar_packets_per_frame() == 1
    fmt.column_window = (8, 24)      # spans two packets
    assert fmt.lidar_packets_per_frame() == 2
    fmt.column_window = (1008, 15)   # wrapped window
    assert fmt.lidar_packets_per_frame() == 2
    assert fmt.valid_columns_per_frame() == 32


def test_complete_with_window():
    info = SensorInfo.from_default(LidarMode.from_string("512x10"))
    scan = LidarScan(info)
    scan.status[100:200] = 1
    assert scan.complete((100, 199))
    assert not scan.complete((100, 200))
    # wrapped window
    scan.status[:] = 0
    scan.status[500:] = 1
    scan.status[:10] = 1
    assert scan.complete((500, 9))
    assert not scan.complete((499, 9))


def test_batching_windowed_frame_completes():
    """Only packets inside the column window arrive; the scan must still
    complete (ref: batcher expected_lidar_packets from the window)."""
    info = SensorInfo.from_default(LidarMode.from_string("512x10"))
    info.format.udp_profile_lidar = UDPProfileLidar.RNG19_RFL8_SIG16_NIR16
    info.format.column_window = (64, 127)  # packets 4..7 only

    pw = PacketWriter(info.format)
    cpp = pw.columns_per_packet
    b = ScanBatcher(info)
    scan = LidarScan(info)

    done = False
    for p in range(4, 8):
        buf = pw.new_packet()
        pw.set_packet_header(buf, init_id=info.init_id, prod_sn=info.sn)
        pw.set_frame_id(buf, 2)
        m0 = p * cpp
        pw.set_col_headers(
            buf, np.arange(cpp, dtype=np.uint64) + 1 + m0,
            np.arange(cpp, dtype=np.uint16) + m0,
            np.ones(cpp, dtype=np.uint32))
        pw.set_field(buf, ChanField.RANGE,
                     np.full((pw.pixels_per_column, cpp), 777,
                             dtype=np.uint32))
        done = b(LidarPacket(buf.tobytes(), host_timestamp=p + 1), scan)
    assert done, "windowed frame did not complete"
    assert scan.complete(info.format.column_window)
