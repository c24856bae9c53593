"""ScanBatcher semantics under packet loss, duplication and reordering
(ref: tests/scan_batcher_test.cpp)."""

import numpy as np
import pytest

from ouster_sdk_tpu import (
    ChanField,
    LidarMode,
    LidarPacket,
    LidarScan,
    PacketWriter,
    ScanBatcher,
    SensorInfo,
)
from ouster_sdk_tpu.core.types import UDPProfileLidar


def _info():
    info = SensorInfo.from_default(LidarMode.from_string("512x10"))
    info.format.udp_profile_lidar = UDPProfileLidar.RNG19_RFL8_SIG16_NIR16
    return info


def _packets(info, frame_id, base_ts=1000):
    pw = PacketWriter(info.format)
    cpp = pw.columns_per_packet
    rng = np.random.default_rng(frame_id)
    out = []
    for p in range(info.format.columns_per_frame // cpp):
        buf = pw.new_packet()
        pw.set_packet_header(buf, init_id=info.init_id, prod_sn=info.sn)
        pw.set_frame_id(buf, frame_id)
        m0 = p * cpp
        pw.set_col_headers(
            buf, np.arange(cpp, dtype=np.uint64) + base_ts + m0,
            np.arange(cpp, dtype=np.uint16) + m0,
            np.ones(cpp, dtype=np.uint32))
        pw.set_field(buf, ChanField.RANGE,
                     rng.integers(1, 1 << 19,
                                  size=(pw.pixels_per_column, cpp)))
        out.append(LidarPacket(buf.tobytes(), host_timestamp=base_ts + p))
    return out


def test_complete_frame():
    info = _info()
    b = ScanBatcher(info)
    scan = LidarScan(info)
    pkts = _packets(info, 7)
    done = [b(p, scan) for p in pkts]
    assert done[-1] and not any(done[:-1])
    assert scan.complete()
    assert scan.frame_id == 7


def test_dropped_packet_zero_fills():
    info = _info()
    b = ScanBatcher(info)
    scan = LidarScan(info)
    pkts = _packets(info, 3)
    dropped = 5
    for i, p in enumerate(pkts):
        if i != dropped:
            b(p, scan)
    # next frame's first packet releases the incomplete scan
    nxt = _packets(info, 4)
    assert b(nxt[0], scan)
    cpp = info.format.columns_per_packet
    cols = slice(dropped * cpp, (dropped + 1) * cpp)
    assert not scan.field(ChanField.RANGE)[:, cols].any()
    assert not scan.status[cols].any()
    assert not scan.complete()
    # other columns intact
    assert scan.field(ChanField.RANGE)[:, : dropped * cpp].all()


def test_duplicate_packets_after_release_dropped():
    info = _info()
    b = ScanBatcher(info)
    scan = LidarScan(info)
    pkts = _packets(info, 9)
    for p in pkts:
        b(p, scan)
    # scan 9 released (complete); duplicates of frame 9 must be ignored
    assert b(pkts[0], LidarScan(info)) is False


def test_reordered_prev_frame_packet_dropped():
    info = _info()
    b = ScanBatcher(info)
    scan = LidarScan(info)
    prev = _packets(info, 10)
    cur = _packets(info, 11)
    for p in cur[:4]:
        b(p, scan)
    assert scan.frame_id == 11
    rng_before = scan.field(ChanField.RANGE).copy()
    # a straggler from frame 10 arrives: dropped, scan unchanged
    assert b(prev[5], scan) is False
    np.testing.assert_array_equal(scan.field(ChanField.RANGE), rng_before)


def test_new_frame_releases_and_replays_cached_packet():
    info = _info()
    b = ScanBatcher(info)
    scan = LidarScan(info)
    f1 = _packets(info, 20)
    f2 = _packets(info, 21, base_ts=90000)
    for p in f1[:-1]:
        assert b(p, scan) is False
    # first packet of the next frame releases the partial scan...
    assert b(f2[0], scan) is True
    assert scan.frame_id == 20
    # ...and is replayed into the next scan on the following call
    scan2 = LidarScan(info)
    assert b(f2[1], scan2) is False
    assert scan2.frame_id == 21
    cpp = info.format.columns_per_packet
    assert scan2.status[:2 * cpp].all(), "cached packet not replayed"


def test_invalid_columns_zeroed():
    info = _info()
    pw = PacketWriter(info.format)
    b = ScanBatcher(info)
    scan = LidarScan(info)
    pkts = _packets(info, 30)
    # invalidate two columns of packet 2
    buf = np.frombuffer(pkts[2].buf.tobytes(), dtype=np.uint8).copy()
    cpp = pw.columns_per_packet
    statuses = np.ones(cpp, dtype=np.uint32)
    statuses[3] = 0
    statuses[7] = 0
    ts = pw.col_timestamp(buf)
    mids = pw.col_measurement_id(buf)
    pw.set_col_headers(buf, ts, mids, statuses)
    pkts[2] = LidarPacket(buf.tobytes(), host_timestamp=pkts[2].host_timestamp)

    for p in pkts:
        b(p, scan)
    bad_cols = [2 * cpp + 3, 2 * cpp + 7]
    for c in bad_cols:
        assert scan.status[c] == 0
        assert not scan.field(ChanField.RANGE)[:, c].any()
        assert scan.measurement_id[c] == 0
    assert not scan.complete()
    good = 2 * cpp + 4
    assert scan.field(ChanField.RANGE)[:, good].any()


def test_custom_fields_preserved_and_subset_batched():
    """Batching into a scan declaring a field subset + custom fields:
    declared profile fields fill, custom fields keep their data
    (ref: python/tests/test_batching.py:151-198)."""
    from ouster_sdk_tpu.core.field import FieldClass, FieldType

    info = _info()
    fields = [FieldType(ChanField.RANGE, np.uint32, (),
                        FieldClass.PIXEL_FIELD),
              FieldType(ChanField.SIGNAL, np.uint16, (),
                        FieldClass.PIXEL_FIELD),
              FieldType("custom0", np.uint8, (), FieldClass.PIXEL_FIELD),
              FieldType("custom8", np.uint16, (), FieldClass.PIXEL_FIELD)]
    ls = LidarScan(info.format.pixels_per_column,
                   info.format.columns_per_frame, fields)
    for f in ls.fields:
        assert np.count_nonzero(ls.field(f)) == 0
    ls.field("custom8")[:] = 8
    b = ScanBatcher(info)
    for p in _packets(info, 7):
        b(p, ls)
    assert len(list(ls.fields)) == len(fields)
    assert np.count_nonzero(ls.field(ChanField.RANGE)) > 0
    assert np.all(ls.field("custom0") == 0)
    assert np.all(ls.field("custom8") == 8)


def test_incompatible_field_dtype_rejected():
    """A destination dtype too small for the profile's values raises
    (ref: python/tests/test_batching.py:201-225)."""
    from ouster_sdk_tpu.core.field import FieldClass, FieldType

    info = _info()
    ls = LidarScan(info.format.pixels_per_column,
                   info.format.columns_per_frame,
                   [FieldType(ChanField.RANGE, np.uint8, (),
                              FieldClass.PIXEL_FIELD)])
    b = ScanBatcher(info)
    with pytest.raises(ValueError, match="too small"):
        for p in _packets(info, 3):
            b(p, ls)


def test_bad_column_ids_near_block_boundary():
    """Valid columns whose m_ids all point near the frame edge must fall
    back to column parsing without crashing
    (ref: python/tests/test_batching.py:318-348)."""
    from ouster_sdk_tpu.core.types import HeaderType, UDPProfileIMU
    from ouster_sdk_tpu.ops.packet_format import (
        PacketWriter as OpsPacketWriter,
    )

    info = SensorInfo()
    info.format.column_window = (0, 1023)
    info.format.columns_per_frame = 1024
    info.format.columns_per_packet = 16
    info.format.pixels_per_column = 128
    info.format.udp_profile_lidar = \
        UDPProfileLidar.RNG19_RFL8_SIG16_NIR16_DUAL
    info.format.udp_profile_imu = UDPProfileIMU.LEGACY
    info.format.header_type = HeaderType.STANDARD
    w = OpsPacketWriter.from_info(info)
    b = ScanBatcher(info)
    scan = LidarScan(info)
    scan.frame_id = 0
    pkt = LidarPacket(w.lidar_packet_size)   # writable size-overload
    pkt.host_timestamp = 1
    for i in range(info.format.columns_per_packet):
        w.set_col_status(pkt, i, 1)
        w.set_col_measurement_id(pkt, i, 1020)
    b(pkt, scan)
    assert scan.status[1020] == 1
    assert scan.status[1021] == 0
