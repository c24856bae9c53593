"""Core LidarScan/FieldType behavioral parity with the reference's
python/tests/test_data.py — the subtle semantics a direct port exposes:
error types, dtype identity in equality, copy-constructor
extension/retraction/cast, packet-header width, char-dtype FieldTypes,
and scan_to_packets' empty-packet rule.
"""

import numpy as np
import pytest

from ouster_sdk_tpu import (
    ChanField,
    FieldType,
    LidarScan,
    LidarMode,
    SensorInfo,
)
from ouster_sdk_tpu.core.field import FieldClass
from ouster_sdk_tpu.core.types import UDPProfileLidar


def test_complete_requires_window_or_info():
    """complete() with no window on an info-less scan raises
    (ref: test_data.py:193-199)."""
    ls = LidarScan(32, 1024)
    with pytest.raises(RuntimeError):
        ls.complete()
    # explicit window works without sensor_info
    ls.status[:] = 0x1
    assert ls.complete((0, 1023))


def test_scan_eq_field_dtype_identity():
    """Scans differing only in a field's dtype are unequal
    (ref: test_data.py:390-409)."""
    ls0 = LidarScan(32, 1024)
    ls1 = LidarScan(32, 1024, UDPProfileLidar.LEGACY)
    ls2 = LidarScan(32, 1024,
                    UDPProfileLidar.RNG19_RFL8_SIG16_NIR16_DUAL)
    ls3 = LidarScan(32, 1024, [FieldType(ChanField.SIGNAL, np.uint32)])
    ls4 = LidarScan(32, 1024, [FieldType(ChanField.SIGNAL, np.uint16)])
    ls5 = LidarScan(32, 1024, [])
    assert ls0 == ls1
    assert not (ls0 != ls1)
    assert ls1 != ls2
    assert ls3 != ls4
    assert ls5 != ls0
    assert ls5 != ls2
    assert ls5 != ls4


def test_scan_copy_extension():
    """Clone with extra desired fields null-pads them
    (ref: test_data.py:495-512)."""
    ls0 = LidarScan(32, 512, [FieldType("custom4", np.uint8)])
    ls0.field("custom4")[:] = 123
    ls1 = LidarScan(ls0, [FieldType("custom0", np.uint32),
                          FieldType("custom4", np.uint8)])
    assert len(list(ls1.fields)) == 2
    assert np.count_nonzero(ls1.field("custom0")) == 0
    assert np.count_nonzero(ls1.field("custom4") == 123) == ls1.h * ls1.w


def test_scan_copy_retraction():
    """Clone with fewer desired fields drops the rest
    (ref: test_data.py:514-535)."""
    ls0 = LidarScan(32, 512, [FieldType("custom0", np.uint32),
                              FieldType("custom4", np.uint8)])
    ls0.field("custom0")[:] = 100
    ls0.field("custom4")[:] = 123
    ls1 = LidarScan(ls0, [FieldType("custom0", np.uint32)])
    assert (ls0.h, ls0.w) == (ls1.h, ls1.w)
    assert len(list(ls1.fields)) == 1
    assert np.count_nonzero(ls1.field("custom0") == 100) == ls1.h * ls1.w
    with pytest.raises(IndexError):
        ls1.field("custom4")


def test_scan_copy_cast():
    """Clone casting between field dtypes truncates elementwise
    (ref: test_data.py:538-563)."""
    ls0 = LidarScan(32, 512, [FieldType("custom0", np.uint32),
                              FieldType("custom4", np.uint8)])
    ls0.field("custom0")[:] = 2 ** 16 - 1
    ls0.field("custom4")[:] = 255
    ls1 = LidarScan(ls0, [FieldType("custom0", np.uint8),
                          FieldType("custom4", np.uint16)])
    assert ls1.field("custom0").dtype == np.uint8
    assert ls1.field("custom4").dtype == np.uint16
    assert np.count_nonzero(ls1.field("custom0") == 255) == ls1.h * ls1.w
    assert np.count_nonzero(ls1.field("custom4") == 255) == ls1.h * ls1.w


def test_missing_field_raises_index_error():
    """std::out_of_range maps to IndexError
    (ref: lidar_scan.cpp:410; test_data.py:812-821)."""
    ls = LidarScan(64, 1024, [])
    assert ChanField.RANGE not in ls.fields
    with pytest.raises(IndexError):
        ls.field(ChanField.RANGE)
    ls.add_field(ChanField.RANGE, np.ones((64, 1024), np.int16))
    assert ls.field(ChanField.RANGE).all()


def test_packet_header_width_rounds_up():
    """Packet headers fit a partial trailing packet
    (ref: test_data.py:824-831)."""
    assert LidarScan(1, 1).packet_count == 1
    assert LidarScan(1, 1024).packet_count == 64
    assert LidarScan(1, 1023).packet_count == 64


def test_zones_access_empty():
    """(ref: test_data.py:834-841)"""
    from ouster_sdk_tpu.zone import ZoneState

    scan = LidarScan(1, 1)
    assert scan.zones is not None
    assert scan.zones.shape == (0,)
    assert scan.zones.dtype == ZoneState.dtype()


def test_fieldtype_dtype_mutable():
    """(ref: test_data.py:782-789)"""
    ft = FieldType(ChanField.RANGE, np.uint32, ())
    assert ft.element_type == np.dtype(np.uint32)
    ft.element_type = np.dtype(np.uint8)
    assert ft.element_type == np.dtype(np.uint8)


def test_fieldtype_char_dtype():
    """Fixed-string dtypes fold their length into the last extra dim
    (ref: test_data.py:792-809; field.cpp:99-124)."""
    ft = FieldType(ChanField.RANGE, np.dtype("S25"), (10,),
                   FieldClass.SCAN_FIELD)
    assert ft.element_type == np.dtype("S25")
    assert tuple(ft.extra_dims) == (10, 25)
    ft.element_type = np.dtype(np.uint8)
    assert ft.element_type == np.dtype(np.uint8)
    assert tuple(ft.extra_dims) == (10,)
    ft.element_type = np.dtype("S30")
    assert ft.element_type == np.dtype("S30")
    assert tuple(ft.extra_dims) == (10, 30)
    ft.element_type = np.dtype("S25")
    assert ft.element_type == np.dtype("S25")
    assert tuple(ft.extra_dims) == (10, 25)


def test_to_string_no_fp_exception():
    """str(LidarScan) on all-zero fields must not trip FP errors
    (ref: test_data.py:642-644)."""
    old = np.seterr(all="raise")
    try:
        str(LidarScan(1024, 128,
                      UDPProfileLidar.RNG19_RFL8_SIG16_NIR16_DUAL))
    finally:
        np.seterr(**old)


def test_scan_to_packets_skips_unreceived_packets():
    """A packet with no valid column and no host timestamp is skipped;
    a fully valid scan re-packetizes completely
    (ref: lidar_scan_impl.h:526-529; test_data.py:629-639)."""
    from ouster_sdk_tpu.utils import scan_to_packets

    info = SensorInfo.from_default(LidarMode.from_string("1024x10"))
    ls = LidarScan(info)
    assert len(scan_to_packets(ls, info)) == 0
    ls.status[:] = 0x1
    expected = info.format.columns_per_frame // \
        info.format.columns_per_packet
    assert len(scan_to_packets(ls, info)) == expected
    # a single valid column keeps exactly its packet
    ls2 = LidarScan(info)
    ls2.status[17] = 0x1
    pkts = scan_to_packets(ls2, info)
    assert len(pkts) == 1


def test_scan_to_packets_roundtrip_headers():
    """Re-packetized frame status / countdowns / alerts survive the
    batcher round-trip (ref: lidar_scan_impl.h:482-510)."""
    from ouster_sdk_tpu import LidarPacket, ScanBatcher
    from ouster_sdk_tpu.utils import scan_to_packets

    info = SensorInfo.from_default(LidarMode.from_string("1024x10"))
    # LEGACY packets carry no thermal/shot header words; use eUDP
    info.format.udp_profile_lidar = \
        UDPProfileLidar.RNG19_RFL8_SIG16_NIR16
    ls = LidarScan(info)
    ls.status[:] = 0x1
    ls.frame_id = 7
    ls.frame_status = (2 << 0) | (3 << 4)  # shutdown=2, shot-limiting=3
    ls.shutdown_countdown = 9
    ls.shot_limiting_countdown = 11
    ls.field(ChanField.RANGE)[:] = 1234
    pkts = scan_to_packets(ls, info)
    out = LidarScan(info)
    batcher = ScanBatcher(info)
    for buf in pkts:
        batcher(LidarPacket(bytes(buf)), out)
    assert out.frame_id == 7
    assert out.frame_status == ls.frame_status
    assert out.shutdown_countdown == 9
    assert out.shot_limiting_countdown == 11
    assert np.array_equal(out.field(ChanField.RANGE),
                          ls.field(ChanField.RANGE))


def test_version_parse_parity():
    """Stage/machine parse from the '<stage>-<machine>-v…' prefix and
    empty components are invalid (ref: types.cpp:751-774;
    python/tests/test_core.py:386-449)."""
    from ouster_sdk_tpu import Version

    v = Version.from_string("ousteros-prod-bootes-v1.2.3-rc1+123456")
    assert (v.major, v.minor, v.patch) == (1, 2, 3)
    assert v.stage == "prod" and v.machine == "bootes"
    assert v.prerelease == "rc1" and v.build == "123456"

    v = Version.from_string(
        "ousteros-image-prod-aries-v2.0.0-rc.2+20201023140416.staging")
    assert (v.major, v.minor, v.patch) == (2, 0, 0)
    assert v.stage == "prod" and v.machine == "aries"
    assert v.prerelease == "rc.2"
    assert v.build == "20201023140416.staging"

    assert Version.from_string("v1.2.3") == Version.from_string("1.2.3")
    assert Version.from_string("1.2.3") != Version.from_string("1.3.3")
    for bad in ("2.3", "a.2.3", "3"):
        v = Version.from_string(bad)
        assert (v.major, v.minor, v.patch) == (0, 0, 0), bad
