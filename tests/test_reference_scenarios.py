"""Scenario parity with reference python test suites not covered
elsewhere (ref: python/tests/test_resolve_extrinsics.py,
test_lidar_scan_set.py, test_packet_iter.py ichunked_* cases,
test_data.py LidarScan ctor overloads)."""

import os
import weakref
from itertools import count

import numpy as np
import pytest

from ouster_sdk_tpu import LidarScan, LidarScanSet
from ouster_sdk_tpu.io.pcap_source import ichunked_before
from ouster_sdk_tpu.io.sources import open_source

NOEXT = ("/root/reference/tests/pcap_without_extrinsics/"
         "OS-0-128-U1_v2.3.0_10.pcap")
WITHEXT = ("/root/reference/tests/pcap_with_extrinsics/"
           "OS-0-128-U1_v2.3.0_10.pcap")
EXTJ = ("/root/reference/tests/pcap_with_extrinsics/"
        "extrinsic_parameters.json")


def _need(p):
    if not os.path.exists(p):
        pytest.skip("fixture missing")


# -- extrinsics resolution (ref: test_resolve_extrinsics.py) --------------

def test_no_extrinsics_defaults_identity():
    _need(NOEXT)
    ss = open_source(NOEXT)
    np.testing.assert_array_equal(ss.sensor_info[0].extrinsic, np.eye(4))


def test_extrinsics_supplied_as_array():
    _need(NOEXT)
    ss = open_source(NOEXT, extrinsics=[np.ones((4, 4))])
    np.testing.assert_array_equal(ss.sensor_info[0].extrinsic,
                                  np.ones((4, 4)))


def test_extrinsics_supplied_as_file():
    _need(NOEXT)
    _need(EXTJ)
    ss = open_source(NOEXT, extrinsics_file=EXTJ)
    assert (ss.sensor_info[0].extrinsic != np.eye(4)).any()


def test_extrinsics_not_auto_loaded_from_source_dir():
    """A colocated extrinsics file is NOT applied automatically
    (ref: test_resolve_extrinsics.py:40)."""
    _need(WITHEXT)
    ss = open_source(WITHEXT)
    assert (ss.sensor_info[0].extrinsic == np.eye(4)).any()


# -- LidarScanSet API (ref: test_lidar_scan_set.py) ------------------------

def test_scan_set_bindings_surface():
    scans_in = [LidarScan(10, 10), LidarScan(10, 10), None,
                LidarScan(10, 10)]
    c = LidarScanSet(scans_in)
    assert [x for x in c] == scans_in
    assert (c[0].w, c[0].h) == (10, 10)
    assert c[2] is None and len(c) == 4
    c.add_field("zz", np.uint32, (10, 10, 10))
    assert c.has_field("zz")
    c.del_field("zz")
    assert not c.has_field("zz")
    c.add_field("aa", np.uint32, (10, 10, 10))
    c.add_field("cc", np.uint32, (10, 10, 10))
    c.add_field("bb", np.uint32, (10, 10, 10))
    assert c.fields == ["aa", "bb", "cc"]


def test_scan_set_assignment_and_empty_ctor():
    c = LidarScanSet([LidarScan(10, 10), None])
    c[0] = None
    assert len(c) == 2 and c[0] is None
    assert len(LidarScanSet()) == 0


# -- LidarScan ctor overloads (ref: test_data.py:125-135, client.pyi) -----

def test_lidar_scan_ctor_overloads():
    from ouster_sdk_tpu.core.field import FieldClass, FieldType
    from ouster_sdk_tpu.core.types import UDPProfileLidar

    s = LidarScan(1024, 32)            # positional = (h, w)
    assert (s.h, s.w) == (1024, 32)
    assert (LidarScan(w=512, h=16).h, LidarScan(h=16, w=512).w) == (16, 512)
    s = LidarScan(16, 512, UDPProfileLidar.RNG15_RFL8_NIR8)
    assert (s.h, s.w) == (16, 512)
    assert s.has_field("NEAR_IR") and not s.has_field("SIGNAL")
    ft = [FieldType("RANGE", np.uint32, (), FieldClass.PIXEL_FIELD)]
    # field_types overload is ALSO (h, w, ...)-positional — the reference
    # binding's own tests pass pixels_per_column first
    # (ref: test_batching.py:170-172)
    s = LidarScan(16, 512, ft)
    assert (s.h, s.w) == (16, 512) and list(s.fields) == ["RANGE"]


# -- ichunked_before (ref: test_packet_iter.py) ----------------------------

def test_ichunked_single_chunk():
    it = ichunked_before(list(range(10)), lambda _: False)
    assert list(next(it)) == list(range(10))
    assert list(it) == []


def test_ichunked_chunk_per_item():
    it = ichunked_before(list(range(4)), lambda _: True)
    assert [list(c) for c in it] == [[0], [1], [2], [3]]


def test_ichunked_split_at_item():
    it = ichunked_before("abcdef", lambda c: c == "d")
    assert [list(c) for c in it] == [["a", "b", "c"], ["d", "e", "f"]]


def test_ichunked_pred_true_on_first():
    it = ichunked_before([0, 1, 2, 3], lambda c: c % 2 == 0)
    assert [list(c) for c in it] == [[0, 1], [2, 3]]


def test_ichunked_lazy():
    i = -1

    def mycount():
        nonlocal i
        for i in count():
            yield i

    it = ichunked_before(mycount(), lambda x: x % 3 == 0)
    assert next(next(it)) == i == 0   # not eagerly evaluated
    next(it)
    assert i == 3                      # advancing consumes to next split


def test_ichunked_map_to_lists():
    it = ichunked_before(count(), lambda i: i % 3 == 0)
    chunks = map(list, it)
    c0 = next(chunks)
    assert next(chunks) == [3, 4, 5]
    assert c0 == [0, 1, 2]


def test_ichunked_does_not_retain_chunks():
    class Object:
        pass

    objs = [Object() for _ in range(10)]
    consume = iter(objs.pop, objs[0])
    o3 = objs[-3]
    it = ichunked_before(consume, lambda o: o is o3)
    o2 = weakref.ref(objs[-2])
    next(next(it))
    assert o2() is not None
    next(it)
    assert o2() is None   # rest of first chunk deallocated


def test_ichunked_exhausting_chunk_ends_iterator():
    it = ichunked_before(list(range(10)), lambda _: False)
    list(next(it))
    with pytest.raises(StopIteration):
        next(it)


# -- resolve_metadata (ref: test_sdk_utils.py:17-113) ----------------------

def test_resolve_metadata_requires_data_file(tmp_path):
    from ouster_sdk_tpu.utils import resolve_metadata

    with pytest.raises(ValueError, match="must be a path to a file"):
        resolve_metadata("")
    with pytest.raises(ValueError, match="must be a path to a file"):
        resolve_metadata(str(tmp_path))


def test_resolve_metadata_requires_meta_file(tmp_path):
    from ouster_sdk_tpu.utils import resolve_metadata

    data = tmp_path / "data.pcap"
    data.touch()
    with pytest.raises(ValueError, match="metadata parameter"):
        resolve_metadata(str(data), str(tmp_path))


def test_resolve_metadata_needs_common_prefix(tmp_path):
    from ouster_sdk_tpu.utils import resolve_metadata, resolve_metadata_multi

    (tmp_path / "foo").touch()
    (tmp_path / "tmpfile.json").touch()
    assert resolve_metadata(str(tmp_path / "foo")) is None
    assert resolve_metadata_multi(str(tmp_path / "foo")) == []
    (tmp_path / "tmpfile").touch()
    assert resolve_metadata(str(tmp_path / "tmpfile")) == \
        str(tmp_path / "tmpfile.json")


def test_resolve_metadata_multi_distinct_sensors():
    from ouster_sdk_tpu.utils import resolve_metadata_multi

    base = "/root/reference/tests/pcaps/OS-0-128_v3.0.1_1024x10"
    _need(base + ".pcap")
    assert set(resolve_metadata_multi(base + ".pcap")) == \
        {base + ".json", base + ".2.json"}


def test_resolve_metadata_multi_duplicate_sensor_raises():
    from ouster_sdk_tpu.utils import resolve_metadata_multi

    p = ("/root/reference/tests/pcaps/"
         "OS-0-128_v3.0.1_1024x10_20240321_125947.pcap")
    _need(p)
    with pytest.raises(RuntimeError, match="same sensor"):
        resolve_metadata_multi(p)


# -- FUSA profile + CRC (ref: test_parsing.py) ------------------------------

def test_fusa_profile_packet_headers():
    from ouster_sdk_tpu import sensor_info_from_metadata
    from ouster_sdk_tpu.core.packets import LidarPacket
    from ouster_sdk_tpu.core.types import UDPProfileLidar
    from ouster_sdk_tpu.io.pcap_source import PcapPacketSource
    from ouster_sdk_tpu.ops.packet_format import PacketFormat

    base = ("/root/reference/tests/pcaps/"
            "OS-1-128_767798045_1024x10_20230712_120049")
    _need(base + ".pcap")
    si = sensor_info_from_metadata(open(base + ".json").read())
    pf = PacketFormat(si)
    assert pf.udp_profile_lidar == UDPProfileLidar.FUSA_RNG15_RFL8_NIR8_DUAL
    assert si.format.columns_per_packet == 16
    assert si.format.pixels_per_column == 128
    p = next(p for _, p in PcapPacketSource(base + ".pcap",
                                            sensor_infos=[si])
             if isinstance(p, LidarPacket))
    arr = np.frombuffer(p.buf, np.uint8)
    assert pf.packet_type(arr) == 1
    assert pf.frame_id(arr) == 229          # ref: test_parsing.py:41
    assert pf.init_id(arr) == si.init_id
    assert pf.prod_sn(arr) == si.sn


def test_packet_crc_matches_stored():
    from ouster_sdk_tpu import sensor_info_from_metadata
    from ouster_sdk_tpu.core.packets import LidarPacket
    from ouster_sdk_tpu.io.pcap_source import PcapPacketSource
    from ouster_sdk_tpu.ops.packet_format import PacketFormat

    base = "/root/reference/tests/pcaps/crc_test"
    _need(base + ".pcap")
    si = sensor_info_from_metadata(open(base + ".json").read())
    pf = PacketFormat(si)
    count = 0
    for _, p in PcapPacketSource(base + ".pcap", sensor_infos=[si]):
        if isinstance(p, LidarPacket):
            assert pf.crc(p.buf) == pf.calculate_crc(p.buf)
            count += 1
    assert count == 34                      # ref: test_parsing.py:88


# -- open_source edge scenarios (ref: test_open_source.py) -----------------

def test_meta_option_rejected_by_osf():
    from ouster_sdk_tpu.io.sources import SourceURLException

    p = "/root/reference/tests/osfs/OS-1-128_v2.3.0_1024x10_lb_n3.osf"
    _need(p)
    with pytest.raises(SourceURLException,
                       match="Parameter 'meta' not supported"):
        open_source(p, meta=["fake_meta.json"])


def test_open_packet_source_bag_yields_packets():
    from ouster_sdk_tpu.io.sources import open_packet_source

    p = "/root/reference/tests/bags/512x10_raw.bag"
    _need(p)
    idx, packet = next(iter(open_packet_source(p)))
    assert packet.buf is not None and len(packet.buf) > 0


def test_source_with_no_lidar_stream():
    """udp_port_lidar=0 disables the lidar stream: profile OFF, zero
    lidar packets per frame, frames batch from IMU/zone packets with no
    pixel fields (ref: test_open_source.py:157-173,
    metadata.cpp:658-665)."""
    from ouster_sdk_tpu.core.field import FieldClass
    from ouster_sdk_tpu.core.types import UDPProfileLidar

    p = "/root/reference/tests/pcaps/imu_zm_no_lidar.pcap"
    _need(p)
    src = open_source(p)
    info = src.sensor_info[0]
    assert info.format.udp_profile_lidar == UDPProfileLidar.OFF
    assert info.format.lidar_packets_per_frame() == 0
    assert info.format.zone_monitoring_enabled
    scan = next(iter(src))[0]
    names = [ft.name for ft in scan.field_types]
    assert "IMU_PACKET_TIMESTAMP" in names
    assert "ZONE_PACKET_TIMESTAMP" in names
    assert all(ft.field_class != FieldClass.PIXEL_FIELD
               for ft in scan.field_types)
