"""ROS1 bag backend: reference fixture read, save->read roundtrip, and
ScanSource index helpers (ref: python/src/ouster/sdk/bag/, fixture
tests/bags/512x10_raw.bag, plugins/source_save.py bag save)."""

import os

import numpy as np
import pytest

from ouster_sdk_tpu import ChanField
from ouster_sdk_tpu.io.sources import open_source

BAG = "/root/reference/tests/bags/512x10_raw.bag"
PCAP = "/root/reference/tests/pcaps/OS-0-128-U1_v2.3.0_1024x10.pcap"


def test_read_reference_bag():
    if not os.path.exists(BAG):
        pytest.skip("fixture missing")
    src = open_source(BAG)
    sets = list(src)
    assert sets
    scan = sets[0].valid()[0]
    assert (scan.field(ChanField.RANGE) > 0).any()


def test_bag_save_read_roundtrip(tmp_path):
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    from ouster_sdk_tpu.io.save import save_scans

    src = open_source(PCAP)
    sets = list(src)
    out = str(tmp_path / "rt.bag")
    n = save_scans(out, src.sensor_info, sets)
    assert n >= 1

    back = open_source(out)
    back_sets = list(back)
    assert len(back_sets) == len(sets)
    a = sets[0].valid()[0]
    b = back_sets[0].valid()[0]
    assert b.frame_id == a.frame_id
    np.testing.assert_array_equal(b.field(ChanField.RANGE),
                                  a.field(ChanField.RANGE))
    # metadata travels on the /osN/metadata topic
    assert back.sensor_info[0].sn == src.sensor_info[0].sn


def test_size_hint_and_individual_index():
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    src = open_source(PCAP, index=True)
    assert src.size_hint() == len(src)
    idx = src.individual_index()
    assert len(idx) == len(src.sensor_info)
    assert idx[0] == [i for i in range(len(src))
                      if src[i][0] is not None]

    live_like = open_source(PCAP)  # non-indexed pcap source
    if not live_like.is_indexed:
        with pytest.raises(TypeError):
            live_like.individual_index()


# -- ROS2 (rosbag2 sqlite3) --------------------------------------------------
# (ref: bag/bag_packet_source.py:19,27-35 — reference reads ROS2 .db3 bags)

def test_ros2_db3_save_read_roundtrip(tmp_path):
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    from ouster_sdk_tpu.io.save import save_scans

    src = open_source(PCAP)
    sets = list(src)
    out = str(tmp_path / "rt.db3")
    n = save_scans(out, src.sensor_info, sets)
    assert n >= 1

    back = open_source(out)
    back_sets = list(back)
    assert len(back_sets) == len(sets)
    a = sets[0].valid()[0]
    b = back_sets[0].valid()[0]
    assert b.frame_id == a.frame_id
    np.testing.assert_array_equal(b.field(ChanField.RANGE),
                                  a.field(ChanField.RANGE))
    assert back.sensor_info[0].sn == src.sensor_info[0].sn


def test_ros2_directory_bag(tmp_path):
    """Directory-style rosbag2 (name_0.db3 + metadata.yaml), like a real
    `ros2 bag record` output."""
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    from ouster_sdk_tpu.io.save import save_scans
    from ouster_sdk_tpu.io.sources import IoType, io_type

    src = open_source(PCAP)
    sets = list(src)
    out = str(tmp_path / "recording.bag")
    from ouster_sdk_tpu.io.bag import Ros2BagWriter
    from ouster_sdk_tpu.io.save import scan_to_packets

    w = Ros2BagWriter(out)
    info = src.sensor_info[0]
    scan = sets[0].valid()[0]
    ts = int(scan.first_valid_column_timestamp() or 1)
    w.write_string("/os0/metadata", info.to_json_string(), ts)
    for i, pkt in enumerate(scan_to_packets(scan, info)):
        w.write_packet("/os0/lidar_packets", pkt.tobytes(), ts + i)
    w.close()

    assert os.path.isdir(out)
    assert os.path.exists(os.path.join(out, "metadata.yaml"))
    assert io_type(out) == IoType.BAG

    back = open_source(out)
    b = list(back)[0].valid()[0]
    np.testing.assert_array_equal(b.field(ChanField.RANGE),
                                  scan.field(ChanField.RANGE))


def test_ros1_ros2_cross_consistency(tmp_path):
    """The same scans written as ROS1 and ROS2 bags read back identically."""
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    from ouster_sdk_tpu.io.save import save_scans

    src = open_source(PCAP)
    sets = list(src)
    p1 = str(tmp_path / "a.bag")
    p2 = str(tmp_path / "a.db3")
    save_scans(p1, src.sensor_info, sets)
    save_scans(p2, src.sensor_info, sets)
    s1 = list(open_source(p1))[0].valid()[0]
    s2 = list(open_source(p2))[0].valid()[0]
    for f in s1.fields:
        np.testing.assert_array_equal(s1.field(f), s2.field(f))
    np.testing.assert_array_equal(s1.timestamp, s2.timestamp)
