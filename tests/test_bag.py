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


def test_mcap_save_read_roundtrip(tmp_path):
    """Self-contained MCAP storage (ref: bag_packet_source.py:59-130 reads
    .mcap via rosbags): write chunkless MCAP, read it back via
    open_source."""
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    from ouster_sdk_tpu.io.save import save_scans

    src = open_source(PCAP)
    sets = list(src)
    out = str(tmp_path / "rt.mcap")
    n = save_scans(out, src.sensor_info, sets)
    assert n >= 1

    back = open_source(out)
    a = sets[0].valid()[0]
    b = list(back)[0].valid()[0]
    assert b.frame_id == a.frame_id
    np.testing.assert_array_equal(b.field(ChanField.RANGE),
                                  a.field(ChanField.RANGE))
    assert back.sensor_info[0].sn == src.sensor_info[0].sn


def test_mcap_zstd_chunked_read(tmp_path):
    """Chunked+zstd MCAP (what rosbag2 writes by default) also reads."""
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    import struct
    import zstandard

    from ouster_sdk_tpu.io.bag import (McapBagReader, McapBagWriter,
                                       _MCAP_MAGIC, _OP_CHUNK)
    from ouster_sdk_tpu.io.save import scan_to_packets

    src = open_source(PCAP)
    info = src.sensor_info[0]
    scan = list(src)[0].valid()[0]

    plain = str(tmp_path / "plain.mcap")
    w = McapBagWriter(plain)
    ts = 1
    w.write_string("/os0/metadata", info.to_json_string(), ts)
    pkts = [p.tobytes() for p in scan_to_packets(scan, info)]
    for i, p in enumerate(pkts):
        w.write_packet("/os0/lidar_packets", p, ts + 1 + i)
    w.close()

    # re-wrap all records after the header into one zstd chunk
    with open(plain, "rb") as f:
        data = f.read()
    pos = len(_MCAP_MAGIC)
    op, ln = data[pos], struct.unpack_from("<Q", data, pos + 1)[0]
    header_rec = data[pos:pos + 9 + ln]
    inner = data[pos + 9 + ln:-(len(_MCAP_MAGIC))]
    comp = zstandard.ZstdCompressor().compress(inner)
    chunk_body = struct.pack("<QQQI", 0, 0, len(inner), 0) + \
        struct.pack("<I", 4) + b"zstd" + struct.pack("<Q", len(comp)) + comp
    chunked = str(tmp_path / "chunked.mcap")
    with open(chunked, "wb") as f:
        f.write(_MCAP_MAGIC + header_rec +
                struct.pack("<BQ", _OP_CHUNK, len(chunk_body)) +
                chunk_body + _MCAP_MAGIC)

    r = McapBagReader(chunked)
    msgs = list(r.messages())
    assert len(msgs) == 1 + len(pkts)
    back = open_source(chunked)
    b = list(back)[0].valid()[0]
    np.testing.assert_array_equal(b.field(ChanField.RANGE),
                                  scan.field(ChanField.RANGE))


def test_ros1_writer_emits_standard_index(tmp_path):
    """The written bag carries the rosbag v2.0 index: backfilled header
    (index_pos/conn_count/chunk_count), post-chunk connection records,
    INDEX_DATA per connection and a CHUNK_INFO record, with canonical
    ROS md5sums (std_msgs/String md5 == md5('string data'))."""
    import hashlib
    import struct

    from ouster_sdk_tpu.io.bag import (Ros1BagReader, Ros1BagWriter,
                                       _parse_header)

    path = str(tmp_path / "ix.bag")
    w = Ros1BagWriter(path)
    w.write_string("/os_node/metadata", '{"x":1}', 10**9)
    for k in range(5):
        w.write_packet("/os_node/lidar_packets", b"\x01" * 64,
                       10**9 + k)
    w.close()

    data = open(path, "rb").read()
    pos = data.index(b"\n") + 1
    hlen = struct.unpack_from("<I", data, pos)[0]
    hdr = _parse_header(data[pos + 4:pos + 4 + hlen])
    index_pos = struct.unpack("<Q", hdr[b"index_pos"])[0]
    assert struct.unpack("<I", hdr[b"conn_count"])[0] == 2
    assert struct.unpack("<I", hdr[b"chunk_count"])[0] == 1
    assert index_pos > 0

    ops = []
    pos = index_pos
    while pos + 4 <= len(data):
        hlen = struct.unpack_from("<I", data, pos)[0]
        h = _parse_header(data[pos + 4:pos + 4 + hlen])
        pos += 4 + hlen
        dlen = struct.unpack_from("<I", data, pos)[0]
        d = data[pos + 4:pos + 4 + dlen]
        pos += 4 + dlen
        ops.append(h[b"op"][0])
        if h[b"op"][0] == 6:  # CHUNK_INFO: per-conn message counts
            n = struct.unpack("<I", h[b"count"])[0]
            counts = dict(struct.unpack_from("<II", d, 8 * i)
                          for i in range(n))
            assert counts == {0: 1, 1: 5}
    assert ops == [7, 7, 6]

    assert hashlib.md5(b"string data").hexdigest() == \
        "992ce8a1687cec8c8bd883ec73ca41d1"  # canonical std_msgs/String
    assert len(list(Ros1BagReader(path).messages())) == 6
