"""Tests for RAW_HEADERS capture, zPNG OSF writing, time correction,
digest generation for undigested fixtures."""

import os

import numpy as np
import pytest

from ouster_sdk_tpu import ChanField, LidarScan, PacketFormat, ScanBatcher
from ouster_sdk_tpu.core.field import FieldClass, FieldType
from ouster_sdk_tpu.io.pcap_source import PcapPacketSource

PCAP = "/root/reference/tests/pcaps/OS-2-128-U1_v2.3.0_1024x10.pcap"


def test_raw_headers_capture():
    """RAW_HEADERS packs col header + footer + packet header/footer per
    column (ref: lidar_scan.cpp:1121-1161 PackRawHeadersCol)."""
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    src = PcapPacketSource(PCAP)
    info = src.sensor_info[0]
    pf = PacketFormat.from_info(info)

    rh_rows = (pf.col_header_size + pf.col_footer_size
               + pf.packet_header_size + pf.packet_footer_size)
    scan = LidarScan(info)
    scan.add_field(FieldType(ChanField.RAW_HEADERS, np.uint8,
                             (), FieldClass.PIXEL_FIELD))
    # RAW_HEADERS is (h, w) u8 in our model; rows used = header bytes
    assert scan.field(ChanField.RAW_HEADERS).shape[0] >= rh_rows

    batcher = ScanBatcher(info)
    packets = [p for _, p in src if p.type().value == "Lidar"]
    for p in packets:
        if batcher(p, scan):
            break
    rh = scan.field(ChanField.RAW_HEADERS)
    assert rh.any(), "raw headers not captured"
    # the first 8 bytes of each column are the column timestamp (LE)
    col = scan.first_valid_column()
    ts_bytes = rh[:8, col].copy().view("<u8")[0]
    assert ts_bytes == scan.timestamp[col]


def test_osf_zpng_writer_roundtrip(tmp_path):
    from ouster_sdk_tpu.io.osf import Reader, Writer

    src_path = "/root/reference/tests/osfs/single_scan_016.osf"
    if not os.path.exists(src_path):
        pytest.skip("fixture missing")
    r = Reader(src_path)
    info = r.sensor_info[0]
    scans = [m.decode() for m in r.messages() if m.is_lidar_scan()]

    out = str(tmp_path / "z.osf")
    with Writer(out, encoder="zpng") as w:
        i = w.add_sensor(info, scans[0].field_types)
        for s in scans:
            w.save(i, s, ts=1)
    back = [m.decode() for m in Reader(out).messages()
            if m.is_lidar_scan()]
    for a, b in zip(scans, back):
        for name in a.fields:
            np.testing.assert_array_equal(a.field(name), b.field(name),
                                          err_msg=name)


def test_time_correction():
    from ouster_sdk_tpu import LidarMode, SensorInfo
    from ouster_sdk_tpu.slam.time_correction import (
        ActiveTimeCorrection,
        is_monotonically_increasing,
    )

    assert is_monotonically_increasing(np.array([0, 1, 2, 0, 3]))
    assert not is_monotonically_increasing(np.array([1, 3, 2]))
    assert not is_monotonically_increasing(np.array([1, 1]))

    infos = [SensorInfo.from_default(LidarMode.from_string("512x10"))
             for _ in range(2)]
    atc = ActiveTimeCorrection(infos)

    scans = [LidarScan(i) for i in infos]
    base = 1_000_000_000_000
    for k, s in enumerate(scans):
        s.status[:] = 1
        # sensor 1's clock is 10 s ahead -> unsynchronized
        s.timestamp[:] = np.arange(s.w, dtype=np.uint64) * 100_000 \
            + base + k * 10_000_000_000
        s.packet_timestamp[:] = base + 500  # shared host clock

    offsets = atc.update(scans)
    assert atc._use_packet_offset
    # after correction both sensors' first timestamps agree (host timeline)
    t0 = [s.first_valid_column_timestamp() for s in scans]
    assert abs(t0[0] - t0[1]) < 1_000_000
    atc.reset(scans)
    # offsets removed
    assert scans[1].timestamp[0] == base + 10_000_000_000


def test_recording_packet_source(tmp_path):
    """Pass-through pcap tee (ref: sdk/pcap/packet_iter.py:58
    RecordingPacketSource): yielded packets unchanged, recorded pcap
    replays to the identical packet stream."""
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    from ouster_sdk_tpu.io.pcap_source import RecordingPacketSource

    prefix = str(tmp_path / "rec")
    src = PcapPacketSource(PCAP)
    rec = RecordingPacketSource(src, prefix)
    assert rec.sensor_info is src.sensor_info
    passed = [(idx, bytes(p.buf)) for idx, p in rec]
    rec.close()
    assert passed, "no packets passed through"

    back = PcapPacketSource(f"{prefix}-000.pcap",
                            metadata_paths=[PCAP.replace(".pcap", ".json")])
    replayed = [bytes(p.buf) for _, p in back]
    back.close()
    assert replayed == [b for _, b in passed]


def test_sensor_group_commands_against_emulator():
    """sensor network/live_zones/restart + osf parse CLI commands
    (ref: plugins/source_sensor.py, source_osf.py)."""
    import glob

    from click.testing import CliRunner

    import ouster_sdk_tpu as o
    import ouster_sdk_tpu.__main__  # noqa: F401  (registers groups)
    from ouster_sdk_tpu.cli.core import cli
    from ouster_sdk_tpu.sensor.emulator import SensorEmulator

    meta = open("/root/reference/tests/pcaps/"
                "OS-2-128-U1_v2.3.0_1024x10.json").read()
    info = o.sensor_info_from_metadata(meta)
    emu = SensorEmulator(info, lambda: iter(()), http_port=0)
    emu._http_thread.start()
    host = f"localhost:{emu.http_port}"
    try:
        r = CliRunner().invoke(cli, ["sensor", "network", host])
        assert r.exit_code == 0 and "ipv4" in r.output
        r = CliRunner().invoke(
            cli, ["sensor", "live_zones", host, "2", "5", "--set"])
        assert r.exit_code == 0
        r = CliRunner().invoke(cli, ["sensor", "live_zones", host])
        assert r.exit_code == 0 and "[2, 5]" in r.output
        r = CliRunner().invoke(cli, ["sensor", "restart", host])
        assert r.exit_code == 0
    finally:
        emu._http.shutdown()

    osfs = sorted(glob.glob("/root/reference/tests/osfs/*.osf"))
    if osfs:
        r = CliRunner().invoke(cli, ["osf", "parse", osfs[0]])
        assert r.exit_code == 0 and "streams:" in r.output


def test_big_endian_pcap_native_scan(tmp_path):
    """The native pcap scanner must honor the file's byte order — the
    magic read little-endian is a table key in BOTH orders, so
    endianness comes from the table value (io/frames.py fix)."""
    import shutil
    import struct

    import numpy as np

    from ouster_sdk_tpu.io.frames import FrameReader

    src = "/root/reference/tests/pcaps/OS-2-128-U1_v2.3.0_1024x10.pcap"
    if not os.path.exists(src):
        pytest.skip("fixture missing")
    data = bytearray(open(src, "rb").read())
    gh = struct.unpack("<IHHiIII", bytes(data[:24]))
    data[:24] = struct.pack(">IHHiIII", *gh)
    pos = 24
    while pos + 16 <= len(data):
        f = struct.unpack("<IIII", bytes(data[pos:pos + 16]))
        data[pos:pos + 16] = struct.pack(">IIII", *f)
        pos += 16 + f[2]
    be = str(tmp_path / "be.pcap")
    open(be, "wb").write(bytes(data))
    shutil.copy(src.replace(".pcap", ".json"), str(tmp_path / "be.json"))

    _, frames_le, _ = next(FrameReader(src).iter_chunks(1))
    _, frames_be, _ = next(FrameReader(be).iter_chunks(1))
    np.testing.assert_array_equal(frames_le, frames_be)


def test_planar_fallback_matches_native():
    """iter_planar_chunks' pure-Python fallback is bit-identical to the
    native planar staging (io/frames.py _planar_from_chunks)."""
    import numpy as np

    from ouster_sdk_tpu.io.frames import FrameReader
    from ouster_sdk_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    src = "/root/reference/tests/pcaps/OS-2-128-U1_v2.3.0_1024x10.pcap"
    if not os.path.exists(src):
        pytest.skip("fixture missing")
    fr = FrameReader(src)
    _, p1, h1, _ = next(fr.iter_planar_chunks(1))
    _, p2, h2, _ = next(fr._planar_from_chunks(1, None))
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(h1, h2)


def test_osf_multi_stream_message_interleave(tmp_path):
    """messages() merges per-stream chunks into global timestamp order
    so multi-sensor collation pairs scans (io/osf.py k-way merge fix)."""
    import ouster_sdk_tpu as o
    from ouster_sdk_tpu.io.osf import OsfScanSource, Reader, Writer

    meta = open("/root/reference/tests/pcaps/"
                "OS-2-128-U1_v2.3.0_1024x10.json").read()
    i1 = o.sensor_info_from_metadata(meta)
    i2 = o.sensor_info_from_metadata(meta)
    i2.sn = i1.sn + 1
    path = str(tmp_path / "multi.osf")
    with Writer(path) as w:
        s1, s2 = w.add_sensor(i1), w.add_sensor(i2)
        for k in range(3):
            for sid, off in ((s1, 0), (s2, 50)):
                sc = o.LidarScan(i1)
                sc.status[:] = 1
                sc.timestamp[:] = 1000 + k * 100 + off
                w.save(sid, sc, ts=1000 + k * 100 + off)
    r = Reader(path)
    ts_seq = [m.ts for m in r.messages() if m.is_lidar_scan()]
    assert ts_seq == sorted(ts_seq)
    sets = list(OsfScanSource(path))
    assert [len(s.valid()) for s in sets] == [2, 2, 2]


def test_async_writer_failure_does_not_deadlock(tmp_path):
    """A failing worker drains the queue; close() raises the stored
    exception instead of hanging (io/osf.py AsyncWriter fix)."""
    import ouster_sdk_tpu as o
    from ouster_sdk_tpu.io.osf import AsyncWriter

    meta = open("/root/reference/tests/pcaps/"
                "OS-2-128-U1_v2.3.0_1024x10.json").read()
    info = o.sensor_info_from_metadata(meta)
    w = AsyncWriter(str(tmp_path / "x.osf"))
    sid = w.add_sensor(info)
    # poison the underlying writer so the first save raises in the worker
    w._writer.save = None  # type: ignore[assignment]
    scan = o.LidarScan(info)
    with pytest.raises(RuntimeError):
        # keep feeding until the failure is observed or close() raises
        for _ in range(64):
            w.save(sid, scan, ts=1)
        w.close()
