"""Error handler threading through sources (ref: ouster_client/include/
ouster/error_handler.h, reader_base.cpp:34-66 version gate,
fb_common.cpp:249-331 field-skip warnings, reader.cpp:391-395 corrupt
chunk recovery)."""

import glob
import os
import struct

import numpy as np
import pytest

from ouster_sdk_tpu import ChanField, LidarMode, LidarScan, SensorInfo
from ouster_sdk_tpu.core.error_handler import (
    Severity,
    default_error_handler,
    logging_error_handler,
)
from ouster_sdk_tpu.io.osf import OSF_VERSION, OsfScanSource, Reader, Writer
from ouster_sdk_tpu.io.sources import open_source

OSF_FIXTURE = \
    "/root/reference/tests/osfs/OS-0-128_v3.0.1_1024x10_20241017_141645.osf"
PCAP_DIR = "/root/reference/tests/pcaps"


def _write_small_osf(path):
    info = SensorInfo.from_default(LidarMode.from_string("512x10"))
    info.format.pixels_per_column = 32
    info.format.pixel_shift_by_row = [0] * 32
    info.beam_azimuth_angles = info.beam_azimuth_angles[:32]
    info.beam_altitude_angles = info.beam_altitude_angles[:32]
    s = LidarScan(info)
    s.frame_id = 1
    s.field(ChanField.RANGE)[:] = 7
    s.status[:] = 1
    s.packet_timestamp[:] = 1000
    with Writer(path) as w:
        w.add_sensor(info)
        w.save(0, s)
    return info


def _patch_header_version(path, version):
    """Rewrite the header fb's version scalar in place (u64 little-endian
    holding OSF_VERSION), then refresh the block CRC."""
    import zlib

    data = bytearray(open(path, "rb").read())
    size = struct.unpack_from("<I", data, 0)[0]
    old = struct.pack("<Q", OSF_VERSION)
    idx = bytes(data[: 4 + size]).find(old)
    assert idx > 0, "version scalar not found in header block"
    data[idx: idx + 8] = struct.pack("<Q", version)
    data[4 + size: 8 + size] = struct.pack(
        "<I", zlib.crc32(bytes(data[: 4 + size])))
    open(path, "wb").write(bytes(data))


def test_newer_major_version_fatal_by_default(tmp_path):
    path = str(tmp_path / "future.osf")
    _write_small_osf(path)
    _patch_header_version(path, 30)  # pretend schema 3.0
    with pytest.raises(RuntimeError, match="major version"):
        Reader(path)


def test_newer_major_version_with_custom_handler(tmp_path):
    path = str(tmp_path / "future2.osf")
    _write_small_osf(path)
    _patch_header_version(path, 30)
    seen = []
    r = Reader(path, lambda sev, msg: seen.append((sev, msg)))
    assert seen and seen[0][0] == Severity.ERROR
    # best-effort read still works: same schema, only the version differs
    scans = [m.decode() for m in r.messages() if m.is_lidar_scan()]
    assert scans and scans[0].frame_id == 1


def test_newer_minor_version_warns(tmp_path):
    path = str(tmp_path / "minor.osf")
    _write_small_osf(path)
    _patch_header_version(path, OSF_VERSION + 1)
    seen = []
    Reader(path, lambda sev, msg: seen.append(sev))
    assert seen == [Severity.WARNING]


def test_corrupt_chunk_skipped_with_custom_handler(tmp_path):
    path = str(tmp_path / "corrupt.osf")
    _write_small_osf(path)
    data = bytearray(open(path, "rb").read())
    hdr_size = struct.unpack_from("<I", data, 0)[0]
    # flip a byte inside the first chunk (past its 12-byte frame prefix)
    data[hdr_size + 8 + 40] ^= 0xFF
    open(path, "wb").write(bytes(data))

    seen = []
    r = Reader(path, lambda sev, msg: seen.append((sev, msg)))
    msgs = list(r.messages())
    assert msgs == []  # corrupt chunk dropped, iteration continued
    assert any(s == Severity.ERROR and "CRC" in m for s, m in seen)


def test_undecodable_field_skipped(tmp_path):
    path = str(tmp_path / "badfield.osf")
    _write_small_osf(path)
    data = bytearray(open(path, "rb").read())
    # corrupt the PNG payload of the encoded RANGE channel but fix up the
    # chunk CRC so only field decode fails
    import zlib

    # the builder serializes back-to-front, so RANGE (encoded first) is the
    # LAST PNG in file order
    idx = bytes(data).rfind(b"IDAT")
    assert idx > 0
    data[idx + 10] ^= 0xFF  # inside the zlib stream
    hdr_size = struct.unpack_from("<I", data, 0)[0]
    chunk_off = 4 + hdr_size + 4
    chunk_size = struct.unpack_from("<I", data, chunk_off)[0]
    data[chunk_off + 4 + chunk_size: chunk_off + 8 + chunk_size] = \
        struct.pack("<I", zlib.crc32(
            bytes(data[chunk_off: chunk_off + 4 + chunk_size])))
    open(path, "wb").write(bytes(data))

    seen = []
    r = Reader(path, lambda sev, msg: seen.append((sev, msg)))
    scans = [m.decode() for m in r.messages() if m.is_lidar_scan()]
    assert scans and not scans[0].has_field(ChanField.RANGE)
    assert any(s == Severity.WARNING and "RANGE" in m for s, m in seen)


def test_open_source_threads_error_handler(tmp_path):
    path = str(tmp_path / "ok.osf")
    _write_small_osf(path)
    _patch_header_version(path, OSF_VERSION + 1)
    seen = []
    src = open_source(path,
                      error_handler=lambda sev, msg: seen.append(sev))
    assert seen == [Severity.WARNING]
    assert len(list(src)) == 1
    src.close()


def test_pcap_id_mismatch_reported():
    pcaps = sorted(glob.glob(os.path.join(PCAP_DIR, "OS-2-128*.pcap")))
    if not pcaps:
        pytest.skip("fixture missing")
    from ouster_sdk_tpu.io.pcap_source import PcapPacketSource
    from ouster_sdk_tpu.core.metadata import sensor_info_from_metadata

    with open(os.path.splitext(pcaps[0])[0] + ".json") as f:
        info = sensor_info_from_metadata(f.read())
    info.init_id = 1  # force id mismatch on every packet
    info.sn = 2
    seen = []
    src = PcapPacketSource(pcaps[0], sensor_infos=[info],
                           error_handler=lambda s, m: seen.append((s, m)))
    pkts = list(src)
    lidar = [p for _, p in pkts if p.type().value == "Lidar"]
    assert lidar == []  # all dropped without soft_id_check
    assert seen and seen[0][0] == Severity.WARNING \
        and "mismatched" in seen[0][1]


def test_default_handler_semantics(caplog):
    import logging

    with caplog.at_level(logging.WARNING, logger="ouster_sdk_tpu"):
        default_error_handler(Severity.WARNING, "just a warning")
    with pytest.raises(RuntimeError):
        default_error_handler(Severity.ERROR, "fatal")
    logging_error_handler(Severity.ERROR, "never raises")
