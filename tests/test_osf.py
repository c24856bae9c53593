"""OSF container tests: read reference fixtures, reject corrupt ones,
write->read roundtrip (ref: ouster_osf tests + tests/osfs fixtures)."""

import glob
import os

import numpy as np
import pytest

from ouster_sdk_tpu.io.osf import OsfScanSource, Reader, Writer
from ouster_sdk_tpu import ChanField

OSF_DIR = "/root/reference/tests/osfs"


def test_read_reference_osf():
    path = os.path.join(OSF_DIR, "OS-0-128_v3.0.1_1024x10_20241017_141645.osf")
    if not os.path.exists(path):
        pytest.skip("fixture missing")
    r = Reader(path)
    assert r.sensor_info, "no sensors parsed"
    info = r.sensor_info[0]
    assert info.format.pixels_per_column == 128
    scans = [m.decode() for m in r.messages() if m.is_lidar_scan()]
    assert scans, "no scans decoded"
    s = scans[0]
    rng = s.field(ChanField.RANGE)
    assert rng.shape == (128, info.format.columns_per_frame)
    assert rng.dtype == np.uint32
    assert (rng > 0).sum() > 1000
    assert s.frame_id >= 0
    assert s.timestamp.any()


def test_read_single_scan_016():
    path = os.path.join(OSF_DIR, "single_scan_016.osf")
    if not os.path.exists(path):
        pytest.skip("fixture missing")
    src = OsfScanSource(path)
    sets = list(src)
    assert len(sets) == 1
    scan = sets[0].valid()[0]
    assert scan.field(ChanField.RANGE).any()
    # indexed access
    assert len(src) == 1
    s0 = src[0].valid()[0]
    assert np.array_equal(s0.field(ChanField.RANGE),
                          scan.field(ChanField.RANGE))


def test_reject_bad_crc():
    path = os.path.join(OSF_DIR, "bad_crc32.osf")
    if not os.path.exists(path):
        pytest.skip("fixture missing")
    with pytest.raises((ValueError, RuntimeError)):
        r = Reader(path)
        # CRC errors may surface lazily during chunk iteration; the
        # default error handler raises on ERROR severity
        for m in r.messages():
            m.decode()


def test_empty_osf_is_readable():
    """An empty-but-finished OSF has a VALID header and zero messages."""
    path = os.path.join(OSF_DIR, "empty_osf.osf")
    if not os.path.exists(path):
        pytest.skip("fixture missing")
    r = Reader(path)
    assert list(r.messages()) == []


def test_bad_encoding_rejected():
    path = os.path.join(OSF_DIR, "bad_encoding.osf")
    if not os.path.exists(path):
        pytest.skip("fixture missing")
    # default handler: undecodable channels are skipped with WARNINGs
    # (ref: fb_common.cpp:305-331); a strict handler can escalate
    from ouster_sdk_tpu.core.error_handler import Severity

    seen = []
    r = Reader(path, lambda sev, msg: seen.append((sev, msg)))
    for m in r.messages():
        m.decode()
    assert seen and all(s == Severity.WARNING for s, _ in seen)
    assert any("bad_encoding" in m for _, m in seen)

    def strict(sev, msg):
        raise ValueError(msg)

    r2 = Reader(path, strict)
    with pytest.raises(ValueError):
        for m in r2.messages():
            m.decode()


def test_write_read_roundtrip(tmp_path):
    src_path = os.path.join(OSF_DIR, "single_scan_016.osf")
    if not os.path.exists(src_path):
        pytest.skip("fixture missing")
    r = Reader(src_path)
    info = r.sensor_info[0]
    scans = [m.decode() for m in r.messages() if m.is_lidar_scan()]

    out = str(tmp_path / "roundtrip.osf")
    with Writer(out) as w:
        idx = w.add_sensor(info, scans[0].field_types)
        for s in scans:
            w.save(idx, s, ts=1000)

    r2 = Reader(out)
    assert len(r2.sensor_info) == 1
    assert r2.sensor_info[0].format == info.format
    back = [m.decode() for m in r2.messages() if m.is_lidar_scan()]
    assert len(back) == len(scans)
    for a, b in zip(scans, back):
        assert a.frame_id == b.frame_id
        assert sorted(a.fields) == sorted(b.fields)
        for name in a.fields:
            np.testing.assert_array_equal(
                a.field(name), b.field(name), err_msg=name)
        np.testing.assert_array_equal(a.timestamp, b.timestamp)
        np.testing.assert_array_equal(a.status, b.status)
        np.testing.assert_array_equal(a.pose, b.pose)


def test_save_scans_preserves_extra_fields(tmp_path):
    """save_scans must not filter scans down to the sensor-default field
    list: fields added upstream (e.g. NORMALS) are preserved, like the
    reference AsyncWriter with empty field_types
    (ref: plugins/source_save.py:148)."""
    src_path = os.path.join(OSF_DIR, "single_scan_016.osf")
    if not os.path.exists(src_path):
        pytest.skip("fixture missing")
    from ouster_sdk_tpu.core.field import FieldClass
    from ouster_sdk_tpu.io.save import save_scans
    from ouster_sdk_tpu.io.sources import LidarScanSet

    r = Reader(src_path)
    info = r.sensor_info[0]
    scan = next(m.decode() for m in r.messages() if m.is_lidar_scan())
    extra = np.linspace(0, 1, scan.h * scan.w * 3, dtype=np.float32
                        ).reshape(scan.h, scan.w, 3)
    scan.add_field("NORMALS", extra, FieldClass.PIXEL_FIELD)

    out = str(tmp_path / "extra.osf")
    n = save_scans(out, [info], iter([LidarScanSet([scan])]))
    assert n == 1
    back = next(m.decode() for m in Reader(out).messages()
                if m.is_lidar_scan())
    assert "NORMALS" in back.fields
    np.testing.assert_array_equal(back.field("NORMALS"), extra)


def test_png_codec_roundtrip():
    from ouster_sdk_tpu.utils import png as P

    rng = np.random.default_rng(1)
    for dtype in (np.uint8, np.uint16, np.uint32, np.uint64):
        img = rng.integers(0, np.iinfo(dtype).max, size=(32, 64),
                           dtype=dtype)
        data = P.encode_field_png(img)
        back = P.decode_field_png(data)
        np.testing.assert_array_equal(back.astype(dtype), img)
