"""OSF collation stream: explicit multi-sensor scan groupings persisted in
the file and replayed exactly on read (ref: ouster_osf/src/
collation_stream.cpp, writer.cpp:284-335 Writer::save(LidarScanSet),
osf_scan_source.cpp:158-250 OsfCollationIteratorImpl)."""

import numpy as np
import pytest

from ouster_sdk_tpu import ChanField, LidarMode, LidarScan, SensorInfo
from ouster_sdk_tpu.io.osf import (
    INVALID_SCAN_ID,
    OsfScanSource,
    Reader,
    Writer,
    decode_collation_msg,
    encode_collation_msg,
)
from ouster_sdk_tpu.io.sources import LidarScanSet


def _info(sn):
    info = SensorInfo.from_default(LidarMode.from_string("512x10"))
    info.format.pixels_per_column = 32
    info.format.pixel_shift_by_row = [0] * 32
    info.beam_azimuth_angles = info.beam_azimuth_angles[:32]
    info.beam_altitude_angles = info.beam_altitude_angles[:32]
    info.sn = sn
    return info


def _scan(info, frame_id, ts):
    rng = np.random.default_rng(frame_id)
    s = LidarScan(info)
    s.frame_id = frame_id
    s.field(ChanField.RANGE)[:] = rng.integers(
        0, 1 << 19, size=(s.h, s.w), dtype=np.uint32)
    s.timestamp[:] = ts + np.arange(s.w, dtype=np.uint64)
    s.status[:] = 1
    s.packet_timestamp[:] = ts
    return s


def test_collation_msg_codec():
    ids = [(0, 3), INVALID_SCAN_ID, (2, 7)]
    fields = {"conf": np.arange(6, dtype=np.float32).reshape(2, 3)}
    buf = encode_collation_msg(ids, fields)
    back_ids, back_fields = decode_collation_msg(buf)
    assert back_ids == ids
    np.testing.assert_array_equal(back_fields["conf"], fields["conf"])


def test_collated_write_read_roundtrip(tmp_path):
    infos = [_info(991), _info(992)]
    out = str(tmp_path / "collated.osf")

    # deliberately irregular grouping: set 1 is missing sensor 1, and the
    # frame ids differ between sensors so timestamp-based re-collation
    # could not reconstruct this grouping by accident
    sets_written = [
        [_scan(infos[0], 10, 1_000), _scan(infos[1], 20, 1_050)],
        [_scan(infos[0], 11, 2_000), None],
        [_scan(infos[0], 12, 3_000), _scan(infos[1], 22, 3_050)],
    ]
    with Writer(out) as w:
        for info in infos:
            w.add_sensor(info)
        for i, scans in enumerate(sets_written):
            ls_set = LidarScanSet(scans)
            ls_set.add_field("set_seq", np.array([i], dtype=np.uint64))
            w.save_set(ls_set)

    src = OsfScanSource(out)
    assert src.is_collated()
    assert len(src) == 3
    sets_read = list(src)
    assert len(sets_read) == 3
    for i, (written, read) in enumerate(zip(sets_written, sets_read)):
        assert read.field("set_seq")[0] == i
        for ws, rs in zip(written, read):
            if ws is None:
                assert rs is None
                continue
            assert rs.frame_id == ws.frame_id
            np.testing.assert_array_equal(rs.field(ChanField.RANGE),
                                          ws.field(ChanField.RANGE))
    # indexed access resolves through the collation index too
    assert src[1][0].frame_id == 11
    assert src[1][1] is None
    src.close()


def test_collation_ignored_when_disabled(tmp_path):
    infos = [_info(993)]
    out = str(tmp_path / "c1.osf")
    with Writer(out) as w:
        w.add_sensor(infos[0])
        w.save_set(LidarScanSet([_scan(infos[0], 1, 500)]))
        w.save_set(LidarScanSet([_scan(infos[0], 2, 600)]))

    # collation metadata present but reader opted out: falls back to
    # timestamp collation over the per-sensor scan streams
    src = OsfScanSource(out, read_collations=False)
    assert not src.is_collated()
    scans = [s for ls_set in src for s in ls_set.valid()]
    assert [s.frame_id for s in scans] == [1, 2]
    src.close()

    r = Reader(out)
    assert r.collation_stream_id is not None
    r.close()


def test_save_set_requires_packet_timestamps(tmp_path):
    info = _info(994)
    out = str(tmp_path / "c2.osf")
    w = Writer(out)
    w.add_sensor(info)
    s = _scan(info, 1, 500)
    s.packet_timestamp[:] = 0
    with pytest.raises(RuntimeError, match="packet timestamps"):
        w.save_set(LidarScanSet([s]))
    w.close()


def test_save_set_size_mismatch(tmp_path):
    info = _info(995)
    out = str(tmp_path / "c3.osf")
    w = Writer(out)
    w.add_sensor(info)
    with pytest.raises(ValueError, match="number of sensor infos"):
        w.save_set(LidarScanSet([None, None]))
    w.close()
