"""OSF WRITE-compatibility vs independent implementations.

Every in-repo OSF test round-trips through our own flatbuffers runtime
(utils/flatbuf.py) and numpy codecs, so a systematic writer bug could
stay invisible. These tests read files written by io/osf.py with
implementations that share no code with this repo (tests/osf_oracle.py):
pip `flatbuffers` for the container tables, system libpng for PNG
channels, and the reference's own zpng.cpp (compiled unmodified) for
zPNG channels — the exact layers the real SDK's reader runs
(ref: reader.h:246, png_tools.cpp:589-689, zpng_lidarscan_encoder.cpp).
"""

import os

import numpy as np
import pytest

import osf_oracle as oracle
from ouster_sdk_tpu import ChanField
from ouster_sdk_tpu.core.field import FieldClass
from ouster_sdk_tpu.io.osf import Reader, Writer
from ouster_sdk_tpu.io.sources import LidarScanSet

OSF_DIR = "/root/reference/tests/osfs"
FIXTURE = os.path.join(OSF_DIR, "OS-0-128_v3.0.1_1024x10_20241017_141645.osf")

pytestmark = pytest.mark.skipif(not oracle.HAVE_FB,
                                reason="pip flatbuffers unavailable")


def _fixture_scans():
    if not os.path.exists(FIXTURE):
        pytest.skip("fixture missing")
    r = Reader(FIXTURE)
    info = r.sensor_info[0]
    scans = [m.decode() for m in r.messages() if m.is_lidar_scan()]
    assert scans
    return info, scans


def _check_scans_vs_oracle(scans, parsed):
    assert len(parsed["scans"]) == len(scans)
    for src, got in zip(scans, parsed["scans"]):
        assert got["frame_id"] == src.frame_id
        assert got["frame_status"] == src.frame_status
        np.testing.assert_array_equal(got["timestamp"], src.timestamp)
        np.testing.assert_array_equal(got["measurement_id"],
                                      src.measurement_id)
        np.testing.assert_array_equal(got["status"], src.status)
        np.testing.assert_array_equal(got["packet_timestamp"],
                                      src.packet_timestamp)
        if "pose" in got:
            np.testing.assert_array_equal(got["pose"], src.pose)
        else:  # pose vector omitted on the wire -> identity per column
            np.testing.assert_array_equal(
                src.pose, np.broadcast_to(np.eye(4), src.pose.shape))
        for name in src.fields:
            arr = src.field(name)
            if name in got["fields"]:
                np.testing.assert_array_equal(
                    got["fields"][name], arr, err_msg=name)
            else:
                np.testing.assert_array_equal(
                    got["custom_fields"][name], arr, err_msg=name)


def test_oracle_reads_reference_fixture():
    """Sanity: the oracle itself must agree with our Reader on a file
    written by the REFERENCE SDK (proves the oracle, not us)."""
    info, scans = _fixture_scans()
    parsed = oracle.read_osf(FIXTURE)
    assert parsed["sensors"], "no sensor metadata parsed"
    _check_scans_vs_oracle(scans, parsed)


@pytest.mark.parametrize("encoder", ["png", "zpng"])
def test_written_osf_reads_back_via_oracle(tmp_path, encoder):
    """Files we write must parse with canonical flatbuffers + the real
    decoders (libpng / reference zpng.cpp) and carry identical data."""
    if encoder == "zpng" and oracle.zpng_oracle() is None:
        pytest.skip("zpng oracle unavailable")
    if encoder == "png" and oracle.png_oracle() is None:
        pytest.skip("libpng oracle unavailable")
    info, scans = _fixture_scans()
    out = str(tmp_path / f"writecompat_{encoder}.osf")
    with Writer(out, encoder=encoder) as w:
        idx = w.add_sensor(info, scans[0].field_types)
        for s in scans:
            w.save(idx, s)

    parsed = oracle.read_osf(out)
    # sensor metadata JSON must describe the same sensor
    sid = next(iter(parsed["sensors"]))
    fmt = parsed["sensors"][sid].get("lidar_data_format") or \
        parsed["sensors"][sid].get("data_format")
    assert fmt["pixels_per_column"] == info.format.pixels_per_column
    assert fmt["columns_per_frame"] == info.format.columns_per_frame
    _check_scans_vs_oracle(scans, parsed)


def test_written_custom_fields_read_back_via_oracle(tmp_path):
    """Custom fields of every FIELD_CLASS (pixel/column/scan) must come
    back through the canonical flatbuffers Field tables with shape,
    dtype, class, and bytes intact."""
    info, scans = _fixture_scans()
    scan = scans[0]
    pix = np.linspace(-1, 1, scan.h * scan.w * 3, dtype=np.float32
                      ).reshape(scan.h, scan.w, 3)
    col = np.arange(scan.w, dtype=np.uint64) * 7
    flat = np.array([3.5, -1.25], np.float64)
    scan.add_field("NORMALS", pix, FieldClass.PIXEL_FIELD)
    scan.add_field("COLTAG", col, FieldClass.COLUMN_FIELD)
    scan.add_field("SCANMETA", flat, FieldClass.SCAN_FIELD)

    out = str(tmp_path / "custom.osf")
    with Writer(out) as w:
        idx = w.add_sensor(info)
        w.save(idx, scan)
    parsed = oracle.read_osf(out)
    got = parsed["scans"][0]
    np.testing.assert_array_equal(got["custom_fields"]["NORMALS"], pix)
    np.testing.assert_array_equal(got["custom_fields"]["COLTAG"], col)
    np.testing.assert_array_equal(got["custom_fields"]["SCANMETA"], flat)
    # wire values are the reference FB enum (common.fbs FIELD_CLASS:
    # PIXEL=1, COLUMN=2, PACKET=3, SCAN=4), NOT our internal FieldClass
    assert got["custom_field_classes"]["NORMALS"] == 1
    assert got["custom_field_classes"]["COLTAG"] == 2
    assert got["custom_field_classes"]["SCANMETA"] == 4


def test_written_collation_reads_back_via_oracle(tmp_path):
    """CollationMsg ScanID structs (16-byte alignment!) and set-level
    fields must parse with canonical flatbuffers."""
    info, scans = _fixture_scans()
    out = str(tmp_path / "collated.osf")
    setfield = np.arange(6, dtype=np.float32).reshape(2, 3)
    with Writer(out) as w:
        w.add_sensor(info)
        for k, s in enumerate(scans):
            ls = LidarScanSet([s])
            if k == 0:
                ls.add_field("SETMETA", setfield)
            w.save_set(ls)
    parsed = oracle.read_osf(out)
    assert len(parsed["collations"]) == len(scans)
    for k, c in enumerate(parsed["collations"]):
        assert c["scan_ids"] == [(0, k)]
    np.testing.assert_array_equal(
        parsed["collations"][0]["fields"]["SETMETA"], setfield)
    _check_scans_vs_oracle(scans, parsed)


def test_written_multisensor_collation_invalid_slots(tmp_path):
    """INVALID_SCAN_ID slots (sensor had no scan in the slice) must
    survive the canonical parse."""
    from ouster_sdk_tpu.io.osf import INVALID_SCAN_ID

    info, scans = _fixture_scans()
    if len(scans) < 2:
        pytest.skip("need 2 scans")
    import copy

    info2 = copy.deepcopy(info)
    info2.sn = str(int(info.sn) + 1)
    out = str(tmp_path / "multi.osf")
    with Writer(out) as w:
        w.add_sensor(info)
        w.add_sensor(info2)
        w.save_set(LidarScanSet([scans[0], None]))
        w.save_set(LidarScanSet([None, scans[1]]))
    parsed = oracle.read_osf(out)
    assert parsed["collations"][0]["scan_ids"] == \
        [(0, 0), tuple(INVALID_SCAN_ID)]
    assert parsed["collations"][1]["scan_ids"] == \
        [tuple(INVALID_SCAN_ID), (1, 0)]


# ---------------------------------------------------------------------------
# Reference Reader STREAMING-ORDER semantics (reader.h:884,
# reader.cpp:551-758) — the full C++ Reader can't be compiled here
# (no flatc / flatbuffers C++ headers in the image), so the oracle
# re-implements its exact traversal; see osf_oracle.streaming_order.
# ---------------------------------------------------------------------------

def _multi_stream_file(tmp_path, n_frames=6):
    """Two sensors with interleaved, partially TIED timestamps and small
    chunks, so streaming iteration must genuinely k-way merge across
    per-stream chunk runs."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _make_info

    from ouster_sdk_tpu.core.lidar_scan import LidarScan

    infos = [_make_info(w=512, h=32, dual=False),
             _make_info(w=512, h=32, dual=False)]
    infos[1].sn = infos[1].sn + 1
    out = str(tmp_path / "multistream.osf")
    rng = np.random.default_rng(2)
    expect = []
    # small chunk_size forces one chunk per message -> many chunks per
    # stream -> the merge crosses chunk boundaries constantly
    with Writer(out, chunk_size=1) as w:
        idxs = [w.add_sensor(i, None) for i in infos]
        for k in range(n_frames):
            for si in (0, 1):
                s = LidarScan(infos[si])
                s.frame_id = k + 1
                s.status[:] = 1
                s.field(ChanField.RANGE)[:] = rng.integers(
                    0, 1 << 19, s.field(ChanField.RANGE).shape,
                    dtype=np.uint32)
                # sensor 1 ties sensor 0's ts on even frames, lags odd
                ts = 1000 + 10 * k + (0 if si == 0 or k % 2 == 0 else 3)
                w.save(idxs[si], s, ts=ts)
                expect.append(ts)
    return out, sorted(expect)


def test_streaming_order_matches_reference_traversal(tmp_path):
    """Our Reader.messages() yields the same streaming order the
    reference Reader's MessagesStreamingRange would (oracle traversal),
    including equal-ts interleave up to the reference's own tie
    freedom."""
    out, expect_ts = _multi_stream_file(tmp_path)
    want = oracle.streaming_order(out)
    assert [t for t, _ in want] == expect_ts  # non-decreasing, complete
    got = [(m.ts, m.id) for m in Reader(out).messages()]
    oracle.assert_streaming_equivalent(got, want)


def test_streaming_range_queries_match(tmp_path):
    """Time-range iteration (Reader::messages(a, b), END-INCLUSIVE per
    reader.cpp:755 begin() = [a, b+1)) matches the oracle for interior,
    boundary, tied-ts, and empty ranges."""
    out, expect_ts = _multi_stream_file(tmp_path)
    lo, hi = expect_ts[0], expect_ts[-1]
    cases = [(lo, hi), (lo + 5, hi - 5), (1010, 1033), (1013, 1013),
             (hi + 1, hi + 50), (0, lo - 1)]
    r = Reader(out)
    for a, b in cases:
        got = [(m.ts, m.id) for m in r.messages(a, b)]
        want = oracle.streaming_order(out, a, b)
        oracle.assert_streaming_equivalent(got, want)


def test_streaming_order_reference_fixture():
    """The reference's own capture iterates identically through our
    Reader and the oracle traversal (read-compat direction)."""
    if not os.path.exists(FIXTURE):
        pytest.skip("fixture missing")
    want = oracle.streaming_order(FIXTURE)
    got = [(m.ts, m.id) for m in Reader(FIXTURE).messages()]
    oracle.assert_streaming_equivalent(got, want)


def test_streaming_info_chunk_counts(tmp_path):
    """Every written ChunkInfo.message_count matches the chunk body (the
    oracle asserts while walking StreamingInfo) and every chunk is
    CRC-valid (oracle _block_at verifies)."""
    out, _ = _multi_stream_file(tmp_path)
    assert oracle.streaming_order(out)  # assertions run inside
