"""Device-decode ScanSource route (io/device_engine.py): bit-equality
against the numpy ScanBatcher route, golden-digest conformance, boundary
drop semantics, and proof that the CLI executes device decode.

The device route is the user-facing default on TPU hosts
(ref: open_source.cpp:205-245 — the reference's hot path is its user
path); these tests force it on CPU via OUSTER_SDK_TPU_DEVICE_DECODE=1.
"""

import glob
import json
import os

import numpy as np
import pytest

from ouster_sdk_tpu.io import device_engine
from ouster_sdk_tpu.io.pcap_scan_source import PcapScanSource
from ouster_sdk_tpu.utils import native

PCAP_DIR = "/root/reference/tests/pcaps"

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="no native toolchain")


def _fixtures():
    if not os.path.isdir(PCAP_DIR):
        return []
    out = []
    for p in sorted(glob.glob(os.path.join(PCAP_DIR, "*.pcap"))):
        if os.path.getsize(p) < 1000:
            continue
        base = os.path.splitext(p)[0]
        if not (os.path.exists(base + ".json")
                or glob.glob(base + "*.json")):
            continue
        try:
            src = PcapScanSource(p)
        except Exception:
            continue
        if len(src.sensor_info) != 1:
            continue
        out.append(p)
    return out


FIXTURES = _fixtures()


def _iter_scans(path, force, **kw):
    old = os.environ.get("OUSTER_SDK_TPU_DEVICE_DECODE")
    os.environ["OUSTER_SDK_TPU_DEVICE_DECODE"] = force
    try:
        return [s for _, s in PcapScanSource(path, **kw)._iter_scans()]
    finally:
        if old is None:
            os.environ.pop("OUSTER_SDK_TPU_DEVICE_DECODE", None)
        else:
            os.environ["OUSTER_SDK_TPU_DEVICE_DECODE"] = old


def _assert_scan_equal(a, b, tag=""):
    assert a.frame_id == b.frame_id, tag
    assert sorted(a.fields) == sorted(b.fields), tag
    for name in b.fields:
        np.testing.assert_array_equal(a.field(name), b.field(name),
                                      err_msg=f"{tag}:{name}")
    for attr in ("timestamp", "measurement_id", "status",
                 "packet_timestamp", "alert_flags", "pose"):
        np.testing.assert_array_equal(getattr(a, attr), getattr(b, attr),
                                      err_msg=f"{tag}:{attr}")
    for attr in ("frame_status", "shutdown_countdown",
                 "shot_limiting_countdown"):
        assert getattr(a, attr) == getattr(b, attr), f"{tag}:{attr}"


@pytest.mark.conformance
@pytest.mark.parametrize("pcap", FIXTURES,
                         ids=[os.path.basename(p) for p in FIXTURES])
def test_device_route_matches_batcher(pcap):
    """Every scan (fields + every header array) must be bit-equal between
    the device route and the numpy ScanBatcher route."""
    device_engine.stats["batches"] = 0
    dev = _iter_scans(pcap, "1")
    ref = _iter_scans(pcap, "0")
    if device_engine.stats["batches"] == 0:
        # ineligible capture (legacy / NMEA-IMU / zone): the route must
        # have fallen back to the identical numpy path
        info = PcapScanSource(pcap).sensor_info[0]
        assert not device_engine.supports_device_decode(info)
    assert len(dev) == len(ref)
    for k, (a, b) in enumerate(zip(dev, ref)):
        _assert_scan_equal(a, b, f"{os.path.basename(pcap)}[{k}]")


@pytest.mark.conformance
def test_device_route_digest_conformance():
    """The reference *_digest.json scan hashes must hold bit-exactly for
    scans produced by the device route."""
    from ouster_sdk_tpu.utils.digest import FieldDigest, StreamDigest

    ran = 0
    for dj in sorted(glob.glob(os.path.join(PCAP_DIR, "*_digest.json"))):
        pcap = dj.replace("_digest.json", ".pcap")
        if not os.path.exists(pcap) or os.path.getsize(pcap) < 1000:
            continue
        src = PcapScanSource(pcap)
        if len(src.sensor_info) != 1 or not \
                device_engine.supports_device_decode(src.sensor_info[0]):
            continue
        with open(dj) as f:
            golden = StreamDigest.from_json(f.read())
        device_engine.stats["batches"] = 0
        scans = _iter_scans(pcap, "1")
        assert device_engine.stats["batches"] > 0, pcap
        assert len(scans) == len(golden.scans), pcap
        for g, s in zip(golden.scans, scans):
            g.check(FieldDigest.from_scan(s))
        ran += 1
    if ran == 0:
        pytest.skip("no eligible digest fixtures")


def test_device_route_boundary_semantics(tmp_path):
    """Reordered stragglers and post-release duplicates must be dropped
    exactly like the batcher (native io_released state machine)."""
    from test_batcher_semantics import _info, _packets

    from ouster_sdk_tpu.io.pcap import PcapWriter

    info = _info()
    info.config.udp_port_lidar = 7502  # port 0 parses as lidar-off
    f1 = _packets(info, 10, base_ts=1000)
    f2 = _packets(info, 11, base_ts=2000)
    f3 = _packets(info, 12, base_ts=3000)
    # frame 2 interrupted by stragglers of frame 1 and, right after the
    # release of frame 1, a duplicate of it
    seq = (f1[:-1] + [f2[0]] + [f1[-1]]        # straggler while building f2
           + f2[1:4] + [f1[2]]                  # another straggler
           + f2[4:] + f3)
    path = str(tmp_path / "reorder.pcap")
    with PcapWriter(path) as w:
        ts = 10 ** 9
        for p in seq:
            w.write(p.buf.tobytes(), "10.0.0.1", "10.0.0.2", 7502, 7502,
                    ts)
            ts += 10 ** 5
    meta = str(tmp_path / "reorder.json")
    with open(meta, "w") as f:
        f.write(info.to_json_string())

    device_engine.stats["batches"] = 0
    dev = _iter_scans(path, "1", meta=[meta])
    assert device_engine.stats["batches"] > 0
    ref = _iter_scans(path, "0", meta=[meta])
    assert [s.frame_id for s in dev] == [s.frame_id for s in ref] \
        == [10, 11, 12]
    for k, (a, b) in enumerate(zip(dev, ref)):
        _assert_scan_equal(a, b, f"reorder[{k}]")


def test_device_route_id_check(tmp_path):
    """init_id/serial mismatches must be dropped (counted) unless
    soft_id_check, matching PcapPacketSource validation."""
    from test_batcher_semantics import _info, _packets

    from ouster_sdk_tpu import PacketWriter
    from ouster_sdk_tpu.io.pcap import PcapWriter as PcapW

    info = _info()
    info.config.udp_port_lidar = 7502  # port 0 parses as lidar-off
    info.init_id = 1234
    info.sn = 99887766
    pkts = _packets(info, 5)
    # corrupt two packets' init_id
    pw = PacketWriter(info.format)
    for k in (2, 3):
        buf = np.frombuffer(pkts[k].buf.tobytes(), np.uint8).copy()
        pw.set_packet_header(buf, init_id=info.init_id + 7,
                             prod_sn=info.sn + 1)
        pkts[k] = type(pkts[k])(buf.tobytes(),
                                host_timestamp=pkts[k].host_timestamp)
    path = str(tmp_path / "badid.pcap")
    with PcapW(path) as w:
        ts = 10 ** 9
        for p in pkts:
            w.write(p.buf.tobytes(), "10.0.0.1", "10.0.0.2", 7502, 7502,
                    ts)
            ts += 10 ** 5
    meta = str(tmp_path / "badid.json")
    with open(meta, "w") as f:
        f.write(info.to_json_string())

    for soft in (False, True):
        dev = _iter_scans(path, "1", meta=[meta], soft_id_check=soft)
        ref = _iter_scans(path, "0", meta=[meta], soft_id_check=soft)
        assert len(dev) == len(ref)
        for k, (a, b) in enumerate(zip(dev, ref)):
            _assert_scan_equal(a, b, f"id[{soft}][{k}]")


def test_cli_stats_runs_device_decode(monkeypatch):
    """`source x.pcap stats` must execute device decode when the policy
    allows — the engine is the user path, not a bench sidecar."""
    from click.testing import CliRunner

    from ouster_sdk_tpu.cli.core import cli

    pcap = os.path.join(PCAP_DIR, "OS-2-128-U1_v2.3.0_1024x10.pcap")
    if not os.path.exists(pcap):
        pytest.skip("fixture missing")
    monkeypatch.setenv("OUSTER_SDK_TPU_DEVICE_DECODE", "1")
    device_engine.stats["batches"] = 0
    device_engine.stats["scans"] = 0
    res = CliRunner().invoke(cli, ["source", pcap, "stats"])
    assert res.exit_code == 0, res.output
    assert device_engine.stats["batches"] > 0
    assert device_engine.stats["scans"] > 0


def test_policy_resolution(monkeypatch):
    monkeypatch.setenv("OUSTER_SDK_TPU_DEVICE_DECODE", "1")
    assert device_engine.device_decode_enabled()
    monkeypatch.setenv("OUSTER_SDK_TPU_DEVICE_DECODE", "0")
    assert not device_engine.device_decode_enabled()


# ---------------------------------------------------------------------------
# HYBRID device route: NMEA-imu / zone profiles — lidar fields decode on
# device, aux packets batch host-side by frame id (device_engine._AuxApplier)
# ---------------------------------------------------------------------------

_ZM_PCAP = "/root/reference/tests/pcaps/imu_zm_no_lidar.pcap"
_ZM_META = "/root/reference/tests/pcaps/imu_zm_no_lidar_0.json"


def _hybrid_fixture(tmp_path):
    """Synthesize a capture mixing lidar frames with the fixture's REAL
    imu/zone packets (frame ids patched to the enclosing frame)."""
    import numpy as np

    from _live_helpers import synth_frame_packets
    from ouster_sdk_tpu.core.metadata import sensor_info_from_metadata
    from ouster_sdk_tpu.io.pcap import PcapWriter
    from ouster_sdk_tpu.io.pcap_source import PcapPacketSource

    from ouster_sdk_tpu.core.types import UDPProfileLidar

    with open(_ZM_META) as f:
        info = sensor_info_from_metadata(f.read())
    # the fixture recorded with the lidar stream off; re-enable the
    # ZONE16 pixel profile its config advertises so frames carry data
    info.format.udp_profile_lidar = \
        UDPProfileLidar.RNG19_RFL8_SIG16_NIR16_ZONE16
    info.config.udp_port_lidar = 7512

    aux_raw = [(p.type().value.lower(), p.buf.copy())
               for _, p in PcapPacketSource(_ZM_PCAP,
                                            metadata_paths=[_ZM_META])]
    assert len(aux_raw) == 9  # 8 imu + 1 zone

    def patched(buf, fid):
        b = buf.copy()
        b[2:4] = np.frombuffer(np.uint16(fid).tobytes(), np.uint8)
        return b

    # frames 1..3; frame 2 carries every aux packet
    stream = []  # (kind, payload, ts)
    t = [0]

    def add(kind, payload):
        t[0] += 1_000_00
        stream.append((kind, payload, t[0]))

    for p in synth_frame_packets(info, 1):
        add("lidar", np.frombuffer(p, np.uint8))
    f2 = [np.frombuffer(p, np.uint8)
          for p in synth_frame_packets(info, 2)]
    add("lidar", f2[0])
    for kind, buf in aux_raw:
        add(kind, patched(buf, 2))
    for p in f2[1:]:
        add("lidar", p)
    for p in synth_frame_packets(info, 3):
        add("lidar", np.frombuffer(p, np.uint8))

    path = str(tmp_path / "hybrid.pcap")
    ports = {"lidar": 7512, "imu": info.config.udp_port_imu or 7513,
             "zone": info.config.udp_port_zm or 7514}
    with PcapWriter(path) as w:
        for kind, payload, ts in stream:
            w.write(payload.tobytes(), "127.0.0.1", "127.0.0.1",
                    ports[kind], ports[kind], ts)
    return info, stream, path


def _numpy_scans(info, stream, trailing_flush=True):
    from ouster_sdk_tpu import LidarScan, ScanBatcher
    from ouster_sdk_tpu.core.packets import (ImuPacket, LidarPacket,
                                             ZonePacket)

    import numpy as np

    cls = {"lidar": LidarPacket, "imu": ImuPacket, "zone": ZonePacket}
    b, out = ScanBatcher(info), []
    cur = LidarScan(info)
    for kind, payload, ts in stream:
        if b(cls[kind](payload, ts), cur):
            out.append(cur)
            cur = LidarScan(info)
    # trailing flush like PcapScanSource (pcap_scan_source.py:118-121);
    # the live path has no EOF, so its ground truth skips it
    if trailing_flush and cur.frame_id != -1 and np.any(cur.status & 1):
        out.append(cur)
    return out


def _assert_scans_equal(a, b):
    import numpy as np

    assert a.frame_id == b.frame_id
    assert sorted(a.fields) == sorted(b.fields)
    for f in sorted(a.fields):
        av, bv = a.field(f), b.field(f)
        if av.dtype.names:  # structured (ZONE_STATES)
            for n in av.dtype.names:
                np.testing.assert_array_equal(av[n], bv[n], err_msg=f)
        else:
            np.testing.assert_array_equal(av, bv, err_msg=f)
    np.testing.assert_array_equal(a.timestamp, b.timestamp)
    np.testing.assert_array_equal(a.status, b.status)
    np.testing.assert_array_equal(a.packet_timestamp, b.packet_timestamp)
    assert a.frame_status == b.frame_status
    assert a.shutdown_countdown == b.shutdown_countdown
    assert a.shot_limiting_countdown == b.shot_limiting_countdown


def test_hybrid_pcap_device_route_bit_equal(tmp_path):
    import os

    import pytest

    from ouster_sdk_tpu.io.device_engine import (DeviceScanIterator,
                                                 supports_device_decode)
    from ouster_sdk_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    if not (os.path.exists(_ZM_PCAP) and os.path.exists(_ZM_META)):
        pytest.skip("fixture missing")
    info, stream, path = _hybrid_fixture(tmp_path)
    assert supports_device_decode(info), \
        "NMEA+zone profile should be hybrid-eligible"

    ref = _numpy_scans(info, stream)
    dev = list(DeviceScanIterator(path, info))
    assert [s.frame_id for s in dev] == [s.frame_id for s in ref]
    for a, b in zip(dev, ref):
        _assert_scans_equal(a, b)
    # the aux content actually landed (frame 2 carries imu + zone)
    s2 = next(s for s in dev if s.frame_id == 2)
    assert (s2.field("IMU_TIMESTAMP") > 0).any()
    assert s2.field("ZONE_TIMESTAMP")[0] > 0


def test_hybrid_live_stager_bit_equal(tmp_path):
    import os

    import pytest

    from ouster_sdk_tpu.io.device_engine import LiveDeviceBatcher
    from ouster_sdk_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    if not (os.path.exists(_ZM_PCAP) and os.path.exists(_ZM_META)):
        pytest.skip("fixture missing")
    info, stream, _ = _hybrid_fixture(tmp_path)

    ref = _numpy_scans(info, stream, trailing_flush=False)
    stager = LiveDeviceBatcher(info)
    dev = []
    for kind, payload, ts in stream:
        if kind == "lidar":
            dev.extend(stager.push(payload, ts))
        else:
            dev.extend(stager.push_aux(kind, payload, ts))
    assert [s.frame_id for s in dev] == [s.frame_id for s in ref]
    for a, b in zip(dev, ref):
        _assert_scans_equal(a, b)


# ---------------------------------------------------------------------------
# Hybrid-route admission conformance: the device routes must replicate the
# ScanBatcher state machine (batcher.py:97-139) for aux packets too —
# aux-only frames, stragglers, malformed-imu completion, opener headers,
# frame-id reuse and strict port classification.
# ---------------------------------------------------------------------------


def _require_hybrid():
    import os

    import pytest

    from ouster_sdk_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    if not (os.path.exists(_ZM_PCAP) and os.path.exists(_ZM_META)):
        pytest.skip("fixture missing")


def _write_stream(tmp_path, info, stream, name):
    from ouster_sdk_tpu.io.pcap import PcapWriter

    path = str(tmp_path / name)
    ports = {"lidar": info.config.udp_port_lidar or 7512,
             "imu": info.config.udp_port_imu or 7513,
             "zone": info.config.udp_port_zm or 7514}
    with PcapWriter(path) as w:
        for kind, payload, ts in stream:
            w.write(payload.tobytes(), "127.0.0.1", "127.0.0.1",
                    ports[kind], ports[kind], ts)
    return path


def _run_live(info, stream):
    from ouster_sdk_tpu.io.device_engine import LiveDeviceBatcher

    stager = LiveDeviceBatcher(info)
    dev = []
    for kind, payload, ts in stream:
        if kind == "lidar":
            dev.extend(stager.push(payload, ts))
        else:
            dev.extend(stager.push_aux(kind, payload, ts))
    return dev


def _check_both(tmp_path, info, stream, name):
    """Both device routes (pcap + live) must be bit-equal to the oracle
    on this stream; returns the pcap-route scans for content asserts."""
    from ouster_sdk_tpu.io.device_engine import DeviceScanIterator

    ref = _numpy_scans(info, stream)
    path = _write_stream(tmp_path, info, stream, name)
    dev = list(DeviceScanIterator(path, info))
    assert [s.frame_id for s in dev] == [s.frame_id for s in ref], "pcap"
    for a, b in zip(dev, ref):
        _assert_scans_equal(a, b)

    ref_l = _numpy_scans(info, stream, trailing_flush=False)
    dev_l = _run_live(info, stream)
    assert [s.frame_id for s in dev_l] == \
        [s.frame_id for s in ref_l], "live"
    for a, b in zip(dev_l, ref_l):
        _assert_scans_equal(a, b)
    return dev


def _hybrid_parts(tmp_path):
    """(info, aux_raw, add/stream builder) for scenario streams."""
    import numpy as np

    from ouster_sdk_tpu.core.metadata import sensor_info_from_metadata
    from ouster_sdk_tpu.core.types import UDPProfileLidar
    from ouster_sdk_tpu.io.pcap_source import PcapPacketSource

    with open(_ZM_META) as f:
        info = sensor_info_from_metadata(f.read())
    info.format.udp_profile_lidar = \
        UDPProfileLidar.RNG19_RFL8_SIG16_NIR16_ZONE16
    info.config.udp_port_lidar = 7512
    aux_raw = [(p.type().value.lower(), p.buf.copy())
               for _, p in PcapPacketSource(_ZM_PCAP,
                                            metadata_paths=[_ZM_META])]
    return info, aux_raw


def _patched(buf, fid):
    import numpy as np

    b = buf.copy()
    b[2:4] = np.frombuffer(np.uint16(fid).tobytes(), np.uint8)
    return b


def _stream_builder():
    stream, t = [], [0]

    def add(kind, payload):
        t[0] += 100_000
        stream.append((kind, payload, t[0]))
    return stream, add


def _lidar_frames(info, *fids):
    import numpy as np

    return {fid: [np.frombuffer(p, np.uint8)
                  for p in synth_frame_packets_cached(info, fid)]
            for fid in fids}


_synth_cache = {}


def synth_frame_packets_cached(info, fid):
    from _live_helpers import synth_frame_packets

    # key includes the info OBJECT (not id(info)): holding a strong
    # reference pins its id, so a garbage-collected info from an earlier
    # test can't alias a later one and serve packets of the wrong format
    key = (id(info), fid)
    if key not in _synth_cache:
        _synth_cache[key] = (info, synth_frame_packets(info, fid))
    return _synth_cache[key][1]


def test_hybrid_aux_only_frame_midstream(tmp_path):
    """A frame whose packets are ALL aux must be emitted with zeroed
    lidar fields in release order, like the oracle (batcher.py:123-126),
    not silently discarded."""
    _require_hybrid()
    info, aux_raw = _hybrid_parts(tmp_path)
    frames = _lidar_frames(info, 1, 3)
    stream, add = _stream_builder()
    for p in frames[1]:
        add("lidar", p)
    for kind, buf in aux_raw:
        add(kind, _patched(buf, 2))
    for p in frames[3]:
        add("lidar", p)

    dev = _check_both(tmp_path, info, stream, "aux_only.pcap")
    assert [s.frame_id for s in dev] == [1, 2, 3]
    s2 = dev[1]
    assert (s2.field("RANGE") == 0).all()
    assert (s2.field("IMU_TIMESTAMP") > 0).any()
    assert s2.field("ZONE_TIMESTAMP")[0] > 0


def test_hybrid_straggler_aux_dropped(tmp_path):
    """An aux packet of frame N arriving after frame N+1 opened is a
    reordered straggler the oracle drops (batcher.py:120-121); the pcap
    route must not preload it into scan N."""
    _require_hybrid()
    import numpy as np

    info, aux_raw = _hybrid_parts(tmp_path)
    zone = next(b for k, b in aux_raw if k == "zone")
    straggler = _patched(zone, 1)
    mid = straggler.size // 2
    straggler[mid:mid + 8] ^= np.uint8(0xFF)  # distinct zone content
    frames = _lidar_frames(info, 1, 2, 3)
    stream, add = _stream_builder()
    for p in frames[1][:-1]:
        add("lidar", p)
    add("zone", _patched(zone, 1))            # in-frame zone for frame 1
    add("lidar", frames[1][-1])
    add("lidar", frames[2][0])                # frame 2 opens
    add("zone", straggler)                    # straggler: must drop
    for p in frames[2][1:]:
        add("lidar", p)
    for p in frames[3]:
        add("lidar", p)

    dev = _check_both(tmp_path, info, stream, "straggler.pcap")
    assert [s.frame_id for s in dev] == [1, 2, 3]


def test_hybrid_malformed_imu_does_not_complete(tmp_path):
    """An imu packet whose measurement id is corrupt is rejected by the
    oracle's writer WITHOUT counting toward completion
    (batcher.py:321-328): the frame must stay open for the genuine
    packet that follows."""
    _require_hybrid()
    import numpy as np

    from ouster_sdk_tpu.ops.packet_format import PacketFormat

    info, aux_raw = _hybrid_parts(tmp_path)
    pf = PacketFormat.from_info(info)
    imus = [b for k, b in aux_raw if k == "imu"]
    zone = next(b for k, b in aux_raw if k == "zone")
    assert len(imus) == pf.imu_packets_per_frame == 8

    bad = _patched(imus[-1], 2)
    off = pf.geom.imu_measurement_offset + 8   # measurement 0's m_id
    bad[off:off + 2] = 0xFF                    # packet_id out of range
    frames = _lidar_frames(info, 2, 3)
    stream, add = _stream_builder()
    for p in frames[2]:
        add("lidar", p)
    add("zone", _patched(zone, 2))
    for b in imus[:-1]:
        add("imu", _patched(b, 2))
    add("imu", bad)                            # must NOT complete frame 2
    add("imu", _patched(imus[-1], 2))          # completes frame 2
    for p in frames[3]:
        add("lidar", p)

    dev = _check_both(tmp_path, info, stream, "malformed.pcap")
    assert [s.frame_id for s in dev] == [2, 3]
    # the genuine final imu packet's samples landed
    ref = _numpy_scans(info, stream)
    assert (dev[0].field("IMU_TIMESTAMP")
            == ref[0].field("IMU_TIMESTAMP")).all()


def test_hybrid_aux_opener_frame_status(tmp_path):
    """When an aux packet OPENS the frame, its header supplies
    frame_status / countdowns (batcher.py:115-118) — not the first lidar
    packet's."""
    _require_hybrid()
    import numpy as np

    from ouster_sdk_tpu.ops.packet_format import PacketFormat

    info, aux_raw = _hybrid_parts(tmp_path)
    pf = PacketFormat.from_info(info)
    zone = _patched(next(b for k, b in aux_raw if k == "zone"), 2)

    def set_bits(buf, finfo, value):
        byte, shift = divmod(finfo.bit_start, 8)
        word = int.from_bytes(buf[byte:byte + 8].tobytes(), "little")
        mask = ((1 << finfo.bit_size) - 1) << shift
        word = (word & ~mask) | ((value << shift) & mask)
        buf[byte:byte + 8] = np.frombuffer(
            word.to_bytes(8, "little"), np.uint8)

    set_bits(zone, pf.geom.shot_limiting, 3)
    set_bits(zone, pf.geom.countdown_shot_limiting, 77)
    frames = _lidar_frames(info, 1, 2, 3)
    stream, add = _stream_builder()
    for p in frames[1]:
        add("lidar", p)
    add("zone", zone)                          # OPENS frame 2
    for p in frames[2]:
        add("lidar", p)
    for p in frames[3]:
        add("lidar", p)

    dev = _check_both(tmp_path, info, stream, "opener.pcap")
    s2 = next(s for s in dev if s.frame_id == 2)
    assert s2.frame_status != 0
    assert s2.shot_limiting_countdown == 77


def test_hybrid_foreign_port_imu_rejected(tmp_path):
    """imu-size datagrams on a port other than the configured
    udp_port_imu must be rejected, like the numpy route's strict
    classification (pcap_source.py _classify) — no size-only fallback."""
    _require_hybrid()
    import numpy as np

    from ouster_sdk_tpu.io.device_engine import DeviceScanIterator
    from ouster_sdk_tpu.io.pcap import PcapWriter

    info, aux_raw = _hybrid_parts(tmp_path)
    assert info.config.udp_port_imu, "fixture should configure imu port"
    frames = _lidar_frames(info, 1, 2)
    stream, add = _stream_builder()
    for p in frames[1]:
        add("lidar", p)
    for p in frames[2]:
        add("lidar", p)
    # oracle stream: lidar only (classify rejects the foreign datagrams)
    ref = _numpy_scans(info, stream)

    path = str(tmp_path / "foreign.pcap")
    lp = info.config.udp_port_lidar
    foreign = info.config.udp_port_imu + 1
    with PcapWriter(path) as w:
        k = 0
        for kind, payload, ts in stream:
            w.write(payload.tobytes(), "127.0.0.1", "127.0.0.1", lp, lp,
                    ts)
            if k % 16 == 0:  # interleave imu-size datagrams, wrong port
                imu = _patched(dict(aux_raw)["imu"], 1)
                w.write(imu.tobytes(), "127.0.0.1", "127.0.0.1",
                        foreign, foreign, ts + 1)
            k += 1
    dev = list(DeviceScanIterator(path, info))
    assert [s.frame_id for s in dev] == [s.frame_id for s in ref]
    for a, b in zip(dev, ref):
        _assert_scans_equal(a, b)
    assert all((s.field("IMU_TIMESTAMP") == 0).all() for s in dev)


def test_hybrid_fid_reuse_binds_by_instance(tmp_path):
    """Two frames sharing a frame id (wrap/reuse) must each get only the
    aux packets the capture carries INSIDE them — keying aux by bare fid
    would hand the second frame's packets to the first."""
    _require_hybrid()
    info, aux_raw = _hybrid_parts(tmp_path)
    frames = _lidar_frames(info, 1, 5)
    stream, add = _stream_builder()
    for p in frames[1]:
        add("lidar", p)
    for p in frames[5]:
        add("lidar", p)
    for p in frames[1]:                        # fid 1 again
        add("lidar", p)
    for kind, buf in aux_raw:                  # aux inside SECOND fid-1
        add(kind, _patched(buf, 1))
    # close the second fid-1 frame so it isn't trailing-filtered on the
    # oracle side only
    for p in frames[5]:
        add("lidar", p)

    dev = _check_both(tmp_path, info, stream, "fid_reuse.pcap")
    assert [s.frame_id for s in dev] == [1, 5, 1, 5]
    first, second = dev[0], dev[2]
    assert (first.field("IMU_TIMESTAMP") == 0).all()
    assert first.field("ZONE_TIMESTAMP")[0] == 0
    assert (second.field("IMU_TIMESTAMP") > 0).any()
    assert second.field("ZONE_TIMESTAMP")[0] > 0


def test_live_admit_releases_before_stale_drop_rules():
    """A packet that closes the open frame must flush it even when the
    PREVIOUSLY released frame's drop rules match the new id — the oracle
    re-runs drop rules against the just-released id, never a stale one
    (batcher.py:97-126). Sequence 5*, 10, 4*, 11* must emit
    [5, 10, 4, 11]: released=5 matching (4+1) must NOT drop frame 4."""
    import pytest

    from _live_helpers import free_udp_ports, live_test_info
    from ouster_sdk_tpu.io.device_engine import (LiveDeviceBatcher,
                                                 supports_device_decode)
    from ouster_sdk_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    lp, ip = free_udp_ports(2)
    info = live_test_info(lp, ip)
    assert supports_device_decode(info)
    import numpy as np

    stream = []
    for fid in (5,):
        for p in synth_frame_packets_cached(info, fid):
            stream.append(("lidar", np.frombuffer(p, np.uint8), 1))
    stream.append(
        ("lidar",
         np.frombuffer(synth_frame_packets_cached(info, 10)[0], np.uint8),
         2))
    for fid in (4, 11):
        for p in synth_frame_packets_cached(info, fid):
            stream.append(("lidar", np.frombuffer(p, np.uint8), 3))

    ref = _numpy_scans(info, stream, trailing_flush=False)
    dev = _run_live(info, stream)
    assert [s.frame_id for s in dev] == [s.frame_id for s in ref] == \
        [5, 10, 4, 11]
    for a, b in zip(dev, ref):
        _assert_scans_equal(a, b)


def test_hybrid_aux_boundary_splits_lidar_frame(tmp_path):
    """An aux packet of the NEXT frame closes the current one: lidar
    packets of the old frame arriving after it are reordered stragglers
    the oracle drops (batcher.py:120-121). The staging must honor the
    aux-induced boundary — grouping the lidar stream alone would merge
    the straggler back into the frame."""
    _require_hybrid()
    info, aux_raw = _hybrid_parts(tmp_path)
    imu = next(b for k, b in aux_raw if k == "imu")
    frames = _lidar_frames(info, 1, 2, 3)
    stream, add = _stream_builder()
    for p in frames[1][:-1]:
        add("lidar", p)                    # frame 1, last packet missing
    add("imu", _patched(imu, 2))           # frame 2 opens: releases 1
    add("lidar", frames[1][-1])            # late straggler: must drop
    for p in frames[2]:
        add("lidar", p)
    for p in frames[3]:
        add("lidar", p)

    dev = _check_both(tmp_path, info, stream, "aux_boundary.pcap")
    assert [s.frame_id for s in dev] == [1, 2, 3]
    # the straggler's columns stayed zero-filled in scan 1
    s1 = dev[0]
    import numpy as np

    cpp = info.format.columns_per_packet
    assert (s1.status[-cpp:] == 0).all()
    assert (s1.field("RANGE")[:, -cpp:] == 0).all()


def test_hybrid_survives_transient_fid_glitch(tmp_path):
    """A glitched frame id mid-capture (aux-only instance + one stray
    lidar packet) must not poison aux attachment for the rest of the
    capture: the instance list drives the staging, so later frames keep
    their aux and the oracle's scan sequence is preserved."""
    _require_hybrid()
    import numpy as np

    info, aux_raw = _hybrid_parts(tmp_path)
    imu = next(b for k, b in aux_raw if k == "imu")
    frames = _lidar_frames(info, 5, 8, 9, 10)
    stray = np.frombuffer(
        synth_frame_packets_cached(info, 4)[0], np.uint8)
    stream, add = _stream_builder()
    for p in frames[5]:
        add("lidar", p)
    add("imu", _patched(imu, 7))           # aux-only frame 7: releases 5
    add("lidar", stray)                    # lidar frame 4: releases 7
    for fid in (8, 9, 10):
        for p in frames[fid][:-1]:
            add("lidar", p)
        for kind, buf in aux_raw:
            add(kind, _patched(buf, fid))
        add("lidar", frames[fid][-1])

    dev = _check_both(tmp_path, info, stream, "glitch.pcap")
    assert [s.frame_id for s in dev] == [5, 7, 4, 8, 9, 10]
    for s in dev[3:]:
        assert (s.field("IMU_TIMESTAMP") > 0).any(), s.frame_id
        assert s.field("ZONE_TIMESTAMP")[0] > 0, s.frame_id


def test_live_nmea_imu_admission_with_zero_expected():
    """NMEA metadata declaring imu_packets_per_frame == 0: imu packets
    still run the admission state machine (the oracle only rejects them
    for non-NMEA profiles, batcher.py:79-81) — an imu packet with a new
    frame id releases the open scan and supplies its opener header."""
    _require_hybrid()
    import numpy as np

    from ouster_sdk_tpu.io.device_engine import LiveDeviceBatcher

    info, aux_raw = _hybrid_parts(None)
    info.format.imu_packets_per_frame = 0
    imu = next(b for k, b in aux_raw if k == "imu")
    frames = _lidar_frames(info, 1, 2, 3)
    stream, add = _stream_builder()
    for p in frames[1]:
        add("lidar", p)
    add("imu", _patched(imu, 2))           # opens frame 2, releases 1
    for p in frames[2]:
        add("lidar", p)
    for p in frames[3]:
        add("lidar", p)                    # releases frame 2

    stager = LiveDeviceBatcher(info)
    assert stager.wants_imu
    ref = _numpy_scans(info, stream, trailing_flush=False)
    dev = _run_live(info, stream)
    # frame 3 stays open at EOF (zone packet still expected; live has no
    # flush) — the point is frames 1/2 released at the right packets
    assert [s.frame_id for s in dev] == [s.frame_id for s in ref] == \
        [1, 2]
    for a, b in zip(dev, ref):
        _assert_scans_equal(a, b)


def test_lazy_device_index(monkeypatch):
    """index=True on a device-eligible capture builds the LAZY frame
    index (admission instances + decode-on-demand, O(1) memory) and its
    random access is bit-equal to iteration and to the numpy-indexed
    route (ref: indexed_pcap_reader.h:28-101)."""
    if not FIXTURES:
        pytest.skip("no fixtures")
    pcap = FIXTURES[0]
    for p in FIXTURES:
        if device_engine.supports_device_decode(
                PcapScanSource(p).sensor_info[0]):
            pcap = p
            break
    else:
        pytest.skip("no device-eligible fixture")

    monkeypatch.setenv("OUSTER_SDK_TPU_DEVICE_DECODE", "1")
    src = PcapScanSource(pcap, index=True)
    assert src.is_indexed
    assert src._lazy_index is not None, "lazy index should engage"
    assert src._scan_cache is None, "no materialized scan cache"

    iterated = [s for _, s in src._iter_scans()]
    n = len(src)
    assert n == len(iterated) > 0
    for i in (0, n // 2, n - 1, -1):
        got = src[i][0]
        _assert_scan_equal(got, iterated[i if i >= 0 else n + i],
                           f"lazy[{i}]")
    assert len(src._lazy._cache) <= src._lazy._cache_cap

    monkeypatch.setenv("OUSTER_SDK_TPU_DEVICE_DECODE", "0")
    ref = PcapScanSource(pcap, index=True)
    assert ref._lazy_index is None, "numpy route materializes"
    assert len(ref) == n
    assert ref.scans_num == src.scans_num
    assert ref.full_index() == src.full_index()
    for i in (0, n - 1):
        _assert_scan_equal(src[i][0], ref[i][0], f"vs-numpy[{i}]")


def test_lazy_index_concurrent_iteration(monkeypatch):
    """Two simultaneous iterations of an indexed source share the staged
    capture but must not share staging pools — interleaved consumption
    must still produce bit-equal scans (pool check-out per iterator)."""
    if not FIXTURES:
        pytest.skip("no fixtures")
    for pcap in FIXTURES:
        if device_engine.supports_device_decode(
                PcapScanSource(pcap).sensor_info[0]):
            break
    else:
        pytest.skip("no device-eligible fixture")

    monkeypatch.setenv("OUSTER_SDK_TPU_DEVICE_DECODE", "1")
    src = PcapScanSource(pcap, index=True)
    ref = [s for _, s in src._iter_scans()]
    a, b = src._iter_scans(), src._iter_scans()
    out_a, out_b = [], []
    done_a = done_b = False
    while not (done_a and done_b):
        try:
            out_a.append(next(a)[1])
        except StopIteration:
            done_a = True
        try:
            out_b.append(next(b)[1])
        except StopIteration:
            done_b = True
    assert len(out_a) == len(out_b) == len(ref)
    for k, r in enumerate(ref):
        _assert_scan_equal(out_a[k], r, f"concurrent-a[{k}]")
        _assert_scan_equal(out_b[k], r, f"concurrent-b[{k}]")


@pytest.mark.conformance
def test_legacy_profile_device_eligible(monkeypatch):
    """LEGACY captures must run the device route (the column-FOOTER
    status ships as an extra staged col-header row, plan.schw), not
    fall back — and stay bit-equal to the numpy batcher. Guards the
    eligibility gate: test_device_route_matches_batcher would still
    pass on a silent fallback."""
    legacy = [p for p in FIXTURES
              if PcapScanSource(p).sensor_info[0].format.udp_profile_lidar
              .name == "LEGACY"]
    if not legacy:
        pytest.skip("no single-sensor LEGACY fixtures")
    for pcap in legacy:
        info = PcapScanSource(pcap).sensor_info[0]
        assert device_engine.supports_device_decode(info), pcap
        device_engine.stats["batches"] = 0
        dev = _iter_scans(pcap, "1")
        assert device_engine.stats["batches"] > 0, \
            f"{pcap}: device decode did not execute"
        ref = _iter_scans(pcap, "0")
        assert len(dev) == len(ref)
        for k, (a, b) in enumerate(zip(dev, ref)):
            _assert_scan_equal(a, b, f"legacy:{os.path.basename(pcap)}[{k}]")


def _open_same_ports_pair():
    """The reference same_ports fixture pair, imu-deconflicted the same
    way the reference's own multi-sensor tests do."""
    import json

    from ouster_sdk_tpu.core.metadata import sensor_info_from_metadata

    path = os.path.join(PCAP_DIR, "same_ports.pcap")
    metas = [os.path.join(PCAP_DIR, "same_ports.1.json"),
             os.path.join(PCAP_DIR, "same_ports.2.json")]
    if not all(map(os.path.exists, [path] + metas)):
        return None, None
    infos = []
    for m, port in zip(metas, [7503, None]):
        d = json.load(open(m))
        if port is not None:
            d["config_params"]["udp_port_imu"] = port
        infos.append(sensor_info_from_metadata(d))
    return path, infos


def _assert_streams_equal(dev, ref, tag):
    assert len(dev) == len(ref), tag
    for k, ((ia, a), (ib, b)) in enumerate(zip(dev, ref)):
        assert ia == ib, f"{tag}: yield order diverges at {k} ({ia}!={ib})"
        _assert_scan_equal(a, b, f"{tag}[{k}]")


def _iter_idx_scans(path, force, **kw):
    old = os.environ.get("OUSTER_SDK_TPU_DEVICE_DECODE")
    os.environ["OUSTER_SDK_TPU_DEVICE_DECODE"] = force
    try:
        return [(i, s) for i, s in PcapScanSource(path, **kw)._iter_scans()]
    finally:
        if old is None:
            os.environ.pop("OUSTER_SDK_TPU_DEVICE_DECODE", None)
        else:
            os.environ["OUSTER_SDK_TPU_DEVICE_DECODE"] = old


@pytest.mark.conformance
def test_multi_sensor_device_route_same_ports():
    """Two sensors sharing a lidar port (disambiguated by packet size):
    the device route must engage (one device iterator per sensor, merged
    by release position) and be bit-equal to the numpy route including
    the interleaved (sensor_idx, scan) yield order."""
    path, infos = _open_same_ports_pair()
    if path is None:
        pytest.skip("same_ports fixtures missing")
    src = PcapScanSource(path, sensor_infos=infos)
    assert not src._device_ambiguous()
    device_engine.stats["batches"] = 0
    dev = _iter_idx_scans(path, "1", sensor_infos=infos)
    assert device_engine.stats["batches"] > 0, "device route did not engage"
    ref = _iter_idx_scans(path, "0", sensor_infos=infos)
    _assert_streams_equal(dev, ref, "same_ports")


@pytest.mark.conformance
def test_multi_sensor_device_route_synthesized(tmp_path):
    """Interleaved two-sensor capture with staggered frame boundaries:
    the release-position merge must reproduce the numpy route's exact
    yield order across several frames per sensor."""
    from test_batcher_semantics import _info, _packets

    from ouster_sdk_tpu.core.types import LidarMode, UDPProfileLidar
    from ouster_sdk_tpu.core.types import SensorInfo
    from ouster_sdk_tpu.io.pcap import PcapWriter

    a = _info()
    a.config.udp_port_lidar = 7502
    b = SensorInfo.from_default(LidarMode.from_string("1024x10"))
    b.format.udp_profile_lidar = UDPProfileLidar.RNG15_RFL8_NIR8
    b.config.udp_port_lidar = 7512
    b.init_id = a.init_id + 1
    b.sn = a.sn + 1

    pkts = []   # (port, LidarPacket), staggered interleave
    sa = [_packets(a, fid, base_ts=1000 * fid) for fid in (5, 6, 7)]
    sb = [_packets(b, fid, base_ts=1000 * fid) for fid in (20, 21)]
    fa = [p for f in sa for p in f]
    fb = [p for f in sb for p in f]
    ia = ib = 0
    rr = 0
    while ia < len(fa) or ib < len(fb):
        # 2:3 interleave so frame boundaries land at different offsets
        take_a = rr % 5 < 2
        rr += 1
        if take_a and ia < len(fa) or ib >= len(fb):
            if ia < len(fa):
                pkts.append((7502, fa[ia])); ia += 1
        elif ib < len(fb):
            pkts.append((7512, fb[ib])); ib += 1
    path = str(tmp_path / "two.pcap")
    with PcapWriter(path) as w:
        ts = 10 ** 9
        for port, p in pkts:
            w.write(p.buf.tobytes(), "10.0.0.1", "10.0.0.2", port, port, ts)
            ts += 10 ** 5
    infos = [a, b]

    src = PcapScanSource(path, sensor_infos=infos)
    assert not src._device_ambiguous()
    device_engine.stats["batches"] = 0
    dev = _iter_idx_scans(path, "1", sensor_infos=infos)
    assert device_engine.stats["batches"] > 0
    ref = _iter_idx_scans(path, "0", sensor_infos=infos)
    assert len(ref) == 5  # 3 + 2 (trailing partials flush)
    _assert_streams_equal(dev, ref, "synth-two-sensor")


def test_multi_sensor_device_gate_ambiguous():
    """Same lidar size AND port (serial-disambiguated in the numpy
    route): the device route must decline — per-sensor readers cannot
    replicate _classify's per-packet serial assignment."""
    import json

    from ouster_sdk_tpu.core.metadata import sensor_info_from_metadata

    path = os.path.join(PCAP_DIR, "same_ports_nonlegacy.pcap")
    metas = [os.path.join(PCAP_DIR, "same_ports_nonlegacy.1.json"),
             os.path.join(PCAP_DIR, "same_ports_nonlegacy.2.json")]
    if not all(map(os.path.exists, [path] + metas)):
        pytest.skip("fixture missing")
    infos = []
    for m, port in zip(metas, [7503, None]):
        d = json.load(open(m))
        if port is not None:
            d["config_params"]["udp_port_imu"] = port
        infos.append(sensor_info_from_metadata(d))
    src = PcapScanSource(path, sensor_infos=infos)
    assert src._device_ambiguous()
    device_engine.stats["batches"] = 0
    dev = _iter_idx_scans(path, "1", sensor_infos=infos)
    assert device_engine.stats["batches"] == 0, "must fall back"
    ref = _iter_idx_scans(path, "0", sensor_infos=infos)
    _assert_streams_equal(dev, ref, "ambiguous-fallback")


@pytest.mark.conformance
def test_raw_fields_device_route():
    """raw_fields (RAW32_WORDk side-channels) must ride the device route
    — each raw word is exactly one staged plane — and stay bit-equal to
    the batcher, on eUDP and LEGACY profiles alike."""
    ran = 0
    for pcap in FIXTURES[:4]:
        info = PcapScanSource(pcap).sensor_info[0]
        if not device_engine.supports_device_decode(info, raw_fields=True):
            continue
        device_engine.stats["batches"] = 0
        dev = _iter_scans(pcap, "1", raw_fields=True)
        assert device_engine.stats["batches"] > 0, pcap
        ref = _iter_scans(pcap, "0", raw_fields=True)
        assert len(dev) == len(ref)
        for k, (a, b) in enumerate(zip(dev, ref)):
            assert any(f.startswith("RAW32") for f in b.fields), pcap
            _assert_scan_equal(a, b, f"raw:{os.path.basename(pcap)}[{k}]")
        ran += 1
    if ran == 0:
        pytest.skip("no eligible fixtures")


@pytest.mark.conformance
def test_legacy_live_stager_bit_equal():
    """LEGACY packets through the live frame-batch stager
    (LiveDeviceBatcher) must equal the numpy ScanBatcher — the footer
    status row and header-less packet geometry ride the same staging as
    the pcap route."""
    from ouster_sdk_tpu.core.batcher import ScanBatcher
    from ouster_sdk_tpu.core.lidar_scan import LidarScan
    from ouster_sdk_tpu.io.device_engine import LiveDeviceBatcher
    from ouster_sdk_tpu.io.pcap_source import PcapPacketSource

    legacy = [p for p in FIXTURES
              if PcapScanSource(p).sensor_info[0].format.udp_profile_lidar
              .name == "LEGACY"]
    if not legacy:
        pytest.skip("no LEGACY fixtures")
    for pcap in legacy[:1]:
        src = PcapPacketSource(pcap)
        info = src.sensor_info[0]
        pkts = [(p.buf, p.host_timestamp) for _, p in src
                if p.type().value == "Lidar"]
        # close the stream with a fabricated next-frame packet so both
        # paths release the final frame the same way
        b, cur = ScanBatcher(info), LidarScan(info)
        ref = []
        for buf, ts in pkts:
            from ouster_sdk_tpu.core.packets import LidarPacket

            if b(LidarPacket(buf, host_timestamp=ts), cur):
                ref.append(cur)
                cur = LidarScan(info)
        stager = LiveDeviceBatcher(info)
        dev = []
        for buf, ts in pkts:
            dev.extend(stager.push(buf, ts))
        assert [s.frame_id for s in dev] == [s.frame_id for s in ref]
        for k, (a, b2) in enumerate(zip(dev, ref)):
            _assert_scan_equal(a, b2, f"legacy-live[{k}]")


# ---------------------------------------------------------------------------
# Round-3 review fixes: zero-ts un-stamp, strict ports, ambiguity gates,
# pipelined pool lifetime
# ---------------------------------------------------------------------------

def _write_pcap(path, seq, port):
    """Write [(LidarPacket-or-buf, host_ts), ...] at the given port."""
    from ouster_sdk_tpu.io.pcap import PcapWriter

    with PcapWriter(path) as w:
        for p, ts in seq:
            buf = p.buf if hasattr(p, "buf") else p
            w.write(buf.tobytes(), "10.0.0.1", "10.0.0.2", port, port, ts)


@pytest.mark.conformance
def test_zero_ts_duplicate_unstamps_slot(tmp_path):
    """The oracle writes packet_timestamp unconditionally and counts the
    NONZERO entries for completion (batcher.py:177,:386-392): a zero-ts
    duplicate of an already-stamped slot reopens the frame until the slot
    restamps. Device route and numpy route must agree on the release
    point and every header array."""
    from test_batcher_semantics import _info, _packets

    info = _info()
    info.config.udp_port_lidar = 7502
    f1 = _packets(info, 10)
    f2 = _packets(info, 11)
    T, dt = 10 ** 9, 10 ** 5
    seq = [(p, T + k * dt) for k, p in enumerate(f1[:-1])]
    seq.append((f1[0], 0))             # zero-ts duplicate: UN-stamps slot 0
    seq.append((f1[-1], 2 * T))        # stamps the last slot
    # broken slot tracking releases at the previous packet and drops this
    # restamp as a post-release duplicate (packet_timestamp[0] stays 0)
    seq.append((f1[0], 3 * T))         # restamp slot 0 -> oracle releases
    seq += [(p, 4 * T + k * dt) for k, p in enumerate(f2)]
    path = str(tmp_path / "zero_ts.pcap")
    _write_pcap(path, seq, 7502)
    meta = str(tmp_path / "zero_ts.json")
    with open(meta, "w") as f:
        f.write(info.to_json_string())

    device_engine.stats["batches"] = 0
    dev = _iter_scans(path, "1", meta=[meta])
    assert device_engine.stats["batches"] > 0
    ref = _iter_scans(path, "0", meta=[meta])
    assert [s.frame_id for s in ref] == [10, 11]
    assert len(dev) == len(ref)
    assert int(ref[0].packet_timestamp[0]) == 3 * T
    for k, (a, b) in enumerate(zip(dev, ref)):
        _assert_scan_equal(a, b, f"zero-ts[{k}]")

    # live stager: same stream, same oracle equality
    from ouster_sdk_tpu.core.batcher import ScanBatcher
    from ouster_sdk_tpu.core.lidar_scan import LidarScan
    from ouster_sdk_tpu.core.packets import LidarPacket
    from ouster_sdk_tpu.io.device_engine import LiveDeviceBatcher

    b, cur, ref_live = ScanBatcher(info), LidarScan(info), []
    for p, ts in seq:
        if b(LidarPacket(p.buf.tobytes(), host_timestamp=ts), cur):
            ref_live.append(cur)
            cur = LidarScan(info)
    stager = LiveDeviceBatcher(info)
    dev_live = []
    for p, ts in seq:
        dev_live.extend(stager.push(
            np.frombuffer(p.buf.tobytes(), np.uint8), ts))
    assert [s.frame_id for s in dev_live] == \
        [s.frame_id for s in ref_live] == [10, 11]
    for k, (a, b2) in enumerate(zip(dev_live, ref_live)):
        _assert_scan_equal(a, b2, f"zero-ts-live[{k}]")


@pytest.mark.conformance
def test_multi_sensor_absent_stream_strict_ports(tmp_path):
    """A two-sensor source over a capture carrying only sensor B's
    stream: sensor A's device reader must NOT claim B's size-matching
    datagrams via a lenient port fallback — the numpy oracle classifies
    strictly by the configured port (pcap_source._classify)."""
    import copy

    from test_batcher_semantics import _info, _packets

    a = _info()
    a.config.udp_port_lidar = 7502
    b = copy.deepcopy(a)
    b.config.udp_port_lidar = 7512
    b.init_id = a.init_id + 1
    b.sn = a.sn + 1
    seq = [(p, 10 ** 9 + k * 10 ** 5) for k, p in enumerate(
        [p for fid in (20, 21) for p in _packets(b, fid)])]
    path = str(tmp_path / "absent.pcap")
    _write_pcap(path, seq, 7512)   # only B's stream is in the capture
    infos = [a, b]

    src = PcapScanSource(path, sensor_infos=infos)
    assert not src._device_ambiguous()
    device_engine.stats["batches"] = 0
    dev = _iter_idx_scans(path, "1", sensor_infos=infos)
    assert device_engine.stats["batches"] > 0
    ref = _iter_idx_scans(path, "0", sensor_infos=infos)
    assert all(idx == 1 for idx, _ in ref)
    _assert_streams_equal(dev, ref, "absent-stream")


def test_lazy_index_respects_ambiguity_gate(tmp_path, monkeypatch):
    """_build_index must apply the same _device_ambiguous gate iteration
    does: an ambiguous capture indexes via the materialized batcher route
    so source[i] equals iteration (the docstring's invariant)."""
    from test_batcher_semantics import _info, _packets

    info = _info()
    info.config.udp_port_lidar = 7502
    seq = [(p, 10 ** 9 + k * 10 ** 5) for k, p in enumerate(
        [p for fid in (5, 6) for p in _packets(info, fid)])]
    path = str(tmp_path / "amb.pcap")
    _write_pcap(path, seq, 7502)
    meta = str(tmp_path / "amb.json")
    with open(meta, "w") as f:
        f.write(info.to_json_string())

    monkeypatch.setenv("OUSTER_SDK_TPU_DEVICE_DECODE", "1")
    monkeypatch.setattr(PcapScanSource, "_device_ambiguous",
                        lambda self: True)
    src = PcapScanSource(path, meta=[meta], index=True)
    assert src._lazy_index is None, \
        "ambiguous capture must not take the lazy device index"
    it = [s for _, s in src._iter_scans()]
    assert len(src) == len(it) == 2
    for i, s in enumerate(it):
        _assert_scan_equal(src[i][0], s, f"amb[{i}]")


def test_device_gate_imu_zone_cross_kind(monkeypatch):
    """A datagram matching one sensor's NMEA-imu stream and another's
    (or its own) zone stream is classified once by the oracle's elif
    chain but double-assigned by the device route's per-kind masks —
    _device_ambiguous must catch imu-vs-zone collisions."""
    import types

    from test_batcher_semantics import _info

    from ouster_sdk_tpu.core.types import UDPProfileIMU
    from ouster_sdk_tpu.ops import packet_format as pfmod

    def stub_from_info(info):
        return types.SimpleNamespace(
            lidar_packet_size=1000 + (info.init_id or 0),
            imu_packet_size=500, zone_packet_size=500)

    monkeypatch.setattr(pfmod.PacketFormat, "from_info",
                        staticmethod(stub_from_info))

    def ambiguous(infos):
        stub = types.SimpleNamespace(sensor_info=infos)
        return PcapScanSource._device_ambiguous(stub)

    a = _info()
    a.init_id = 1
    a.format.udp_profile_imu = UDPProfileIMU.ACCEL32_GYRO32_NMEA
    a.config.udp_port_imu = 7503
    a.config.udp_port_zm = 7605
    b = _info()
    b.init_id = 2
    b.format.zone_monitoring_enabled = True
    b.config.udp_port_zm = 7503
    b.config.udp_port_imu = 7604
    assert ambiguous([a, b])          # cross-sensor imu-vs-zone
    b.config.udp_port_zm = 7603
    assert not ambiguous([a, b])      # distinct ports: fine

    c = _info()
    c.init_id = 3
    c.format.udp_profile_imu = UDPProfileIMU.ACCEL32_GYRO32_NMEA
    c.format.zone_monitoring_enabled = True
    c.config.udp_port_imu = 7503
    c.config.udp_port_zm = 7503
    assert ambiguous([c])             # same-sensor imu-vs-zone

    d = _info()                        # neither stream batches into scans
    d.init_id = 4
    d.config.udp_port_imu = 7503
    d.config.udp_port_zm = 7503
    assert not ambiguous([d])


def test_pipelined_pool_checkin_deferred(tmp_path):
    """Pools must not return to the freelist while yielded batches still
    sit in the pipelined queue: iterations started after the producer
    exhausted (but before the consumer drained) must stage into DIFFERENT
    buffers."""
    import time

    from test_batcher_semantics import _info, _packets

    from ouster_sdk_tpu.io.frames import FrameReader

    info = _info()
    info.config.udp_port_lidar = 7502
    seq = [(p, 10 ** 9 + k * 10 ** 5) for k, p in enumerate(
        [p for fid in (5, 6, 7) for p in _packets(info, fid)])]
    path = str(tmp_path / "pool.pcap")
    _write_pcap(path, seq, 7502)

    fr = FrameReader(path, info=info, strict_ports=True)
    lidar_ev, _ = fr.hybrid_streams()
    lidx, lfid = lidar_ev[0], lidar_ev[1]
    groups = [lidx[lfid == fid] for fid in (5, 6, 7)]

    it_a = fr.iter_instance_batches_pipelined(groups, chunk=1, depth=4)
    time.sleep(0.5)  # let A's producer stage everything and exhaust
    # two more passes while A's batches are still queued unread
    expected = [b.planes.copy() for b in
                fr.iter_instance_batches(groups, chunk=1)]
    got_b = [b.planes.copy() for b in
             fr.iter_instance_batches_pipelined(groups, chunk=1, depth=4)]
    got_a = [b.planes.copy() for b in it_a]
    assert len(got_a) == len(got_b) == len(expected) == 3
    for k in range(3):
        np.testing.assert_array_equal(got_b[k], expected[k], f"B[{k}]")
        np.testing.assert_array_equal(got_a[k], expected[k], f"A[{k}]")
