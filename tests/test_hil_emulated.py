"""Emulator-backed live-path matrix — the in-image stand-in for the
reference's hardware-in-the-loop suite (ref: tests/hil/test_core.py,
test_config.py, test_lidar_delay.py; our tests/hil/ runs the same
surface against real hardware via --sensor).

Covers what the single-sensor loopback tests (test_sensor.py) do not:
reconfiguration under stream, ClientTimeout exception paths on both the
packet and scan iterators, drop-oldest under backpressure at both the
packet buffer and the scan queue, and a multi-sensor same-host port
matrix.
"""

import socket
import threading
import time

import numpy as np
import pytest

from ouster_sdk_tpu import ChanField
from ouster_sdk_tpu.sensor.emulator import SensorEmulator
from ouster_sdk_tpu.sensor.scan_source import (
    ClientTimeout,
    SensorPacketSource,
    SensorScanSource,
)


from _live_helpers import (  # noqa: E402
    free_udp_ports as _free_ports,
    live_test_info as _test_info,
    synth_frame_packets,
)


def _frame_packets(info, frame_id, ts0=0):
    """One full frame of synthesized lidar packets as emulator items."""
    return [(ts0 + i * 100_000, "lidar", raw) for i, raw in
            enumerate(synth_frame_packets(info, frame_id))]


def _frames_factory(info, n_frames, period_ns=100_000_000):
    def factory():
        items = []
        for f in range(n_frames):
            items.extend(_frame_packets(info, frame_id=f + 1,
                                        ts0=f * period_ns))
        return items

    return factory


# ---------------------------------------------------------------------------
# reconfiguration under stream (ref: tests/hil/test_config.py)
# ---------------------------------------------------------------------------

def test_reconfig_under_stream():
    """set_config_param while packets are flowing: the stream keeps
    producing scans and staged config reflects the change without a
    restart (the emulator stages like real fw pre-reinit)."""
    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    with SensorEmulator(info, _frames_factory(info, 40),
                        lidar_port=lidar_port, imu_port=imu_port,
                        rate=0.0) as emu:
        host = f"127.0.0.1:{emu.http_port}"
        src = SensorScanSource([host], sensor_info=[info],
                               lidar_port=lidar_port, imu_port=imu_port,
                               timeout=5.0)
        try:
            idx, first = src.get_scan(timeout_sec=10.0)
            assert first is not None

            from ouster_sdk_tpu.sensor.http import SensorHttp

            http = SensorHttp.create(host)
            http.set_config_param("signal_multiplier", 2)
            staged = http.staged_config_params()
            assert staged["signal_multiplier"] == 2
            # active config unchanged until reinitialize
            active = http.active_config_params()
            assert active.get("signal_multiplier") != 2

            idx, after = src.get_scan(timeout_sec=10.0)
            assert after is not None, "stream died across reconfig"
            assert after.field(ChanField.RANGE).any()
        finally:
            src.close()


# ---------------------------------------------------------------------------
# ClientTimeout exception paths (ref: sensor_packet_source.cpp:820,
# sensor_scan_source.cpp:69)
# ---------------------------------------------------------------------------

def test_packet_iterator_client_timeout():
    """A silent sensor raises ClientTimeout from packet iteration."""
    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    src = SensorPacketSource(["127.0.0.1"], sensor_info=[info],
                             lidar_port=lidar_port, imu_port=imu_port,
                             timeout=0.5)
    try:
        t0 = time.monotonic()
        with pytest.raises(ClientTimeout):
            for _ in src:
                pytest.fail("no packets were sent")
        assert 0.4 < time.monotonic() - t0 < 5.0
    finally:
        src.close()


def test_scan_iterator_client_timeout_names_sensor():
    """A stalled stream raises ClientTimeout from scan iteration with
    the sensor serial + port in the message (sensor_scan_source.cpp:69)."""
    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port, sn=992240000042)
    src = SensorScanSource(["127.0.0.1"], sensor_info=[info],
                           lidar_port=lidar_port, imu_port=imu_port,
                           timeout=0.6)
    try:
        with pytest.raises(ClientTimeout, match="992240000042"):
            for _ in src:
                pytest.fail("no scans were produced")
    finally:
        src.close()


def test_timeout_disabled_never_raises():
    """timeout=None disables the iteration timeout (reference gate:
    iterator_timeout_ > 0)."""
    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    src = SensorPacketSource(["127.0.0.1"], sensor_info=[info],
                             lidar_port=lidar_port, imu_port=imu_port,
                             timeout=None)
    try:
        got = []
        t = threading.Thread(
            target=lambda: [got.append(p) for p in src], daemon=True)
        t.start()
        time.sleep(1.5)
        assert t.is_alive()  # still quietly polling, no exception
    finally:
        src.close()
        t.join(timeout=3)


def test_recovery_after_near_timeout():
    """Packets resuming just before the deadline reset the timer —
    iteration continues instead of raising."""
    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    src = SensorPacketSource(["127.0.0.1"], sensor_info=[info],
                             lidar_port=lidar_port, imu_port=imu_port,
                             timeout=3.0)
    stop = threading.Event()

    def bursty_sender():
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        pkts = [p for _, _, p in _frame_packets(info, 1)]
        for _ in range(3):
            if stop.is_set():
                return
            for p in pkts[:4]:
                tx.sendto(p, ("127.0.0.1", lidar_port))
            time.sleep(0.8)  # gap < timeout

    t = threading.Thread(target=bursty_sender, daemon=True)
    t.start()
    try:
        got = 0
        for idx, pkt in src:
            got += 1
            if got >= 10:
                break
        assert got >= 10
    finally:
        stop.set()
        src.close()
        t.join(timeout=3)


# ---------------------------------------------------------------------------
# drop-oldest under backpressure (ref: sensor_packet_source.cpp:573,
# sensor_scan_source.cpp:222)
# ---------------------------------------------------------------------------

def test_scan_queue_drop_oldest_backpressure():
    """With a slow consumer and queue_size=2 the source drops the
    oldest completed scans but keeps delivering the newest."""
    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    n_frames = 12
    with SensorEmulator(info, _frames_factory(info, n_frames),
                        lidar_port=lidar_port, imu_port=imu_port,
                        rate=0.0) as emu:
        src = SensorScanSource([f"127.0.0.1:{emu.http_port}"],
                               sensor_info=[info],
                               lidar_port=lidar_port, imu_port=imu_port,
                               queue_size=2, timeout=None)
        try:
            emu.join(timeout=20)  # blast every frame with no pacing
            time.sleep(0.5)  # let the batcher thread drain the sockets
            frame_ids = []
            while True:
                idx, scan = src.get_scan(timeout_sec=0.5)
                if scan is None:
                    break
                frame_ids.append(scan.frame_id)
            # only the queue can survive; everything older was dropped
            assert 1 <= len(frame_ids) <= 2
            assert src.dropped_scans > 0
            # the survivors are the *newest* frames (drop-oldest)
            assert max(frame_ids) >= n_frames - 2
        finally:
            src.close()


def test_packet_buffer_drop_oldest():
    """The buffered packet source counts drops and keeps the newest
    packets when the bounded buffer overflows."""
    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    src = SensorPacketSource(["127.0.0.1"], sensor_info=[info],
                             lidar_port=lidar_port, imu_port=imu_port,
                             buffer_time_sec=1.0, buffer_queue_size=8,
                             timeout=None)
    try:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        pkts = [p for _, _, p in _frame_packets(info, 1)]
        # flood without consuming: far more than the 8-slot buffer
        for rep in range(8):
            for p in pkts:
                tx.sendto(p, ("127.0.0.1", lidar_port))
        deadline = time.time() + 5
        while src.dropped_packets == 0 and time.time() < deadline:
            time.sleep(0.05)
        assert src.dropped_packets > 0
        # buffer still serves the most recent packets
        idx, pkt = src.get_packet(timeout_sec=1.0)
        assert pkt is not None
    finally:
        src.close()


def test_queue_size_validation():
    with pytest.raises(ValueError, match="queue_size"):
        SensorScanSource(["127.0.0.1"], queue_size=0,
                         sensor_info=[_test_info(*_free_ports(2))])


# ---------------------------------------------------------------------------
# multi-sensor same-host port matrix (ref: tests/hil multi-sensor +
# sensor_packet_source.cpp:343-548 fan-in)
# ---------------------------------------------------------------------------

def test_two_emulated_sensors_distinct_ports_collate():
    """Two emulators on one host, distinct port pairs: the fan-in
    keeps streams separate by port and collation pairs them."""
    p = _free_ports(4)
    info_a = _test_info(p[0], p[1], sn=122246000001)
    info_b = _test_info(p[2], p[3], sn=122246000002)
    with SensorEmulator(info_a, _frames_factory(info_a, 12),
                        lidar_port=p[0], imu_port=p[1], rate=1.0), \
         SensorEmulator(info_b, _frames_factory(info_b, 12),
                        lidar_port=p[2], imu_port=p[3], rate=1.0):
        src = SensorScanSource(["127.0.0.1", "127.0.0.1"],
                               sensor_info=[info_a, info_b],
                               timeout=10.0, queue_size=8)
        try:
            seen = {0: 0, 1: 0}
            deadline = time.time() + 20
            while (not (seen[0] and seen[1])) and time.time() < deadline:
                idx, scan = src.get_scan(timeout_sec=1.0)
                if scan is None:
                    continue
                assert scan.sensor_info.sn == \
                    (info_a if idx == 0 else info_b).sn
                seen[idx] += 1
            assert seen[0] > 0 and seen[1] > 0
        finally:
            src.close()


def test_two_sensor_fanin_is_fair():
    """Regression: _poll_once must drain EVERY readable socket before
    returning. Stopping at the first non-empty one starved the other
    sensor completely — its packets sat in the kernel buffer until the
    busy stream ended, so one sensor's scans all arrived before the
    other's first. With a fair drain, two equally-paced sensors deliver
    interleaved: by the time one has 8 scans the other must have some."""
    p = _free_ports(4)
    info_a = _test_info(p[0], p[1], sn=122246000005)
    info_b = _test_info(p[2], p[3], sn=122246000006)
    with SensorEmulator(info_a, _frames_factory(info_a, 14),
                        lidar_port=p[0], imu_port=p[1], rate=2.0), \
         SensorEmulator(info_b, _frames_factory(info_b, 14),
                        lidar_port=p[2], imu_port=p[3], rate=2.0):
        src = SensorScanSource(["127.0.0.1", "127.0.0.1"],
                               sensor_info=[info_a, info_b],
                               timeout=10.0, queue_size=16)
        try:
            seen = [0, 0]
            deadline = time.time() + 20
            while max(seen) < 8 and time.time() < deadline:
                idx, scan = src.get_scan(timeout_sec=1.0)
                if scan is not None:
                    seen[idx] += 1
            assert max(seen) >= 8, seen
            assert min(seen) >= 2, \
                f"fan-in starved sensor {seen.index(min(seen))}: {seen}"
        finally:
            src.close()


def test_sets_from_two_sensors():
    """Iterating the multi-sensor source yields collated LidarScanSets
    with per-sensor slots filled by the right serial."""
    p = _free_ports(4)
    info_a = _test_info(p[0], p[1], sn=122246000003)
    info_b = _test_info(p[2], p[3], sn=122246000004)
    with SensorEmulator(info_a, _frames_factory(info_a, 15),
                        lidar_port=p[0], imu_port=p[1], rate=1.0), \
         SensorEmulator(info_b, _frames_factory(info_b, 15),
                        lidar_port=p[2], imu_port=p[3], rate=1.0):
        src = SensorScanSource(["127.0.0.1", "127.0.0.1"],
                               sensor_info=[info_a, info_b],
                               timeout=10.0, queue_size=8)
        try:
            filled = [0, 0]
            for n, ls_set in enumerate(src):
                for k, s in enumerate(ls_set):
                    if s is not None:
                        filled[k] += 1
                        assert s.sensor_info.sn == \
                            (info_a, info_b)[k].sn
                if filled[0] > 1 and filled[1] > 1:
                    break
                if n >= 12:
                    break
            assert filled[0] > 0 and filled[1] > 0
        finally:
            src.close()


# ---------------------------------------------------------------------------
# live frame-batch device handoff (io/device_engine.py LiveDeviceBatcher)
# ---------------------------------------------------------------------------

def _scan_equal(a, b, check_pkt_ts=True):
    assert a.frame_id == b.frame_id
    assert sorted(a.fields) == sorted(b.fields)
    for f in a.fields:
        np.testing.assert_array_equal(a.field(f), b.field(f), err_msg=f)
    np.testing.assert_array_equal(a.timestamp, b.timestamp)
    np.testing.assert_array_equal(a.measurement_id, b.measurement_id)
    np.testing.assert_array_equal(a.status, b.status)
    np.testing.assert_array_equal(a.alert_flags, b.alert_flags)
    if check_pkt_ts:
        np.testing.assert_array_equal(a.packet_timestamp,
                                      b.packet_timestamp)
    assert a.frame_status == b.frame_status


def _native_available():
    from ouster_sdk_tpu.utils import native

    return native.get_lib() is not None


@pytest.mark.skipif(not _native_available(),
                    reason="native library unavailable")
def test_live_device_batcher_bit_equal_to_numpy():
    """The live device handoff produces scans bit-equal to the numpy
    ScanBatcher for the same packet stream, including a mid-frame
    duplicate, a straggler after the boundary, and a dropped packet
    (zero-fill)."""
    from ouster_sdk_tpu.core.batcher import ScanBatcher
    from ouster_sdk_tpu.core.lidar_scan import LidarScan
    from ouster_sdk_tpu.core.packets import LidarPacket
    from ouster_sdk_tpu.io.device_engine import LiveDeviceBatcher

    info = _test_info(7502, 7503)
    frames = {f: [p for _, _, p in _frame_packets(info, f)]
              for f in (1, 2, 3, 4)}
    n = len(frames[1])

    # stream with pathologies:
    stream = []
    stream += frames[1][: n // 2]
    stream.append(frames[1][3])            # duplicate mid-frame
    stream += frames[1][n // 2:]
    stream.append(frames[1][0])            # straggler after release
    stream += frames[2][:-1]               # one packet missing
    stream += frames[3]                    # completes; frame 2 zero-fill
    stream += frames[4]
    ts = [1_000_000 * (i + 1) for i in range(len(stream))]

    # numpy ground truth
    ref_scans = []
    b, cur = ScanBatcher(info), LidarScan(info)
    for p, t in zip(stream, ts):
        if b(LidarPacket(np.frombuffer(p, np.uint8), t), cur):
            ref_scans.append(cur)
            cur = LidarScan(info)

    # live device path
    dev_scans = []
    stager = LiveDeviceBatcher(info)
    for p, t in zip(stream, ts):
        dev_scans.extend(stager.push(np.frombuffer(p, np.uint8), t))

    assert [s.frame_id for s in dev_scans] == \
        [s.frame_id for s in ref_scans]
    for a, b_ in zip(dev_scans, ref_scans):
        _scan_equal(a, b_)


@pytest.mark.skipif(not _native_available(),
                    reason="native library unavailable")
def test_live_device_scans_defer_readback(monkeypatch):
    """Live device scans park pixel fields in HBM (TPU-native contract):
    headers populate eagerly from the host-staged words, NO device
    readback runs while scans are only queued/counted, and the first
    field touch materializes exactly once, bit-equal to the numpy
    batcher (incl. the host-twin header extraction)."""
    import jax

    from ouster_sdk_tpu.core.batcher import ScanBatcher
    from ouster_sdk_tpu.core.lidar_scan import LidarScan
    from ouster_sdk_tpu.core.packets import LidarPacket
    from ouster_sdk_tpu.io.device_engine import LiveDeviceBatcher

    info = _test_info(7504, 7505)
    frames = {f: [p for _, _, p in _frame_packets(info, f)]
              for f in (1, 2)}
    stream = frames[1] + frames[2]
    ts = [1_000_000 * (i + 1) for i in range(len(stream))]

    ref_scans = []
    b, cur = ScanBatcher(info), LidarScan(info)
    for p, t in zip(stream, ts):
        if b(LidarPacket(np.frombuffer(p, np.uint8), t), cur):
            ref_scans.append(cur)
            cur = LidarScan(info)

    gets = []
    real_get = jax.device_get
    monkeypatch.setattr(
        jax, "device_get", lambda x: (gets.append(1), real_get(x))[1])

    stager = LiveDeviceBatcher(info)
    out = []
    # the guard turns any IMPLICIT device->host transfer (np.asarray /
    # float() coercions) into an error; explicit device_get stays
    # allowed and is counted by the monkeypatch
    with jax.transfer_guard_device_to_host("disallow"):
        for p, t in zip(stream, ts):
            out.extend(stager.push(np.frombuffer(p, np.uint8), t))
        assert [s.frame_id for s in out] == [1, 2]  # count completion

        s = out[0]
        assert s.fields_deferred
        assert gets == []                     # zero d2h so far
        # headers are eager: completion/timestamps need no readback
        assert s.complete()
        assert s.timestamp.any() and s.status.any()
        assert gets == []

    _ = s.field(ChanField.RANGE)              # first touch materializes
    assert not s.fields_deferred
    assert len(gets) == 1
    _scan_equal(s, ref_scans[0])              # bit-equal after resolve
    assert len(gets) == 1                     # ...and exactly one d2h


@pytest.mark.skipif(not _native_available(),
                    reason="native library unavailable")
def test_live_source_device_engine_end_to_end():
    """SensorScanSource(engine='device') delivers device-decoded scans
    from an emulated sensor (stats counters prove the route)."""
    from ouster_sdk_tpu.io import device_engine as de

    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    before = de.stats["batches"]
    with SensorEmulator(info, _frames_factory(info, 10),
                        lidar_port=lidar_port, imu_port=imu_port,
                        rate=1.0) as emu:
        src = SensorScanSource([f"127.0.0.1:{emu.http_port}"],
                               sensor_info=[info],
                               lidar_port=lidar_port, imu_port=imu_port,
                               queue_size=8, timeout=10.0,
                               engine="device")
        try:
            got = 0
            deadline = time.time() + 20
            while got < 3 and time.time() < deadline:
                idx, scan = src.get_scan(timeout_sec=1.0)
                if scan is None:
                    continue
                got += 1
                assert scan.complete()
                assert scan.field(ChanField.RANGE).any()
            assert got >= 3
            assert src.engine_used == ["device"]
            assert de.stats["batches"] > before
        finally:
            src.close()


# ---------------------------------------------------------------------------
# Emulator-timed DELAY analogs of the reference HIL suite
# (ref: tests/hil/test_lidar_delay.py, test_imu_delay.py — there PTP
# makes sensor and host clocks common and the bound is an absolute
# 20 ms / 5 ms average; here the emulator paces by schedule and the
# unknown stream-start offset is baseline-subtracted, so the bound
# covers pacing + transport + parse latency). The same measurement
# helper (_live_helpers.delay_stats) runs against real hardware in
# tests/hil/test_delay.py.
# ---------------------------------------------------------------------------

from _live_helpers import delay_stats, legacy_imu_packet  # noqa: E402


def _paced_factory(info, n_frames, period_ns=100_000_000, imu_hz=100):
    """Lidar frames + LEGACY imu packets on one paced schedule."""
    def factory():
        items = []
        for f in range(n_frames):
            items.extend(_frame_packets(info, frame_id=f + 1,
                                        ts0=f * period_ns))
        imu_period = 10 ** 9 // imu_hz
        for k in range(n_frames * period_ns // imu_period):
            ts = k * imu_period + 137  # offset off the lidar grid
            items.append((ts, "imu", legacy_imu_packet(ts)))
        items.sort(key=lambda t: t[0])
        return items

    return factory


def test_lidar_packet_delay_emulated():
    """Average paced-lidar-packet latency stays under 50 ms (reference
    HIL bound is 20 ms on PTP-synced hardware; the emulated analog adds
    loopback + Python-receive overhead on a 1-CPU host)."""
    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    n_frames = 12
    with SensorEmulator(info, _paced_factory(info, n_frames),
                        lidar_port=lidar_port, imu_port=imu_port,
                        rate=1.0) as emu:
        src = SensorPacketSource(
            [f"127.0.0.1:{emu.http_port}"], sensor_info=[info],
            lidar_port=lidar_port, imu_port=imu_port, timeout=5.0)
        try:
            sched = _paced_factory(info, n_frames)()
            lidar_sched = [t for t, k, _ in sched if k == "lidar"]
            arrivals = []
            while len(arrivals) < len(lidar_sched):
                idx, pkt = src.get_packet(timeout_sec=2.0)
                if pkt is None:
                    break
                if pkt.type().value == "Lidar":
                    arrivals.append(pkt.host_timestamp)
        finally:
            src.close()
    n = min(len(arrivals), len(lidar_sched))
    assert n >= len(lidar_sched) * 3 // 4, f"lost too many packets ({n})"
    avg_ms, p95_ms = delay_stats(arrivals[:n], lidar_sched[:n])
    assert 0.0 <= avg_ms < 50.0, (avg_ms, p95_ms)


def test_imu_vs_lidar_arrival_skew_emulated():
    """IMU and lidar packets sharing one paced schedule arrive with
    bounded relative skew (the emulated analog of the imu-delay bound:
    both stream kinds ride the same socket pair and neither may stall
    behind the other)."""
    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    n_frames = 12
    with SensorEmulator(info, _paced_factory(info, n_frames),
                        lidar_port=lidar_port, imu_port=imu_port,
                        rate=1.0) as emu:
        src = SensorPacketSource(
            [f"127.0.0.1:{emu.http_port}"], sensor_info=[info],
            lidar_port=lidar_port, imu_port=imu_port, timeout=5.0)
        try:
            sched = _paced_factory(info, n_frames)()
            want = {"lidar": [t for t, k, _ in sched if k == "lidar"],
                    "imu": [t for t, k, _ in sched if k == "imu"]}
            got = {"lidar": [], "imu": []}
            total = sum(len(v) for v in want.values())
            seen = 0
            while seen < total:
                idx, pkt = src.get_packet(timeout_sec=2.0)
                if pkt is None:
                    break
                kind = "lidar" if pkt.type().value == "Lidar" else \
                    "imu" if pkt.type().value == "Imu" else None
                if kind:
                    got[kind].append(pkt.host_timestamp)
                    seen += 1
        finally:
            src.close()
    stats = {}
    for kind in ("lidar", "imu"):
        n = min(len(got[kind]), len(want[kind]))
        assert n >= len(want[kind]) * 3 // 4, (kind, n)
        stats[kind] = delay_stats(got[kind][:n], want[kind][:n])
    skew_ms = abs(stats["lidar"][0] - stats["imu"][0])
    assert skew_ms < 25.0, (stats, skew_ms)


def test_packet_to_scan_latency_emulated():
    """Frame completion -> scan release latency through the full
    SensorScanSource pipeline stays bounded: the paced schedule gives
    each frame's LAST packet time; the released scan must surface within
    150 ms of it (batcher thread + queue hop on a 1-CPU host)."""
    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    n_frames = 10
    period = 100_000_000
    with SensorEmulator(info, _frames_factory(info, n_frames,
                                              period_ns=period),
                        lidar_port=lidar_port, imu_port=imu_port,
                        rate=1.0) as emu:
        src = SensorScanSource(
            [f"127.0.0.1:{emu.http_port}"], sensor_info=[info],
            lidar_port=lidar_port, imu_port=imu_port, timeout=5.0)
        try:
            n_pkts = info.format.columns_per_frame // \
                info.format.columns_per_packet
            # frame f's last packet is scheduled at
            # f*period + (n_pkts-1)*100us (see _frame_packets)
            sched, releases = [], []
            import time as _time

            while len(releases) < n_frames - 1:
                idx, scan = src.get_scan(timeout_sec=2.0)
                if scan is None:
                    break
                releases.append(_time.time_ns())
                f = len(releases) - 1
                sched.append(f * period + (n_pkts - 1) * 100_000)
        finally:
            src.close()
    assert len(releases) >= n_frames * 3 // 4, len(releases)
    avg_ms, p95_ms = delay_stats(releases, sched)
    assert 0.0 <= avg_ms < 150.0, (avg_ms, p95_ms)


def test_deferred_fill_failure_restores_hook():
    """A failed deferred fill (flaky link, device OOM) must surface the
    error AND leave the scan deferred — never silently serve the
    zero-initialized arrays as data."""
    from ouster_sdk_tpu.core.lidar_scan import LidarScan

    scan = LidarScan(32, 64)
    attempts = []

    def boom(s):
        attempts.append(1)
        raise RuntimeError("tunnel hiccup")

    scan.set_deferred_fields(boom)
    with pytest.raises(RuntimeError, match="tunnel hiccup"):
        scan.field("RANGE")
    assert scan.fields_deferred          # hook restored, retryable
    with pytest.raises(RuntimeError):
        scan.field("RANGE")              # retry runs the fill again
    assert len(attempts) == 2

    def ok(s):
        s.field("RANGE")[:] = 7

    scan.set_deferred_fields(ok)
    assert (scan.field("RANGE") == 7).all()
    assert not scan.fields_deferred


# ---------------------------------------------------------------------------
# core streaming semantics (ref: tests/hil/test_core.py
# test_scans_consecutive, test_scans_read_gap, test_packets_consecutive,
# tests/hil/test_config.py test_config_noop) — emulator-paced analogs of
# the reference's hardware matrix; tests/hil runs the same semantics
# against real sensors.
# ---------------------------------------------------------------------------

def test_scans_consecutive_emulated():
    """A keeping-up consumer sees every frame: consecutive frame ids,
    all complete (ref: test_core.py test_scans_consecutive)."""
    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    n_frames = 20
    with SensorEmulator(info, _frames_factory(info, n_frames),
                        lidar_port=lidar_port, imu_port=imu_port,
                        rate=1.0) as emu:
        src = SensorScanSource([f"127.0.0.1:{emu.http_port}"],
                               sensor_info=[info],
                               lidar_port=lidar_port, imu_port=imu_port,
                               queue_size=4, timeout=None)
        try:
            frame_ids, scans = [], []
            while len(frame_ids) < n_frames:
                idx, scan = src.get_scan(timeout_sec=5.0)
                if scan is None:
                    break
                frame_ids.append(scan.frame_id)
                scans.append(scan)
        finally:
            src.close()
    # a paced stream with a prompt consumer: nothing dropped, nothing
    # reordered, every scan complete
    assert src.dropped_scans == 0
    assert frame_ids == list(range(1, n_frames + 1))
    assert all(s.complete() for s in scans), "received incomplete scans"


def test_scans_read_gap_emulated():
    """Pausing mid-read against a paced stream with a depth-2 queue
    drops a single contiguous run of frames: exactly one frame-id gap
    (ref: test_core.py test_scans_read_gap)."""
    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    n_frames, period_ns = 24, 200_000_000  # 5 fps -> generous margins
    with SensorEmulator(info,
                        _frames_factory(info, n_frames,
                                        period_ns=period_ns),
                        lidar_port=lidar_port, imu_port=imu_port,
                        rate=1.0) as emu:
        src = SensorScanSource([f"127.0.0.1:{emu.http_port}"],
                               sensor_info=[info],
                               lidar_port=lidar_port, imu_port=imu_port,
                               queue_size=2, timeout=None)
        frame_ids = []
        try:
            for _ in range(5):  # keep up for a while
                idx, scan = src.get_scan(timeout_sec=10.0)
                assert scan is not None
                frame_ids.append(scan.frame_id)
            time.sleep(1.5)  # ~7 frames arrive; queue keeps only 2
            while len(frame_ids) < n_frames:
                idx, scan = src.get_scan(timeout_sec=3.0)
                if scan is None:
                    break
                frame_ids.append(scan.frame_id)
        finally:
            src.close()
    gaps = np.count_nonzero(np.diff(np.asarray(frame_ids,
                                               np.int64)) != 1)
    assert src.dropped_scans > 0
    assert gaps == 1, (frame_ids, src.dropped_scans)
    assert frame_ids == sorted(frame_ids), "reordered frames"


def test_packets_consecutive_measurement_ids_emulated():
    """No packet loss or reorder on a paced stream: concatenated
    measurement ids advance by exactly 1 (mod W) across the whole
    capture (ref: test_core.py test_packets_consecutive)."""
    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    from ouster_sdk_tpu import PacketFormat

    pf = PacketFormat.from_info(info)
    w = info.format.columns_per_frame
    n_frames = 3
    expected = n_frames * (w // info.format.columns_per_packet)
    with SensorEmulator(info, _frames_factory(info, n_frames),
                        lidar_port=lidar_port, imu_port=imu_port,
                        rate=1.0) as emu:
        src = SensorPacketSource(["127.0.0.1"], sensor_info=[info],
                                 lidar_port=lidar_port,
                                 imu_port=imu_port, timeout=None)
        mids = []
        try:
            while len(mids) < expected:
                idx, pkt = src.get_packet(timeout_sec=3.0)
                if pkt is None:
                    break
                if pkt.type().value == "Lidar":
                    mids.append(pf.col_measurement_id(pkt.buf)
                                .astype(np.int64))
        finally:
            src.close()
    assert len(mids) == expected, "lost packets on loopback"
    all_mids = np.concatenate(mids)
    assert np.count_nonzero(np.diff(all_mids) % w != 1) == 0, \
        "non-consecutive measurement ids"


def test_config_noop_emulated():
    """Setting the empty config changes nothing: active and staged
    params identical before/after (ref: test_config.py
    test_config_noop)."""
    from ouster_sdk_tpu.core.types import SensorConfig
    from ouster_sdk_tpu.sensor.http import SensorHttp, get_config, \
        set_config

    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    with SensorEmulator(info, _frames_factory(info, 1),
                        lidar_port=lidar_port, imu_port=imu_port,
                        rate=0.0) as emu:
        host = f"127.0.0.1:{emu.http_port}"
        http = SensorHttp.create(host)
        cfg0 = get_config(host)
        active0 = http.active_config_params()
        set_config(host, SensorConfig())
        cfg1 = get_config(host)
        active1 = http.active_config_params()
    assert cfg0 == cfg1
    assert active0 == active1


# ---------------------------------------------------------------------------
# the HIL config matrix (ref: tests/hil/test_config.py:26-230) — the
# emulator's config plane enforces fw-style domain validation at
# set_config_param, cross-parameter validation at reinitialize, persist
# via save_config_params, and restart-from-persisted, so every client
# error path executes in-image. tests/hil/test_config.py runs the same
# matrix against real sensors.
# ---------------------------------------------------------------------------

def _config_rig(rate=0.0, n_frames=1, endless=False):
    """(emu ctx, host) pair for config-plane tests. endless=True uses a
    LAZY generator factory (one synthesized frame replayed with paced
    timestamps) so long streams start instantly."""
    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    if endless:
        base = synth_frame_packets(info, frame_id=1)
        period_ns = 20_000_000

        def factory():
            for f in range(n_frames):
                ts0 = f * period_ns
                for i, raw in enumerate(base):
                    yield (ts0 + i * 100_000, "lidar", raw)
    else:
        factory = _frames_factory(info, n_frames)
    emu = SensorEmulator(info, factory,
                         lidar_port=lidar_port, imu_port=imu_port,
                         rate=rate, loop=rate > 0)
    return emu, info


def test_config_noop_reinit_changes_init_id_emulated():
    """A forced reinit bumps init_id in metadata but nothing else
    changes (ref: test_config.py test_config_noop init_id check)."""
    import json

    from ouster_sdk_tpu.core.types import SensorConfig
    from ouster_sdk_tpu.sensor.http import SensorHttp, set_config

    emu, info = _config_rig()
    with emu:
        host = f"127.0.0.1:{emu.http_port}"
        http = SensorHttp.create(host)
        meta0 = json.loads(http.metadata())
        set_config(host, SensorConfig(), force_reinit=True)
        meta1 = json.loads(http.metadata())
    i0 = meta0["sensor_info"]["initialization_id"]
    i1 = meta1["sensor_info"]["initialization_id"]
    assert i1 != i0
    meta1["sensor_info"]["initialization_id"] = i0
    assert meta0 == meta1


def test_config_basic_emulated():
    """Basic values round-trip through set_config/get_config
    (ref: test_config.py test_config_basic)."""
    from ouster_sdk_tpu.core.types import TimestampMode
    from ouster_sdk_tpu.sensor.http import get_config, set_config

    emu, info = _config_rig()
    with emu:
        host = f"127.0.0.1:{emu.http_port}"
        cfg0 = get_config(host)
        cfg0.timestamp_mode = TimestampMode.TIME_FROM_PTP_1588
        cfg0.nmea_leap_seconds = 20
        set_config(host, cfg0)
        cfg1 = get_config(host)
    assert cfg1 == cfg0


def test_config_operating_mode_emulated():
    """operating_mode sets and GATES the data plane: STANDBY silences
    the stream, NORMAL resumes it (ref: test_config.py
    test_config_operating_mode)."""
    from ouster_sdk_tpu.core.types import OperatingMode, SensorConfig
    from ouster_sdk_tpu.sensor.http import get_config, set_config

    emu, info = _config_rig(rate=1.0, n_frames=2000, endless=True)
    with emu:
        host = f"127.0.0.1:{emu.http_port}"
        deadline = time.monotonic() + 5
        while emu.packets_sent == 0 and time.monotonic() < deadline:
            time.sleep(0.05)
        assert emu.packets_sent > 0, "stream never started"

        cfg0 = SensorConfig()
        cfg0.operating_mode = OperatingMode.STANDBY
        set_config(host, cfg0)
        assert get_config(host).operating_mode == OperatingMode.STANDBY
        time.sleep(0.3)               # drain in-flight sends
        sent0 = emu.packets_sent
        time.sleep(0.5)
        assert emu.packets_sent == sent0, "STANDBY sensor kept streaming"

        cfg0.operating_mode = OperatingMode.NORMAL
        set_config(host, cfg0)
        deadline = time.monotonic() + 5
        while emu.packets_sent == sent0 and time.monotonic() < deadline:
            time.sleep(0.05)
        assert emu.packets_sent > sent0, "stream did not resume"


def test_config_udp_auto_emulated():
    """udp_dest="" stops data (ClientTimeout); set_config with
    udp_dest_auto restores delivery to this host (ref: test_config.py
    test_config_udp_auto)."""
    from ouster_sdk_tpu.core.types import SensorConfig
    from ouster_sdk_tpu.sensor.http import get_config, set_config

    emu, info = _config_rig(rate=1.0, n_frames=2000, endless=True)
    with emu:
        host = f"127.0.0.1:{emu.http_port}"
        no_udp = SensorConfig()
        no_udp.udp_dest = ""
        set_config(host, no_udp)
        assert (get_config(host).udp_dest or "") == ""

        with pytest.raises(ClientTimeout):
            src = SensorPacketSource(
                [host], sensor_info=[info],
                lidar_port=info.config.udp_port_lidar,
                imu_port=info.config.udp_port_imu,
                no_auto_udp_dest=True, timeout=1.0)
            try:
                for _ in range(10):
                    idx, pkt = src.get_packet(timeout_sec=0.2)
                    assert pkt is None, "data while udp_dest disabled"
                raise ClientTimeout("no data (manual poll)")
            finally:
                src.close()

        # auto re-resolves to this host and data flows again
        set_config(host, SensorConfig(), udp_dest_auto=True)
        cfg1 = get_config(host)
        assert cfg1.udp_dest == "127.0.0.1"
        src = SensorPacketSource(
            [host], sensor_info=[info],
            lidar_port=info.config.udp_port_lidar,
            imu_port=info.config.udp_port_imu,
            no_auto_udp_dest=True, timeout=5.0)
        try:
            got = 0
            deadline = time.monotonic() + 8
            while got < 5 and time.monotonic() < deadline:
                idx, pkt = src.get_packet(timeout_sec=1.0)
                if pkt is not None:
                    got += 1
            assert got == 5, "no data after udp_dest auto"
        finally:
            src.close()


def test_config_persist_emulated():
    """persist=True survives a restart; without it the restart reverts
    to the persisted set (ref: test_config.py test_config_persist)."""
    from ouster_sdk_tpu.core.types import SensorConfig
    from ouster_sdk_tpu.sensor.http import SensorHttp, get_config, \
        set_config

    emu, info = _config_rig()
    with emu:
        host = f"127.0.0.1:{emu.http_port}"
        base = get_config(host)
        set_config(host, base, persist=True)

        cfg0 = SensorConfig()
        cfg0.azimuth_window = (583, 39402)
        set_config(host, cfg0)          # not persisted
        assert get_config(host).azimuth_window == (583, 39402)

        SensorHttp.create(host).restart()
        assert get_config(host).azimuth_window == base.azimuth_window

        set_config(host, cfg0, persist=True)
        SensorHttp.create(host).restart()
        assert get_config(host).azimuth_window == (583, 39402)


@pytest.mark.parametrize("signal_multiplier", [0.25, 0.5, 1, 2, 3])
def test_good_signal_multiplier_values_emulated(signal_multiplier):
    """Every valid signal multiplier sets and reads back; the azimuth
    window is narrowed first so >1 multipliers pass cross-validation
    (ref: test_config.py test_good_signal_multiplier_values)."""
    from ouster_sdk_tpu.core.types import LidarMode, SensorConfig
    from ouster_sdk_tpu.sensor.http import get_config, set_config

    emu, info = _config_rig()
    with emu:
        host = f"127.0.0.1:{emu.http_port}"
        cfg0 = SensorConfig()
        cfg0.azimuth_window = (0, 10000)
        cfg0.lidar_mode = LidarMode.from_string("1024x10")
        cfg0.signal_multiplier = signal_multiplier
        set_config(host, cfg0)
        cfg1 = get_config(host)
    assert cfg1.signal_multiplier == signal_multiplier


@pytest.mark.parametrize("signal_multiplier", [0.3, 1.2, 5, 5.5])
def test_bad_signal_multiplier_values_emulated(signal_multiplier):
    """Out-of-domain signal multipliers raise through the real client
    path (ref: test_config.py test_bad_signal_multiplier_values)."""
    from ouster_sdk_tpu.core.types import LidarMode, SensorConfig
    from ouster_sdk_tpu.sensor.http import set_config

    emu, info = _config_rig()
    with emu:
        host = f"127.0.0.1:{emu.http_port}"
        cfg0 = SensorConfig()
        cfg0.azimuth_window = (0, 10000)
        cfg0.lidar_mode = LidarMode.from_string("1024x10")
        cfg0.signal_multiplier = signal_multiplier
        with pytest.raises(RuntimeError):
            set_config(host, cfg0)


def test_signal_multiplier_window_cross_validation_emulated():
    """A valid multiplier with a too-wide azimuth window is rejected at
    REINITIALIZE, not at staging — the fw's cross-parameter rule (2x
    needs <=180 deg) the accept matrix sidesteps by narrowing first."""
    from ouster_sdk_tpu.core.types import SensorConfig
    from ouster_sdk_tpu.sensor.http import SensorHttp, set_config

    emu, info = _config_rig()
    with emu:
        host = f"127.0.0.1:{emu.http_port}"
        http = SensorHttp.create(host)
        # staging alone succeeds (domain-valid)...
        http.set_config_param("signal_multiplier", 2)
        assert http.staged_config_params()["signal_multiplier"] == 2
        # ...the reinit rejects the merged set (full default window)
        with pytest.raises(RuntimeError):
            http.reinitialize()
        # and set_config of the same pair raises end-to-end
        cfg = SensorConfig()
        cfg.signal_multiplier = 2
        cfg.azimuth_window = (0, 200000)   # > 180 deg at 2x
        with pytest.raises(RuntimeError):
            set_config(host, cfg)


@pytest.mark.parametrize("key,bad", [
    ("lidar_mode", "3000x10"),
    ("timestamp_mode", "TIME_FROM_NOWHERE"),
    ("operating_mode", "SLEEPING"),
    ("azimuth_window", [0, 400000]),
    ("udp_port_lidar", 70000),
    ("nmea_leap_seconds", -3),
])
def test_bad_config_param_domains_emulated(key, bad):
    """The fw rejects out-of-domain values for every validated knob;
    the client surfaces each as RuntimeError (ref: the fw validation
    surface behind test_config.py's matrix)."""
    from ouster_sdk_tpu.sensor.http import SensorHttp

    emu, info = _config_rig()
    with emu:
        host = f"127.0.0.1:{emu.http_port}"
        http = SensorHttp.create(host)
        with pytest.raises(RuntimeError):
            http.set_config_param(key, bad)
        # nothing staged by the failed set
        assert key not in {
            k: v for k, v in http.staged_config_params().items()
            if http.active_config_params().get(k) != v}


# ---------------------------------------------------------------------------
# emulator data-plane fidelity regressions
# ---------------------------------------------------------------------------

def test_emulator_udp_dest_constructor_wins():
    """Metadata recorded with a foreign udp_dest must not hijack the
    emulator's data plane: the constructor's destination wins at
    startup (regression: a real fixture's capture-time LAN address in
    config_params silently blackholed the loopback stream)."""
    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    info.config.udp_dest = "169.254.196.55"  # stale capture-time addr
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", lidar_port))
    sock.settimeout(5.0)
    try:
        with SensorEmulator(info, _frames_factory(info, 3),
                            lidar_port=lidar_port, imu_port=imu_port,
                            rate=0):
            data = sock.recv(65535)
        assert len(data) > 0
    finally:
        sock.close()


def test_emulator_restamps_init_id_after_reinit():
    """After a reinit bump the data plane must stamp the NEW init_id:
    a client that resolves metadata over HTTP (no sensor_info override)
    sees the bumped id and would otherwise hard-drop every pre-baked
    packet still carrying the original one (regression)."""
    from ouster_sdk_tpu.core.types import SensorConfig
    from ouster_sdk_tpu.sensor.http import set_config

    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    info.init_id = 37
    with SensorEmulator(info, _frames_factory(info, 30),
                        lidar_port=lidar_port, imu_port=imu_port,
                        rate=1.0) as emu:
        host = f"127.0.0.1:{emu.http_port}"
        set_config(host, SensorConfig(), force_reinit=True)  # 37 -> 38
        src = SensorScanSource([host],
                               lidar_port=lidar_port, imu_port=imu_port,
                               queue_size=4, timeout=None)
        try:
            fetched = src.sensor_info[0].init_id
            idx, scan = src.get_scan(timeout_sec=10.0)
        finally:
            src.close()
    assert fetched == 38, f"metadata should carry the bumped id, got " \
        f"{fetched}"
    assert scan is not None and scan.complete()


# ---------------------------------------------------------------------------
# dynamic (ephemeral) ports, partial-traffic timeout, metadata endpoint
# (ref: tests/hil/test_core.py test_packets_dynamic_port:86,
#  test_scans_read_timeout_only_imu:304, test_sensor_metadata_endpoint:208;
#  sensor_packet_source.cpp:344-365 "Opening ephemeral port")
# ---------------------------------------------------------------------------

def test_packets_dynamic_port_emulated():
    """lidar_port=0 binds an OS-assigned port and reconfigures the
    sensor to send there; two concurrent sources coexist, each with
    distinct ephemeral ports, and the stream follows the most recent
    configuration (ref: test_core.py test_packets_dynamic_port)."""
    emu, info = _config_rig(rate=1.0, n_frames=600, endless=True)
    with emu:
        host = f"127.0.0.1:{emu.http_port}"
        src1 = SensorPacketSource([host], lidar_port=0, imu_port=0,
                                  timeout=5.0)
        try:
            c1 = src1._clients[0]
            # a real OS-assigned port, not a default or the emulator's
            assert c1.lidar_port not in (0, 7502, emu.lidar_port)
            assert c1.imu_port not in (0, 7503, emu.imu_port)
            assert c1.lidar_port != c1.imu_port
            # the sensor was reconfigured to send at the ephemeral port
            idx, pkt = next(iter(src1))
            assert pkt is not None

            src2 = SensorPacketSource([host], lidar_port=0, imu_port=0,
                                      timeout=5.0)
            try:
                c2 = src2._clients[0]
                assert c2.lidar_port not in (0, c1.lidar_port)
                # stream now follows the second source's config
                idx, pkt = next(iter(src2))
                assert pkt is not None
            finally:
                src2.close()
        finally:
            src1.close()


def test_dynamic_port_rejected_with_metadata_emulated():
    """Ephemeral ports cannot be combined with a sensor_info override
    (ref: sensor_packet_source.cpp:384-389 invalid_argument)."""
    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    with pytest.raises(ValueError,
                       match="Cannot specify ephemeral ports when "
                             "providing metadata"):
        SensorPacketSource(["127.0.0.1"], sensor_info=[info],
                           lidar_port=0, imu_port=0)


def test_scans_read_timeout_only_imu_emulated():
    """IMU packets arriving without lidar packets still time the scan
    iterator out: traffic is not scans (ref: test_core.py
    test_scans_read_timeout_only_imu)."""
    emu_lidar, imu_port, dead_lidar = _free_ports(3)
    info = _test_info(emu_lidar, imu_port)
    n_frames = 40
    with SensorEmulator(info, _paced_factory(info, n_frames),
                        lidar_port=emu_lidar, imu_port=imu_port,
                        rate=1.0) as emu:
        # listen for imu where the emulator sends it, but point the
        # lidar socket at a silent port
        src = SensorScanSource([f"127.0.0.1:{emu.http_port}"],
                               sensor_info=[info],
                               lidar_port=dead_lidar, imu_port=imu_port,
                               timeout=1.0)
        try:
            with pytest.raises(ClientTimeout):
                next(iter(src))
        finally:
            src.close()


def test_sensor_metadata_endpoint_emulated():
    """SensorInfo parsed from the raw HTTP metadata endpoint matches
    the one the client resolves, and only the client-side serialization
    adds the 'ouster-sdk' section (ref: test_core.py
    test_sensor_metadata_endpoint)."""
    import json as _json
    import urllib.request

    from ouster_sdk_tpu import SensorInfo

    lidar_port, imu_port = _free_ports(2)
    info = _test_info(lidar_port, imu_port)
    with SensorEmulator(info, _frames_factory(info, 1),
                        lidar_port=lidar_port, imu_port=imu_port,
                        rate=0.0) as emu:
        host = f"127.0.0.1:{emu.http_port}"
        with urllib.request.urlopen(
                f"http://{host}/api/v1/sensor/metadata") as r:
            text = r.read().decode()
        # the reference round-trips through the SensorInfo(str) ctor
        metadata = SensorInfo(SensorInfo(text).to_json_string())
        src = SensorPacketSource([host], timeout=None)
        try:
            assert metadata.config == src.sensor_info[0].config
            assert metadata.has_fields_equal(src.sensor_info[0])
            assert type(metadata) == type(src.sensor_info[0])  # noqa: E721
            assert metadata == src.sensor_info[0]
        finally:
            src.close()
        meta_via_endpoint = _json.loads(text)
        meta_via_client = _json.loads(
            src.sensor_info[0].to_json_string())
        assert "ouster-sdk" not in meta_via_endpoint
        assert "ouster-sdk" in meta_via_client
