"""Core live-streaming semantics against a real sensor
(ref: tests/hil/test_core.py, test_config.py). Requires
--sensor <hostname>; the same semantics run in-image against the
emulator rig in tests/test_hil_emulated.py (scans-consecutive,
read-gap, consecutive measurement ids, config noop).
"""

import time

import numpy as np
import pytest


def _scan_source(hostname, **kw):
    from ouster_sdk_tpu.sensor.scan_source import SensorScanSource

    return SensorScanSource([hostname], **kw)


def _take_scans(src, n, timeout=10.0):
    out = []
    while len(out) < n:
        idx, scan = src.get_scan(timeout_sec=timeout)
        if scan is None:
            break
        out.append(scan)
    return out


def _n_frame_id_gaps(scans):
    fids = np.asarray([s.frame_id for s in scans], np.int64)
    return int(np.count_nonzero(np.diff(fids) % 2 ** 16 != 1))


def test_scans_consecutive(sensor_hostname):
    """Complete, consecutive scans from a keeping-up consumer
    (ref: test_core.py test_scans_consecutive)."""
    src = _scan_source(sensor_hostname, timeout=2.0)
    try:
        _take_scans(src, 10)  # flush
        scans = _take_scans(src, 10)
    finally:
        src.close()
    assert len(scans) == 10
    assert all(s.complete() for s in scans), "received incomplete scans"
    assert _n_frame_id_gaps(scans) == 0, "gap in frame ids"


def test_scans_read_gap(sensor_hostname):
    """Sleeping mid-read causes exactly one frame-id gap
    (ref: test_core.py test_scans_read_gap)."""
    src = _scan_source(sensor_hostname, timeout=2.0)
    try:
        _take_scans(src, 10)  # flush
        scans = _take_scans(src, 10)
        time.sleep(1.0)
        scans += _take_scans(src, 10)
    finally:
        src.close()
    assert len(scans) == 20
    assert all(s.complete() for s in scans), "received incomplete scans"
    assert _n_frame_id_gaps(scans) == 1, \
        "did not get exactly one gap in frame ids"


def test_scans_read_timeout(sensor_hostname):
    """Reading scans with both ports pointed away times out
    (ref: test_core.py test_scans_read_timeout)."""
    from ouster_sdk_tpu.sensor.scan_source import (ClientTimeout,
                                                   SensorPacketSource)

    with SensorPacketSource([sensor_hostname]) as probe:
        metadata = probe.sensor_info
    metadata[0].config.udp_port_lidar = 7505
    metadata[0].config.udp_port_imu = 7505
    src = _scan_source(sensor_hostname, sensor_info=metadata,
                       timeout=1.0)
    try:
        with pytest.raises(ClientTimeout):
            for _ in src:
                pytest.fail("no scans should arrive on port 7505")
    finally:
        src.close()


def test_only_lidar_packets(sensor_hostname):
    """Scans still batch when only lidar packets arrive (imu port
    pointed away; ref: test_core.py test_only_lidar_packets)."""
    from ouster_sdk_tpu.sensor.scan_source import SensorPacketSource

    with SensorPacketSource([sensor_hostname]) as probe:
        metadata = probe.sensor_info
    metadata[0].config.udp_port_imu = 7505
    src = SensorPacketSource([sensor_hostname], sensor_info=metadata,
                             timeout=2.0)
    try:
        packets = []
        while len(packets) < 640:
            idx, pkt = src.get_packet(timeout_sec=5.0)
            assert pkt is not None, "packet stream stalled"
            packets.append(pkt)
    finally:
        src.close()
    assert all(p.type().value == "Lidar" for p in packets)


def test_packets_nonstandard_port(sensor_hostname):
    """Packets readable on a nonstandard port pair
    (ref: test_core.py test_packets_nonstandard_port)."""
    from ouster_sdk_tpu.sensor.scan_source import SensorPacketSource

    src = SensorPacketSource([sensor_hostname], lidar_port=7504,
                             imu_port=7505, timeout=2.0)
    try:
        packets = []
        while len(packets) < 640:
            idx, pkt = src.get_packet(timeout_sec=5.0)
            assert pkt is not None, "packet stream stalled"
            packets.append(pkt)
    finally:
        src.close()
    assert len(packets) == 640


def test_packets_consecutive(sensor_hostname):
    """Measurement ids advance by exactly 1 (mod W): no packet loss
    (ref: test_core.py test_packets_consecutive)."""
    from ouster_sdk_tpu import PacketFormat
    from ouster_sdk_tpu.sensor.scan_source import SensorPacketSource

    src = SensorPacketSource([sensor_hostname], timeout=2.0,
                             buffer_time_sec=2.0)
    try:
        info = src.sensor_info[0]
        pf = PacketFormat.from_info(info)
        w = info.format.columns_per_frame
        flushed = 0
        while flushed < 640:  # flush startup
            idx, pkt = src.get_packet(timeout_sec=5.0)
            assert pkt is not None
            flushed += 1
        mids = []
        deadline = time.monotonic() + 10.0
        while time.monotonic() < deadline:
            idx, pkt = src.get_packet(timeout_sec=5.0)
            if pkt is not None and pkt.type().value == "Lidar":
                mids.append(pf.col_measurement_id(pkt.buf)
                            .astype(np.int64))
    finally:
        src.close()
    all_mids = np.concatenate(mids)
    assert np.count_nonzero(np.diff(all_mids) % w != 1) == 0, \
        "got non-consecutive measurements"


def test_config_noop(sensor_hostname):
    """Setting the empty config does not change sensor params
    (ref: test_config.py test_config_noop)."""
    from ouster_sdk_tpu.core.types import SensorConfig
    from ouster_sdk_tpu.sensor.http import get_config, set_config

    cfg0 = get_config(sensor_hostname)
    set_config(sensor_hostname, SensorConfig(), force_reinit=True)
    cfg1 = get_config(sensor_hostname)
    assert cfg0 == cfg1


def test_packets_dynamic_port(sensor_hostname):
    """lidar_port=0 / imu_port=0 select OS-assigned ephemeral ports;
    two concurrent sources coexist
    (ref: test_core.py test_packets_dynamic_port)."""
    from ouster_sdk_tpu.sensor.scan_source import SensorPacketSource

    with SensorPacketSource([sensor_hostname], lidar_port=0,
                            imu_port=0, timeout=5.0) as s1, \
            SensorPacketSource([sensor_hostname], lidar_port=0,
                               imu_port=0, timeout=5.0) as s2:
        p1, p2 = s1._clients[0].lidar_port, s2._clients[0].lidar_port
        assert p1 not in (0, 7502) and p2 not in (0, 7502) and p1 != p2
        # the stream follows the most recent configuration
        idx, pkt = next(iter(s2))
        assert pkt is not None


def test_packets_timeout(sensor_hostname):
    """Reading times out when pointed at ports where no packets arrive
    (ref: test_core.py test_packets_timeout)."""
    from ouster_sdk_tpu.sensor.scan_source import (
        ClientTimeout,
        SensorPacketSource,
    )

    with SensorPacketSource([sensor_hostname]) as probe:
        metadata = [probe.sensor_info[0]]
    metadata[0].config.udp_port_lidar = 7505
    metadata[0].config.udp_port_imu = 7505
    with pytest.raises(ClientTimeout):
        with SensorPacketSource([sensor_hostname],
                                sensor_info=metadata,
                                timeout=2.0) as src:
            next(iter(src))


def test_scans_read_timeout_only_imu(sensor_hostname):
    """Scan reads time out when only IMU packets are arriving
    (ref: test_core.py test_scans_read_timeout_only_imu)."""
    from ouster_sdk_tpu.sensor.scan_source import ClientTimeout

    probe = _scan_source(sensor_hostname, timeout=None)
    try:
        metadata = [probe.sensor_info[0]]
    finally:
        probe.close()
    imu_port = metadata[0].config.udp_port_imu
    src = _scan_source(sensor_hostname, sensor_info=metadata,
                       lidar_port=7505, imu_port=imu_port, timeout=1.0)
    try:
        with pytest.raises(ClientTimeout):
            next(iter(src))
    finally:
        src.close()


def test_sensor_metadata_endpoint(sensor_hostname):
    """SensorInfo parsed from the raw HTTP metadata endpoint matches
    the client's resolved metadata; only the client-side serialization
    adds the 'ouster-sdk' section
    (ref: test_core.py test_sensor_metadata_endpoint)."""
    import json
    import urllib.request

    from ouster_sdk_tpu import SensorInfo
    from ouster_sdk_tpu.sensor.scan_source import SensorPacketSource

    with SensorPacketSource([sensor_hostname], timeout=None) as src:
        with urllib.request.urlopen(
                f"http://{sensor_hostname}/api/v1/sensor/metadata") as r:
            text = r.read().decode()
        metadata = SensorInfo(SensorInfo(text).to_json_string())
        assert metadata.config == src.sensor_info[0].config
        assert metadata.has_fields_equal(src.sensor_info[0])
        assert metadata == src.sensor_info[0]
        assert "ouster-sdk" not in json.loads(text)
        assert "ouster-sdk" in json.loads(
            src.sensor_info[0].to_json_string())
