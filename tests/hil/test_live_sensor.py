"""Live-sensor HIL tests (ref: tests/hil/ config matrix, delay tests).
Run: pytest tests/hil --sensor os-99xxxxxxxxxx.local"""

import time

import numpy as np
import pytest


def test_metadata_fetch(sensor_hostname):
    from ouster_sdk_tpu.sensor.http import fetch_metadata

    info = fetch_metadata(sensor_hostname)
    assert info.sn > 0
    assert info.format.pixels_per_column in (16, 32, 64, 128)


def test_config_get_set_roundtrip(sensor_hostname):
    from ouster_sdk_tpu.sensor.http import SensorHttp

    http_client = SensorHttp.create(sensor_hostname)
    cfg = http_client.active_config_params()
    assert "lidar_mode" in cfg


def test_live_scans(sensor_hostname):
    from ouster_sdk_tpu.sensor.scan_source import SensorScanSource

    src = SensorScanSource([sensor_hostname])
    try:
        idx, scan = src.get_scan(timeout_sec=20.0)
        assert scan is not None, "no scan within timeout"
        assert scan.field("RANGE").any()
    finally:
        src.close()


def test_lidar_packet_delay(sensor_hostname):
    """Packet host-receive jitter (ref: tests/hil/test_lidar_delay.py)."""
    from ouster_sdk_tpu.sensor.scan_source import SensorPacketSource

    src = SensorPacketSource([sensor_hostname])
    try:
        deltas = []
        last = None
        for _ in range(200):
            idx, pkt = src.get_packet(timeout_sec=5.0)
            if pkt is None or pkt.type().value != "Lidar":
                continue
            if last is not None:
                deltas.append(pkt.host_timestamp - last)
            last = pkt.host_timestamp
        assert deltas, "no lidar packets received"
        assert np.median(deltas) < 50e6  # < 50 ms between packets
    finally:
        src.close()
