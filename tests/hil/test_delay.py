"""Hardware delay measurements (ref: tests/hil/test_lidar_delay.py,
test_imu_delay.py): average packet delay vs the sensor's own timestamps.
Requires --sensor <hostname> with a PTP/host-synced timestamp mode for
the absolute bounds; the relative (jitter) assertions hold regardless.

The measurement helper is SHARED with the emulator-timed analogs
(tests/test_hil_emulated.py) via tests/_live_helpers.delay_stats, so the
same math runs against real hardware and the in-image emulator rig.
"""

import os
import sys
import time

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from _live_helpers import delay_stats  # noqa: E402

# PTP timestamps are TAI; time.time_ns() is UNIX (leap-second offset)
TAI_OFFSET_NS = 37 * 10 ** 9


def test_lidar_packet_delay(sensor_hostname):
    """Average lidar packet delay (host receive minus column timestamp)
    stays within the reference bound when the sensor is PTP-synced
    (ref: test_lidar_delay.py: 0 < avg < 20 ms); jitter bound otherwise."""
    from ouster_sdk_tpu import PacketFormat
    from ouster_sdk_tpu.sensor.scan_source import SensorPacketSource

    warm_up, samples = 200, 1000
    src = SensorPacketSource([sensor_hostname])
    try:
        info = src.sensor_info[0]
        pf = PacketFormat.from_info(info)
        arrivals, sensor_ts = [], []
        while len(arrivals) < warm_up + samples:
            idx, pkt = src.get_packet(timeout_sec=5.0)
            if pkt is None or pkt.type().value != "Lidar":
                continue
            arrivals.append(time.time_ns())
            sensor_ts.append(int(pf.col_timestamp(pkt.buf)[0]))
    finally:
        src.close()

    ptp = str(getattr(info.config, "timestamp_mode", "")).endswith("PTP_1588")
    if ptp:
        delays_ms = (np.asarray(arrivals[warm_up:], np.int64)
                     - (np.asarray(sensor_ts[warm_up:], np.int64)
                        - TAI_OFFSET_NS)) * 1e-6
        avg = float(delays_ms.mean())
        assert 0.0 < avg < 20.0, avg
    else:
        avg_ms, p95_ms = delay_stats(arrivals[warm_up:],
                                     sensor_ts[warm_up:])
        assert avg_ms < 20.0, (avg_ms, p95_ms)


def test_imu_packet_delay(sensor_hostname):
    """Average imu packet delay (ref: test_imu_delay.py: 1-5 ms PTP
    absolute; relative jitter bound otherwise)."""
    from ouster_sdk_tpu import PacketFormat
    from ouster_sdk_tpu.sensor.scan_source import SensorPacketSource

    warm_up, samples = 10, 100
    src = SensorPacketSource([sensor_hostname])
    try:
        info = src.sensor_info[0]
        pf = PacketFormat.from_info(info)
        arrivals, sensor_ts = [], []
        while len(arrivals) < warm_up + samples:
            idx, pkt = src.get_packet(timeout_sec=5.0)
            if pkt is None or pkt.type().value != "Imu":
                continue
            arrivals.append(time.time_ns())
            sensor_ts.append(int(pf.imu_gyro_ts(pkt.buf)))
    finally:
        src.close()

    ptp = str(getattr(info.config, "timestamp_mode", "")).endswith("PTP_1588")
    if ptp:
        delays_ms = (np.asarray(arrivals[warm_up:], np.int64)
                     - (np.asarray(sensor_ts[warm_up:], np.int64)
                        - TAI_OFFSET_NS)) * 1e-6
        avg = float(delays_ms.mean())
        assert 0.0 < avg < 5.0, avg
    else:
        avg_ms, p95_ms = delay_stats(arrivals[warm_up:],
                                     sensor_ts[warm_up:])
        assert avg_ms < 5.0, (avg_ms, p95_ms)
