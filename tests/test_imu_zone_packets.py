"""IMU (ACCEL32_GYRO32_NMEA) and zone packet batching against the
imu_zm_no_lidar fixture (ref: tests/fusa_profile_test.cpp + zone packet
batching in scan_batcher_test.cpp)."""

import os

import numpy as np
import pytest

from ouster_sdk_tpu import ChanField, LidarScan, PacketFormat, ScanBatcher
from ouster_sdk_tpu.io.pcap_source import PcapPacketSource

PCAP = "/root/reference/tests/pcaps/imu_zm_no_lidar.pcap"
META = "/root/reference/tests/pcaps/imu_zm_no_lidar_0.json"


@pytest.fixture(scope="module")
def source():
    if not (os.path.exists(PCAP) and os.path.exists(META)):
        pytest.skip("fixture missing")
    return PcapPacketSource(PCAP, metadata_paths=[META])


def test_imu_zone_packet_classification(source):
    info = source.sensor_info[0]
    assert info.format.imu_measurements_per_packet == 8
    assert info.format.imu_packets_per_frame == 8
    assert info.format.zone_monitoring_enabled
    pf = PacketFormat.from_info(info)
    assert pf.imu_packet_size == 452
    assert pf.zone_packet_size == 680

    kinds = [p.type().value for _, p in source]
    assert kinds.count("Imu") == 8
    assert kinds.count("Zone") == 1


def test_imu_zone_batching(source):
    info = source.sensor_info[0]
    batcher = ScanBatcher(info)
    scan = LidarScan(info)
    assert scan.has_field(ChanField.IMU_ACC)
    assert scan.has_field(ChanField.ZONE_STATES)

    for idx, pkt in source:
        batcher(pkt, scan)

    imu_ts = scan.field(ChanField.IMU_TIMESTAMP)
    assert (imu_ts > 0).sum() >= 8, "imu measurements not populated"
    acc = scan.field(ChanField.IMU_ACC)
    gyro = scan.field(ChanField.IMU_GYRO)
    nz = imu_ts > 0
    # plausible gravity magnitude on the accel rows that were filled
    mags = np.linalg.norm(acc[nz], axis=1)
    assert (np.abs(mags - 9.81) < 3.0).mean() > 0.5, mags[:5]
    assert np.isfinite(gyro).all()

    # zone scan-level fields
    assert scan.field(ChanField.ZONE_TIMESTAMP)[0] > 0
    zs = scan.field(ChanField.ZONE_STATES)
    assert zs.shape == (16,)
    # position/NMEA fields exist and are populated per imu packet
    pos = scan.field(ChanField.POSITION_STRING)
    assert pos.shape[0] == info.format.imu_packets_per_frame


def test_imu_parse_values(source):
    info = source.sensor_info[0]
    pf = PacketFormat.from_info(info)
    imu_pkt = next(p for _, p in source if p.type().value == "Imu")
    ts, m_id, status = pf.imu_measurement_headers(imu_pkt.buf)
    assert ts.shape == (8,)
    acc = pf.parse_accel(imu_pkt.buf)
    assert acc.shape == (8, 3)
    sentence = pf.imu_nmea_sentence(imu_pkt.buf)
    assert len(sentence) == 84
