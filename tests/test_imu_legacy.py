"""Legacy 48-byte IMU packet parity: accessor decode vs a literal struct
layout (ref: ouster_client/src/parsing.cpp imu_* accessors — sys_ts u64@0,
accel_ts u64@8, gyro_ts u64@16, then six f32 la_x..av_z @24..44)."""

import glob
import os
import struct

import numpy as np
import pytest

from ouster_sdk_tpu import ChanField, LidarScan, PacketFormat, ScanBatcher
from ouster_sdk_tpu.io.pcap_source import PcapPacketSource

PCAP = "/root/reference/tests/pcaps/OS-2-128-U1_v2.3.0_1024x10.pcap"


@pytest.fixture(scope="module")
def imu_packets():
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    src = PcapPacketSource(PCAP)
    pkts = [p for _, p in src if p.type().value == "Imu"]
    if not pkts:
        pytest.skip("no IMU packets in fixture")
    return src.sensor_info[0], pkts


def test_legacy_imu_accessor_parity(imu_packets):
    info, pkts = imu_packets
    pf = PacketFormat.from_info(info)
    assert pf.imu_packet_size == 48
    for p in pkts:
        raw = bytes(p.buf)
        sys_ts, accel_ts, gyro_ts = struct.unpack_from("<QQQ", raw, 0)
        la = struct.unpack_from("<fff", raw, 24)
        av = struct.unpack_from("<fff", raw, 36)
        assert pf.imu_sys_ts(p.buf) == sys_ts
        assert pf.imu_accel_ts(p.buf) == accel_ts
        assert pf.imu_gyro_ts(p.buf) == gyro_ts
        got_la = (pf.imu_la_x(p.buf), pf.imu_la_y(p.buf), pf.imu_la_z(p.buf))
        got_av = (pf.imu_av_x(p.buf), pf.imu_av_y(p.buf), pf.imu_av_z(p.buf))
        np.testing.assert_allclose(got_la, la, rtol=0)
        np.testing.assert_allclose(got_av, av, rtol=0)


def test_legacy_imu_values_physical(imu_packets):
    """A stationary sensor reads ~1 g on one accel axis and ~0 deg/s
    angular velocity — sanity check the field decode isn't byte-swapped."""
    _, pkts = imu_packets
    pf = PacketFormat.from_info(imu_packets[0])
    mags = []
    for p in pkts:
        la = np.array([pf.imu_la_x(p.buf), pf.imu_la_y(p.buf),
                       pf.imu_la_z(p.buf)])
        av = np.array([pf.imu_av_x(p.buf), pf.imu_av_y(p.buf),
                       pf.imu_av_z(p.buf)])
        mags.append(np.linalg.norm(la))
        assert np.all(np.abs(av) < 50), "implausible angular velocity"
    # |accel| should be near 1 g for a parked sensor
    assert 0.5 < np.median(mags) < 2.0


def test_legacy_imu_timestamps_monotonic(imu_packets):
    _, pkts = imu_packets
    pf = PacketFormat.from_info(imu_packets[0])
    ts = [pf.imu_sys_ts(p.buf) for p in pkts]
    assert all(b >= a for a, b in zip(ts, ts[1:]))
    # 100 Hz IMU: consecutive packets ~10 ms apart in nanoseconds
    deltas = np.diff(ts)
    assert np.all((deltas > 5e6) & (deltas < 20e6))
