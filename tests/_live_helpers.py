"""Shared live-path test helpers (used by test_sensor.py,
test_streaming.py, test_hil_emulated.py, test_frames.py,
test_device_scan_source.py). A plain module (not conftest) so imports
are unambiguous next to tests/hil/conftest.py."""

# -- shared live-path helpers (used by test_sensor.py, test_streaming.py,
# test_hil_emulated.py) --------------------------------------------------

def free_udp_ports(n):
    """Allocate n distinct free loopback UDP ports."""
    import socket

    socks = [socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
             for _ in range(n)]
    for s in socks:
        s.bind(("127.0.0.1", 0))
    ports = [s.getsockname()[1] for s in socks]
    for s in socks:
        s.close()
    return ports


def live_test_info(lidar_port, imu_port, sn=122246000000,
                   mode="512x10"):
    """SensorInfo for loopback live tests (RNG19 single profile)."""
    from ouster_sdk_tpu import LidarMode, SensorInfo
    from ouster_sdk_tpu.core.types import UDPProfileLidar

    info = SensorInfo.from_default(LidarMode.from_string(mode))
    info.format.udp_profile_lidar = \
        UDPProfileLidar.RNG19_RFL8_SIG16_NIR16
    info.config.udp_port_lidar = lidar_port
    info.config.udp_port_imu = imu_port
    info.sn = sn
    return info


def synth_frame_packets(info, frame_id):
    """One full frame of synthesized lidar packet byte strings with
    random RANGE (seeded by frame_id)."""
    import numpy as np

    from ouster_sdk_tpu import ChanField, PacketWriter

    pw = PacketWriter(info.format)
    w = info.format.columns_per_frame
    cpp = info.format.columns_per_packet
    rng = np.random.default_rng(frame_id)
    out = []
    for p in range(w // cpp):
        buf = pw.new_packet()
        pw.set_packet_header(buf, init_id=info.init_id, prod_sn=info.sn)
        pw.set_frame_id(buf, frame_id)
        m0 = p * cpp
        pw.set_col_headers(
            buf, np.arange(cpp, dtype=np.uint64) + 1000 + m0,
            np.arange(cpp, dtype=np.uint16) + m0,
            np.ones(cpp, dtype=np.uint32))
        pw.set_field(buf, ChanField.RANGE,
                     rng.integers(0, 1 << 19,
                                  size=(pw.pixels_per_column, cpp)))
        out.append(buf.tobytes())
    return out


def delay_stats(arrivals_ns, schedule_ns, warmup=2):
    """Per-packet latency vs a paced schedule, baseline-subtracted: the
    emulated analog of the reference HIL delay metric (host arrival
    minus sensor timestamp, tests/hil/test_lidar_delay.py:121-125 —
    there PTP makes the clocks common; here the emulator's stream start
    is the unknown offset, estimated as the minimum observed
    arrival-minus-schedule). Returns (avg_ms, p95_ms) over the samples
    past `warmup`."""
    import numpy as np

    arr = np.asarray(arrivals_ns, np.int64)
    sch = np.asarray(schedule_ns, np.int64)
    assert arr.size == sch.size and arr.size > warmup
    rel = arr - sch
    rel = rel - rel.min()          # fastest packet defines time zero
    rel = rel[warmup:] * 1e-6      # -> ms
    return float(rel.mean()), float(np.percentile(rel, 95))


def legacy_imu_packet(ts_ns):
    """48-byte LEGACY imu packet (3 x u64 ts + 6 x f32) with all three
    timestamps set to ts_ns (ref: parsing.cpp:564-577)."""
    import struct

    return struct.pack("<QQQ", ts_ns, ts_ns, ts_ns) + \
        struct.pack("<6f", 0.0, 0.0, 9.81, 0.0, 0.0, 0.0)
