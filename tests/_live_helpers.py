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
