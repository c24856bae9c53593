"""Test configuration: force a deterministic 8-device CPU mesh for JAX.

Sharding/pjit paths are validated on a virtual CPU mesh; real-TPU runs happen
in the benchmark harness (bench.py).
"""

import os
import sys

# Tests always run on CPU with a virtual 8-device mesh (real-TPU runs happen
# via bench.py, which does not load this conftest). NOTE: this sandbox's
# sitecustomize force-registers the TPU backend and overrides JAX_PLATFORMS
# from the environment, so the env var alone is NOT enough — the jax.config
# update below is what actually selects CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"
PCAP_DIR = os.path.join(REFERENCE_ROOT, "tests", "pcaps")
METADATA_DIR = os.path.join(REFERENCE_ROOT, "tests", "metadata")
OSF_DIR = os.path.join(REFERENCE_ROOT, "tests", "osfs")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "conformance: bit-exactness tests against reference fixtures")
    config.addinivalue_line("markers", "slow: long-running tests")
    config.addinivalue_line(
        "markers",
        "tpu: on-hardware kernel validation (subprocess; auto-skips "
        "when no TPU is reachable)")


@pytest.fixture(scope="session")
def pcap_dir():
    if not os.path.isdir(PCAP_DIR):
        pytest.skip("reference pcap fixtures unavailable")
    return PCAP_DIR


@pytest.fixture(scope="session")
def metadata_dir():
    if not os.path.isdir(METADATA_DIR):
        pytest.skip("reference metadata fixtures unavailable")
    return METADATA_DIR


@pytest.fixture(scope="session")
def osf_dir():
    if not os.path.isdir(OSF_DIR):
        pytest.skip("reference OSF fixtures unavailable")
    return OSF_DIR


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
