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

