"""Hardware-in-the-loop suite: requires --sensor <hostname>
(ref: tests/hil/conftest.py:22-26 in the reference)."""

import pytest


def pytest_addoption(parser):
    parser.addoption("--sensor", action="store", default=None,
                     help="hostname/IP of a live sensor for HIL tests")


@pytest.fixture(scope="session")
def sensor_hostname(request):
    host = request.config.getoption("--sensor")
    if not host:
        pytest.skip("HIL tests require --sensor <hostname>")
    return host
