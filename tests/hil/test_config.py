"""Hardware-in-the-loop config matrix: requires --sensor <hostname>
(ref: tests/hil/test_config.py:26-230 in the reference). The same
matrix runs emulator-paced in-image in tests/test_hil_emulated.py; this
file drives a real sensor's fw through the identical client paths.
"""

import time
from copy import copy

import pytest

from ouster_sdk_tpu.core.types import (
    LidarMode,
    OperatingMode,
    SensorConfig,
    TimestampMode,
)
from ouster_sdk_tpu.sensor.http import (
    SensorHttp,
    get_config,
    set_config,
)
from ouster_sdk_tpu.sensor.scan_source import (
    ClientTimeout,
    SensorPacketSource,
    SensorScanSource,
)

# reinit should be almost instantaneous; reboot takes much longer
# (ref: test_config.py:20-22)
REINIT_TIME = 1
REBOOT_TIME = 60


@pytest.fixture(scope="module")
def initial_config(sensor_hostname):
    """Snapshot the sensor's config and restore it after the module
    (ref: conftest hil_initial_config)."""
    cfg = get_config(sensor_hostname)
    yield cfg
    restore = copy(cfg)
    restore.operating_mode = OperatingMode.NORMAL
    set_config(sensor_hostname, restore, persist=True)


def test_config_basic(sensor_hostname, initial_config):
    """Basic values round-trip (ref: test_config.py test_config_basic)."""
    cfg0 = get_config(sensor_hostname)
    cfg0.timestamp_mode = TimestampMode.TIME_FROM_PTP_1588
    cfg0.nmea_leap_seconds = 20
    set_config(sensor_hostname, cfg0)
    cfg1 = get_config(sensor_hostname)
    assert cfg1 == cfg0


def test_config_operating_mode(sensor_hostname, initial_config):
    """operating_mode sets despite its duplicated legacy field
    (ref: test_config.py test_config_operating_mode)."""
    set_config(sensor_hostname, initial_config)
    cfg0 = SensorConfig()
    cfg0.operating_mode = OperatingMode.STANDBY
    set_config(sensor_hostname, cfg0)
    assert get_config(sensor_hostname).operating_mode == \
        OperatingMode.STANDBY
    # restore
    cfg0.operating_mode = OperatingMode.NORMAL
    set_config(sensor_hostname, cfg0)


def test_config_udp_auto(sensor_hostname, initial_config):
    """udp_dest="" stops data; set_udp_dest_auto restores delivery to
    this host (ref: test_config.py test_config_udp_auto)."""
    no_udp = copy(initial_config)
    no_udp.udp_dest = ""
    set_config(sensor_hostname, no_udp)
    no_udp = get_config(sensor_hostname)
    time.sleep(REINIT_TIME)

    with pytest.raises(ClientTimeout):
        src = SensorPacketSource([sensor_hostname],
                                 no_auto_udp_dest=True, timeout=2.0)
        try:
            for _ in range(10):
                next(iter(src))
        finally:
            src.close()

    set_config(sensor_hostname, SensorConfig(), udp_dest_auto=True)
    time.sleep(REINIT_TIME)
    src = SensorScanSource([sensor_hostname], no_auto_udp_dest=True,
                           timeout=20.0)
    try:
        got = 0
        for _idx, scan in src._iter_scans():
            got += 1
            if got >= 10:
                break
        assert got >= 10
    finally:
        src.close()

    cfg1 = get_config(sensor_hostname)
    assert no_udp.udp_dest != cfg1.udp_dest
    cfg1.udp_dest = ""
    no_udp.extra_options = {}
    cfg1.extra_options = {}
    assert no_udp == cfg1


def test_config_persist(sensor_hostname, initial_config):
    """persist=True survives a reboot, the plain set does not
    (ref: test_config.py test_config_persist)."""
    def reboot():
        SensorHttp.create(sensor_hostname).restart()
        time.sleep(REBOOT_TIME)

    set_config(sensor_hostname, initial_config, persist=True)

    cfg0 = SensorConfig()
    cfg0.azimuth_window = (583, 39402)
    set_config(sensor_hostname, cfg0)

    reboot()
    assert get_config(sensor_hostname).azimuth_window == \
        initial_config.azimuth_window

    set_config(sensor_hostname, cfg0, persist=True)
    reboot()
    assert get_config(sensor_hostname).azimuth_window == (583, 39402)


@pytest.mark.parametrize("signal_multiplier", [0.25, 0.5, 1, 2, 3])
def test_good_signal_multiplier_values(sensor_hostname, initial_config,
                                       signal_multiplier):
    """All valid signal multipliers get/set on fw 3.0+ (ref:
    test_config.py test_good_signal_multiplier_values; gen1/VLP reject
    cases are hardware-dependent and surface as RuntimeError)."""
    cfg0 = SensorConfig()
    cfg0.azimuth_window = (0, 10000)   # small enough for everything
    cfg0.lidar_mode = LidarMode.from_string("1024x10")
    cfg0.signal_multiplier = signal_multiplier
    try:
        set_config(sensor_hostname, cfg0)
    except RuntimeError:
        prod = SensorHttp.create(sensor_hostname).sensor_info().get(
            "prod_line", "")
        if "OS-DOME" in prod or signal_multiplier != 1:
            pytest.skip(f"sensor {prod} rejects multiplier "
                        f"{signal_multiplier} (gen1/VLP-class limits)")
        raise
    cfg1 = get_config(sensor_hostname)
    assert cfg1.signal_multiplier == cfg0.signal_multiplier


@pytest.mark.parametrize("signal_multiplier", [0.3, 1.2, 5, 5.5])
def test_bad_signal_multiplier_values(sensor_hostname, initial_config,
                                      signal_multiplier):
    """Out-of-domain multipliers raise (ref: test_config.py
    test_bad_signal_multiplier_values)."""
    cfg0 = SensorConfig()
    cfg0.azimuth_window = (0, 10000)
    cfg0.lidar_mode = LidarMode.from_string("1024x10")
    cfg0.signal_multiplier = signal_multiplier
    with pytest.raises(RuntimeError):
        set_config(sensor_hostname, cfg0)
