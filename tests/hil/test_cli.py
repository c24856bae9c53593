"""CLI against a live sensor (ref: tests/hil/test_cli.py). Requires
--sensor <hostname>; the CLI surface itself is covered in-image by
tests/test_model_commands.py and the emulator-backed CLI tests.
"""

import os

import pytest

from click.testing import CliRunner


@pytest.fixture
def runner():
    return CliRunner()


def test_network(sensor_hostname, runner):
    """`sensor <host> network` prints the network info JSON
    (ref: test_cli.py test_network)."""
    from ouster_sdk_tpu.cli import cli

    result = runner.invoke(cli, ["sensor", "network", sensor_hostname])
    assert result.exit_code == 0, result.output
    assert "ipv4" in result.output


def test_diagnostics(sensor_hostname, runner, tmp_path):
    """`sensor <host> diagnostics` downloads the dump
    (ref: test_cli.py test_diagnostics)."""
    from ouster_sdk_tpu.cli import cli

    dump_path = os.path.join(str(tmp_path), "test.bin")
    result = runner.invoke(cli, ["sensor", "diagnostics",
                                 sensor_hostname, "-o", dump_path])
    assert result.exit_code == 0, result.output
    assert os.path.isfile(dump_path)


@pytest.mark.parametrize("udp_dest", [None, "1.1.1.1"])
def test_udp_dest_finder_leaves_no_mark(sensor_hostname, udp_dest):
    """auto_detected_udp_dest must not change active or staged config
    (ref: test_cli.py test_udp_dest_finder_leaves_no_mark)."""
    from ouster_sdk_tpu.core.types import SensorConfig
    from ouster_sdk_tpu.sensor.http import (SensorHttp, get_config,
                                            set_config)

    cfg = SensorConfig()
    cfg.udp_dest = udp_dest
    set_config(sensor_hostname, cfg)

    check_active = get_config(sensor_hostname, active=True)
    check_staged = get_config(sensor_hostname, active=False)

    SensorHttp.create(sensor_hostname).auto_detected_udp_dest()

    assert get_config(sensor_hostname, active=True) == check_active
    assert get_config(sensor_hostname, active=False) == check_staged
