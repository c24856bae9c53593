"""Azimuth-window config matrix against a real sensor (ref:
tests/hil/test_azimuth.py, reduced matrix): the sensor's reported
column_window must match the number of valid columns in received
scans. Requires --sensor; the window zero-fill/complete() semantics
themselves are covered in-image by tests/test_column_window.py.
"""

import numpy as np
import pytest


WINDOWS = [
    pytest.param((0, 360000), id="full"),
    pytest.param((0, 90000), id="quarter_from_zero"),
    pytest.param((180000, 270000), id="quarter_mid"),
    pytest.param((270000, 45000), id="wraparound"),
]


@pytest.fixture
def initial_config(sensor_hostname):
    """Save and restore the sensor's config around the matrix."""
    from ouster_sdk_tpu.sensor.http import get_config, set_config

    cfg0 = get_config(sensor_hostname)
    yield cfg0
    set_config(sensor_hostname, cfg0, force_reinit=True)


@pytest.mark.parametrize("window", WINDOWS)
def test_azimuth_window(sensor_hostname, initial_config, window):
    from copy import copy

    from ouster_sdk_tpu.sensor.http import set_config
    from ouster_sdk_tpu.sensor.scan_source import SensorScanSource

    cfg = copy(initial_config)
    cfg.azimuth_window = window
    set_config(sensor_hostname, cfg, force_reinit=True)

    with SensorScanSource([sensor_hostname], timeout=10.0) as scans:
        info = scans.sensor_info[0]
        w = info.format.columns_per_frame
        col_window = info.format.column_window
        window_len = (col_window[1] - col_window[0] + w) % w + 1

        got = []
        while len(got) < 10:
            idx, scan = scans.get_scan(timeout_sec=10.0)
            if scan is None:
                break
            got.append(scan)

    assert got, "no scans received under azimuth window"
    valid_counts = [int(np.count_nonzero(s.status & 0x1)) for s in got]
    assert any(c == window_len for c in valid_counts), \
        (window, col_window, window_len, valid_counts)
    assert any(s.complete(col_window) for s in got), \
        "no complete frames under azimuth window"
