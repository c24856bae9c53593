"""Metadata parsing across the reference's full fw 1.12 -> 3.x corpus
(ref: tests/metadata/ + bcompat_meta_json_test.cpp)."""

import glob
import json
import os

import numpy as np
import pytest

from ouster_sdk_tpu.core.metadata import (
    parse_and_validate_metadata,
    sensor_info_from_metadata,
)
from ouster_sdk_tpu.core.types import LidarMode, UDPProfileLidar

META_DIR = "/root/reference/tests/metadata"


def _meta_files():
    if not os.path.isdir(META_DIR):
        return []
    return sorted(glob.glob(os.path.join(META_DIR, "*.json")))


@pytest.mark.parametrize("path", _meta_files(),
                         ids=[os.path.basename(p) for p in _meta_files()])
def test_parse_metadata_corpus(path):
    """Every good fixture parses without critical issues and produces a
    plausible SensorInfo."""
    with open(path) as f:
        data = f.read()
    info, issues = parse_and_validate_metadata(data)
    assert info is not None, \
        f"critical issues: {[e.to_string() for e in issues.critical]}"
    assert info.format.pixels_per_column in (16, 32, 64, 128)
    assert info.format.columns_per_frame in (512, 1024, 2048, 4096)
    assert len(info.beam_altitude_angles) >= info.format.pixels_per_column
    assert len(info.format.pixel_shift_by_row) == \
        info.format.pixels_per_column
    assert info.lidar_to_sensor_transform.shape == (4, 4)
    assert info.beam_to_lidar_transform.shape == (4, 4)
    # beam origin offset must be encoded in beam_to_lidar
    assert info.beam_to_lidar_transform[0, 3] != 0


def _malformed_files():
    d = os.path.join(META_DIR, "malformed")
    if not os.path.isdir(d):
        return []
    return sorted(glob.glob(os.path.join(d, "*.json")))


@pytest.mark.parametrize("path", _malformed_files(),
                         ids=[os.path.basename(p) for p in _malformed_files()])
def test_malformed_metadata(path):
    """Malformed fixtures must be rejected (critical issues) or at minimum
    produce warnings — never crash."""
    with open(path) as f:
        data = f.read()
    info, issues = parse_and_validate_metadata(data)
    # must not raise; most malformed files should yield critical issues
    assert issues is not None


def test_roundtrip():
    """to_json_string -> parse produces an equivalent SensorInfo."""
    files = _meta_files()
    if not files:
        pytest.skip("no fixtures")
    src = [f for f in files if "3_0_1" in f and "legacy" not in f][0]
    with open(src) as f:
        info = sensor_info_from_metadata(f.read())
    info2 = sensor_info_from_metadata(info.to_json_string())
    assert info2.sn == info.sn
    assert info2.format == info.format
    assert info2.beam_azimuth_angles == info.beam_azimuth_angles
    assert np.allclose(info2.lidar_to_sensor_transform,
                       info.lidar_to_sensor_transform)


def test_default_sensor_info():
    from ouster_sdk_tpu.core.types import SensorInfo

    info = SensorInfo.from_default(LidarMode.from_string("1024x10"))
    assert info.format.columns_per_frame == 1024
    assert info.format.pixels_per_column == 64
    assert info.prod_line == "OS-1-64"
    assert len(info.beam_altitude_angles) == 64
