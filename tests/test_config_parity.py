"""SensorConfig parity (ref: python/tests/test_config.py): every field
optional, enum string roundtrips, config JSON roundtrip."""

import dataclasses

import pytest

from ouster_sdk_tpu.core.types import (
    BloomReductionOptimization,
    FullScaleRange,
    MultipurposeIOMode,
    NMEABaudRate,
    OperatingMode,
    Polarity,
    ReturnOrder,
    SensorConfig,
    TimestampMode,
    UDPProfileLidar,
)


def test_all_fields_optional():
    cfg = SensorConfig()
    for f in dataclasses.fields(SensorConfig):
        v = getattr(cfg, f.name)
        if f.name == "extra_options":
            assert len(v) == 0
        else:
            assert v is None, f.name


@pytest.mark.parametrize("enum,n", [
    (OperatingMode, 3), (Polarity, 2), (NMEABaudRate, 2),
    (FullScaleRange, 2), (TimestampMode, 4)])
def test_enum_member_counts(enum, n):
    """Pin member counts like the reference ('don't forget to update
    tests!')."""
    assert len(enum.__members__) == n, \
        f"{enum.__name__} changed; update tests"


def test_enum_value_roundtrip():
    assert OperatingMode("NORMAL") is OperatingMode.NORMAL
    assert Polarity("ACTIVE_HIGH") is Polarity.ACTIVE_HIGH
    assert NMEABaudRate("BAUD_9600") is NMEABaudRate.BAUD_9600
    assert ReturnOrder("STRONGEST_TO_WEAKEST") is \
        ReturnOrder.STRONGEST_TO_WEAKEST
    assert MultipurposeIOMode("OFF") is MultipurposeIOMode.OFF
    assert BloomReductionOptimization("BALANCED") is \
        BloomReductionOptimization.BALANCED


def test_config_json_roundtrip():
    cfg = SensorConfig()
    cfg.lidar_frame_azimuth_offset = 0.5
    cfg.azimuth_window = (0, 360000)
    cfg.operating_mode = OperatingMode.NORMAL
    cfg.udp_port_lidar = 7502
    cfg.signal_multiplier = 2
    cfg.udp_profile_lidar = UDPProfileLidar.RNG19_RFL8_SIG16_NIR16_DUAL
    cfg.extra_options["custom_key"] = 42
    # roundtrip through the metadata parser (config_params section)
    import json

    from ouster_sdk_tpu.core.metadata import (default_sensor_info,
                                              sensor_info_from_metadata)
    from ouster_sdk_tpu.core.types import LidarMode

    info = default_sensor_info(LidarMode(1024, 10))
    meta = json.loads(info.to_json_string())
    meta["config_params"] = cfg.to_json_dict()
    back = sensor_info_from_metadata(json.dumps(meta)).config
    assert back.udp_port_lidar == 7502
    assert back.operating_mode is OperatingMode.NORMAL
    assert back.udp_profile_lidar is \
        UDPProfileLidar.RNG19_RFL8_SIG16_NIR16_DUAL
    assert tuple(back.azimuth_window) == (0, 360000)
    assert back.extra_options.get("custom_key") == 42
    # unset fields stay unset through the roundtrip
    assert back.timestamp_mode is None and back.udp_dest is None
