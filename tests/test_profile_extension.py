"""Custom UDP profile registration (ref: tests/profile_extension_test.cpp,
ouster_client/src/profile_extension.cpp:136)."""

import numpy as np
import pytest

from ouster_sdk_tpu import DataFormat, HeaderType, UDPProfileIMU
from ouster_sdk_tpu.ops.packet_format import PacketFormat, PacketWriter
from ouster_sdk_tpu.ops.profiles import (
    FieldInfo,
    add_custom_profile,
    lookup_profile_entry,
    lookup_scan_fields,
)


def test_custom_profile_roundtrip():
    name = "CUSTOM_TEST_PROFILE_8B"
    add_custom_profile(
        100, name,
        [("RANGE", FieldInfo(0, 19)),
         ("REFLECTIVITY", FieldInfo(24, 8)),
         ("CUSTOM0", FieldInfo(32, 16)),
         ("RAW32_WORD1", FieldInfo(0, 32)),
         ("RAW32_WORD2", FieldInfo(32, 32))],
        chan_data_size=8)

    entry = lookup_profile_entry(name)
    assert entry.chan_data_size == 8
    assert entry.fields["RANGE"].bit_size == 19

    slots = lookup_scan_fields(name)
    names = [n for n, _ in slots]
    assert "RANGE" in names and "CUSTOM0" in names
    assert "RAW32_WORD1" not in names  # raw words excluded from scans

    fmt = DataFormat(
        pixels_per_column=32, columns_per_packet=16, columns_per_frame=512,
        pixel_shift_by_row=[0] * 32, column_window=(0, 511),
        udp_profile_lidar=name, udp_profile_imu=UDPProfileIMU.LEGACY,
        header_type=HeaderType.STANDARD, fps=10)
    pw = PacketWriter(fmt)
    assert pw.lidar_packet_size == 32 + 16 * (12 + 32 * 8) + 32

    buf = pw.new_packet()
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 1 << 19, size=(32, 16))
    refl = rng.integers(0, 255, size=(32, 16))
    pw.set_field(buf, "RANGE", vals)
    pw.set_field(buf, "REFLECTIVITY", refl)
    np.testing.assert_array_equal(pw.packet_field("RANGE", buf), vals)
    np.testing.assert_array_equal(pw.packet_field("REFLECTIVITY", buf), refl)


def test_unknown_profile_raises():
    with pytest.raises(ValueError):
        lookup_profile_entry("NOT_A_PROFILE")
