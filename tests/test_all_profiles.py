"""Write->parse roundtrips for EVERY UDP profile, including those without
pcap fixtures (RGB, FIVE_WORD, zone variants)
(ref: tests/packet_writer_test.cpp, fusa_profile_test.cpp,
python/tests/test_extended_profiles.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ouster_sdk_tpu import (
    DataFormat,
    HeaderType,
    LidarPacket,
    LidarScan,
    PacketWriter,
    ScanBatcher,
    SensorInfo,
    LidarMode,
)
from ouster_sdk_tpu.core.types import UDPProfileIMU, UDPProfileLidar
from ouster_sdk_tpu.ops.profiles import lookup_profile_entry
from ouster_sdk_tpu.ops.unpack import decode_frame, \
    frame_words_from_packets, make_decode_plan

ALL_PROFILES = [p for p in UDPProfileLidar
                if p not in (UDPProfileLidar.UNKNOWN, UDPProfileLidar.OFF)]


def _info(profile):
    info = SensorInfo.from_default(LidarMode.from_string("512x10"))
    info.format.pixels_per_column = 32
    info.format.pixel_shift_by_row = [0] * 32
    info.beam_azimuth_angles = info.beam_azimuth_angles[:32]
    info.beam_altitude_angles = info.beam_altitude_angles[:32]
    info.format.udp_profile_lidar = profile
    if profile == UDPProfileLidar.FUSA_RNG15_RFL8_NIR8_DUAL:
        info.format.header_type = HeaderType.FUSA
    if profile in (UDPProfileLidar.RNG15_RFL8_NIR8_ZONE16,
                   UDPProfileLidar.RNG19_RFL8_SIG16_NIR16_ZONE16):
        info.format.zone_monitoring_enabled = True
    return info


@pytest.mark.parametrize("profile", ALL_PROFILES,
                         ids=[p.value for p in ALL_PROFILES])
def test_writer_parser_roundtrip(profile):
    info = _info(profile)
    pw = PacketWriter(info.format)
    entry = lookup_profile_entry(profile)
    rng = np.random.default_rng(1)

    buf = pw.new_packet()
    pw.set_packet_header(buf, init_id=info.init_id, prod_sn=info.sn)
    pw.set_frame_id(buf, 42)
    cpp = pw.columns_per_packet
    pw.set_col_headers(buf, np.arange(cpp, dtype=np.uint64) + 10,
                       np.arange(cpp, dtype=np.uint16),
                       np.ones(cpp, dtype=np.uint32)
                       if profile != UDPProfileLidar.LEGACY
                       else np.full(cpp, 0xFFFFFFFF, dtype=np.uint32))

    written = {}
    for name, fi in entry.fields.items():
        # skip raw words and the aggregate RGB (it aliases R/G/B bits)
        if name.startswith("RAW32") or fi.num_elements > 1:
            continue
        # values masked to field width, respecting upshift truncation
        vals = rng.integers(0, 1 << fi.bit_size,
                            size=(pw.pixels_per_column, cpp))
        vals = (vals << fi.upshift).astype(np.uint64) \
            if fi.upshift else vals
        written[name] = vals
        pw.set_field(buf, name, vals)

    assert pw.frame_id(buf) == 42
    for name, vals in written.items():
        back = pw.packet_field(name, buf)
        np.testing.assert_array_equal(back, vals, err_msg=name)

    # aggregate multi-element fields (RGB) alias the scalar channels:
    # writing via the aggregate must read back element-wise through R/G/B
    for name, fi in entry.fields.items():
        if fi.num_elements <= 1:
            continue
        per = fi.bit_size // fi.num_elements
        vals = rng.integers(0, 1 << per,
                            size=(pw.pixels_per_column, cpp,
                                  fi.num_elements))
        pw.set_field(buf, name, vals)
        for e, chan in enumerate("RGB"[: fi.num_elements]):
            if chan in dict.fromkeys(pw.fields):
                np.testing.assert_array_equal(
                    pw.packet_field(chan, buf), vals[..., e],
                    err_msg=f"{name}[{e}] via {chan}")


@pytest.mark.parametrize("profile", ALL_PROFILES,
                         ids=[p.value for p in ALL_PROFILES])
def test_batcher_and_device_decode_agree(profile):
    """Full synthetic frame: host batcher and device decode_frame must be
    bit-identical for every profile."""
    info = _info(profile)
    pw = PacketWriter(info.format)
    entry = lookup_profile_entry(profile)
    rng = np.random.default_rng(7)
    cpp = pw.columns_per_packet
    n_pkts = info.format.columns_per_frame // cpp

    packets = []
    for p in range(n_pkts):
        buf = pw.new_packet()
        pw.set_packet_header(buf, init_id=info.init_id, prod_sn=info.sn)
        pw.set_frame_id(buf, 5)
        m0 = p * cpp
        pw.set_col_headers(buf,
                           np.arange(cpp, dtype=np.uint64) + 100 + m0,
                           np.arange(cpp, dtype=np.uint16) + m0,
                           np.ones(cpp, dtype=np.uint32)
                           if profile != UDPProfileLidar.LEGACY
                           else np.full(cpp, 0xFFFFFFFF, dtype=np.uint32))
        for name, fi in entry.fields.items():
            if name.startswith("RAW32") or fi.num_elements > 1:
                continue
            vals = rng.integers(0, 1 << fi.bit_size,
                                size=(pw.pixels_per_column, cpp))
            if fi.upshift:
                vals = vals << fi.upshift
            pw.set_field(buf, name, vals)
        packets.append(LidarPacket(buf.tobytes(), host_timestamp=p + 1))

    if info.format.zone_monitoring_enabled:
        # zone-enabled scans also require one zone packet to complete
        from ouster_sdk_tpu import ZonePacket
        from ouster_sdk_tpu.ops.packet_format import write_bits

        zbuf = np.zeros(pw.zone_packet_size, dtype=np.uint8)
        zwords = zbuf.view("<u4")
        write_bits(zwords, pw.geom.frame_id, 5)
        packets.append(ZonePacket(zbuf.tobytes(), host_timestamp=999))

    b = ScanBatcher(info)
    scan = LidarScan(info)
    done = False
    for p in packets:
        done = b(p, scan) or done
    assert done and scan.complete()

    plan = make_decode_plan(info)
    lidar_pkts = [p for p in packets if p.type().value == "Lidar"]
    words = frame_words_from_packets(lidar_pkts, plan)
    out = decode_frame(jnp.asarray(words), plan)
    for name in out:
        if not scan.has_field(name) or "#" in name:
            continue
        np.testing.assert_array_equal(np.asarray(out[name]),
                                      scan.field(name), err_msg=name)
