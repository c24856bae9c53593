"""LUT-free Pallas projection vs the f64 LUT reference
(interpret mode on CPU)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ouster_sdk_tpu import ChanField
from ouster_sdk_tpu.io.frames import FrameReader
from ouster_sdk_tpu.ops.pallas_lutfree import FactorTables, \
    unpack_project_lutfree, unpack_project_lutfree_dd
from ouster_sdk_tpu.ops.unpack import decode_frame
from ouster_sdk_tpu.ops.xyzlut import make_xyz_lut

PCAP = "/root/reference/tests/pcaps/OS-2-128-U1_v2.3.0_1024x10.pcap"


def test_lutfree_matches_f64_lut():
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    fr = FrameReader(PCAP)
    fid, words, ts = next(iter(fr))
    tables = FactorTables(fr.info)
    xyz = np.asarray(unpack_project_lutfree(
        jnp.asarray(words), tables, fr.plan, tile_w=128, interpret=True))
    xyz = np.moveaxis(xyz, 0, -1)

    rng = np.asarray(decode_frame(jnp.asarray(words),
                                  fr.plan)[ChanField.RANGE])
    ref = make_xyz_lut(fr.info)(rng)
    err = np.abs(xyz - ref)
    # f32 budget: ~r * 3e-7 (in-kernel trig-free synthesis)
    r_m = rng.astype(np.float64)[..., None] * 1e-3
    bound = np.maximum(3e-7 * np.maximum(r_m, 1.0) * 2, 2e-6)
    assert (err <= bound).all(), \
        f"max {err.max()}, worst rel {(err / np.maximum(r_m, 1e-9)).max()}"


def test_lutfree_dd_within_one_ulp_of_f64():
    """The dd variant must land within 1 f32 ulp of the f64 projection —
    the same contract as the LUT dd path (ref: cartesian.h:36-69)."""
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    fr = FrameReader(PCAP)
    fid, words, ts = next(iter(fr))
    tables = FactorTables(fr.info)
    xyz = np.asarray(unpack_project_lutfree_dd(
        jnp.asarray(words), tables, fr.plan, tile_w=128, interpret=True))
    xyz = np.moveaxis(xyz, 0, -1)

    rng = np.asarray(decode_frame(jnp.asarray(words),
                                  fr.plan)[ChanField.RANGE])
    ref = make_xyz_lut(fr.info)(rng)                        # f64 host path
    ulp = np.spacing(np.abs(ref).astype(np.float32)).astype(np.float64)
    err = np.abs(xyz.astype(np.float64) - ref)
    assert (err <= ulp + 1e-12).all(), \
        f"max ulp excess {(err / np.maximum(ulp, 1e-12)).max()}"
    # and it must be strictly tighter than the f32 variant on this frame
    xyz_f32 = np.asarray(unpack_project_lutfree(
        jnp.asarray(words), tables, fr.plan, tile_w=128, interpret=True))
    xyz_f32 = np.moveaxis(xyz_f32, 0, -1)
    assert err.max() < np.abs(xyz_f32.astype(np.float64) - ref).max()


def test_lutfree_dd_dual_both_returns_exact():
    """dual=True: one pixel-region fetch projects both returns; each must
    meet the 1-ulp contract against the f64 path."""
    from __graft_entry__ import _make_info, _synth_frame
    from ouster_sdk_tpu.ops.unpack import decode_frame as _decode, \
        make_decode_plan
    from ouster_sdk_tpu.ops.pallas_lutfree import unpack_project_lutfree_dd

    info = _make_info(w=512, h=128, dual=True)
    plan = make_decode_plan(info)
    frame = _synth_frame(info)
    tables = FactorTables(info)
    xyz, xyz2 = unpack_project_lutfree_dd(
        jnp.asarray(frame), tables, plan, tile_w=128, interpret=True,
        dual=True)
    dec = _decode(jnp.asarray(frame), plan)
    lut = make_xyz_lut(info)
    for name, got in (("RANGE", xyz), ("RANGE2", xyz2)):
        rng = np.asarray(dec[name])
        ref = lut(rng)
        got_np = np.moveaxis(np.asarray(got), 0, -1)
        ulp = np.spacing(np.abs(ref).astype(np.float32)).astype(np.float64)
        err = np.abs(got_np.astype(np.float64) - ref)
        assert (err <= ulp + 1e-12).all(), \
            f"{name}: max ulp excess {(err / np.maximum(ulp, 1e-12)).max()}"


def _all_single_word_profiles():
    from ouster_sdk_tpu.core.types import UDPProfileLidar
    from ouster_sdk_tpu.ops.profiles import lookup_profile_entry

    from ouster_sdk_tpu.ops.profiles import DEFAULT_SCAN_FIELDS

    out = []
    for p in UDPProfileLidar:
        if p in (UDPProfileLidar.UNKNOWN, UDPProfileLidar.OFF):
            continue
        # needs a RANGE plane in the default scan-field set (FIVE_WORD
        # decodes raw words only) that fits one u32 word
        names = {n for n, _ in DEFAULT_SCAN_FIELDS.get(p, [])}
        if "RANGE" not in names:
            continue
        fi = lookup_profile_entry(p).fields.get("RANGE")
        if fi is not None and (fi.bit_start % 32) + fi.bit_size <= 32:
            out.append(p)
    return out


@pytest.mark.parametrize("profile", _all_single_word_profiles(),
                         ids=lambda p: p.value)
def test_lutfree_dd_every_profile(profile):
    """Geometry coverage: every profile whose RANGE fits one u32 word must
    project within 1 ulp of f64 through the fused pixel-region kernel
    (exercises pw in 1..5, h*pw lane dims, upshifts)."""
    import numpy as np
    from ouster_sdk_tpu import (HeaderType, LidarMode, LidarPacket,
                                PacketWriter, SensorInfo)
    from ouster_sdk_tpu.core.types import UDPProfileLidar
    from ouster_sdk_tpu.ops.pallas_lutfree import unpack_project_lutfree_dd
    from ouster_sdk_tpu.ops.unpack import frame_words_from_packets, \
        make_decode_plan

    info = SensorInfo.from_default(LidarMode.from_string("512x10"))
    info.format.pixels_per_column = 32
    info.format.pixel_shift_by_row = [0] * 32
    info.beam_azimuth_angles = info.beam_azimuth_angles[:32]
    info.beam_altitude_angles = info.beam_altitude_angles[:32]
    info.format.udp_profile_lidar = profile
    if profile == UDPProfileLidar.FUSA_RNG15_RFL8_NIR8_DUAL:
        info.format.header_type = HeaderType.FUSA

    pw_ = PacketWriter(info.format)
    rng = np.random.default_rng(3)
    cpp = pw_.columns_per_packet
    pkts = []
    for p in range(info.format.columns_per_frame // cpp):
        buf = pw_.new_packet()
        pw_.set_packet_header(buf, init_id=info.init_id, prod_sn=info.sn)
        pw_.set_frame_id(buf, 1)
        m0 = p * cpp
        pw_.set_col_headers(
            buf, np.arange(cpp, dtype=np.uint64) + 100 + m0,
            np.arange(cpp, dtype=np.uint16) + m0,
            np.ones(cpp, dtype=np.uint32)
            if profile != UDPProfileLidar.LEGACY
            else np.full(cpp, 0xFFFFFFFF, dtype=np.uint32))
        vals = rng.integers(
            0, 1 << lookup_range_bits(profile),
            size=(pw_.pixels_per_column, cpp))
        pw_.set_field(buf, "RANGE", vals)
        pkts.append(LidarPacket(buf.tobytes(), host_timestamp=p + 1))

    plan = make_decode_plan(info)
    words = jnp.asarray(frame_words_from_packets(pkts, plan))
    tables = FactorTables(info)
    xyz = np.asarray(unpack_project_lutfree_dd(
        words, tables, plan, tile_w=128, interpret=True))
    xyz = np.moveaxis(xyz, 0, -1)

    rng_img = np.asarray(decode_frame(words, plan)[ChanField.RANGE])
    ref = make_xyz_lut(info)(rng_img)
    ulp = np.spacing(np.abs(ref).astype(np.float32)).astype(np.float64)
    err = np.abs(xyz.astype(np.float64) - ref)
    assert (err <= ulp + 1e-12).all(), \
        f"max ulp excess {(err / np.maximum(ulp, 1e-12)).max()}"


def lookup_range_bits(profile):
    from ouster_sdk_tpu.ops.profiles import lookup_profile_entry

    return lookup_profile_entry(profile).fields["RANGE"].bit_size


def test_lutfree_rejects_df_sensors():
    from ouster_sdk_tpu import LidarMode, SensorInfo

    info = SensorInfo.from_default(LidarMode.from_string("512x10"))
    # simulate per-pixel angle tables (DF sensor)
    info.beam_azimuth_angles = [0.0] * (info.h * info.w)
    info.beam_altitude_angles = [0.0] * (info.h * info.w)
    with pytest.raises(ValueError):
        FactorTables(info)


def test_every_profile_projects_or_falls_back():
    """Dispatch contract (the lutfree family's word-spanning guard must
    never dead-end a profile): every built-in RANGE-bearing profile is
    lutfree-eligible; profiles without a RANGE plane (FIVE_WORD raw-word
    decode) are decode-only exactly like the reference; DF-style
    per-pixel angle tables and custom word-spanning profiles classify as
    ineligible and the planar LUT family still projects them."""
    from ouster_sdk_tpu import HeaderType, LidarMode, SensorInfo
    from ouster_sdk_tpu.core.types import UDPProfileLidar
    from ouster_sdk_tpu.ops.pallas_lutfree import lutfree_supported
    from ouster_sdk_tpu.ops.profiles import DEFAULT_SCAN_FIELDS

    for p in UDPProfileLidar:
        if p in (UDPProfileLidar.UNKNOWN, UDPProfileLidar.OFF):
            continue
        info = SensorInfo.from_default(LidarMode.from_string("512x10"))
        info.format.udp_profile_lidar = p
        if "FUSA" in p.name:
            info.format.header_type = HeaderType.FUSA
        names = {n for n, _ in DEFAULT_SCAN_FIELDS.get(p, [])}
        assert lutfree_supported(info) == ("RANGE" in names), p
    # the eligible set is exactly the set the 1-ulp parametrized test
    # above covers — no profile falls between the two
    eligible = set(_all_single_word_profiles())
    for p in UDPProfileLidar:
        if p in (UDPProfileLidar.UNKNOWN, UDPProfileLidar.OFF):
            continue
        names = {n for n, _ in DEFAULT_SCAN_FIELDS.get(p, [])}
        assert (p in eligible) == ("RANGE" in names), p


def test_df_tables_fall_back_to_planar_lut_family():
    """A sensor the lutfree family rejects (per-pixel DF angle tables)
    must still project through the planar LUT family — the dispatch
    fallback is real, not hypothetical."""
    from ouster_sdk_tpu import LidarMode, SensorInfo
    from ouster_sdk_tpu.core.types import UDPProfileLidar
    from ouster_sdk_tpu.ops.fused import ScanPipeline
    from ouster_sdk_tpu.ops.pallas_lutfree import lutfree_supported
    from ouster_sdk_tpu.ops.unpack import frame_words_from_packets, \
        make_decode_plan
    from ouster_sdk_tpu import LidarPacket, PacketWriter

    info = SensorInfo.from_default(LidarMode.from_string("512x10"))
    info.format.pixels_per_column = 16
    info.format.pixel_shift_by_row = [0] * 16
    info.format.udp_profile_lidar = UDPProfileLidar.RNG19_RFL8_SIG16_NIR16
    h, w = 16, info.format.columns_per_frame
    rng = np.random.default_rng(9)
    # per-PIXEL tables (w*h) — the DF layout lutfree cannot factorize
    info.beam_azimuth_angles = list(rng.uniform(-3, 3, h * w))
    info.beam_altitude_angles = list(rng.uniform(-20, 20, h * w))
    assert not lutfree_supported(info)

    pw_ = PacketWriter(info.format)
    cpp = pw_.columns_per_packet
    pkts = []
    for p in range(w // cpp):
        buf = pw_.new_packet()
        pw_.set_packet_header(buf, init_id=info.init_id, prod_sn=info.sn)
        pw_.set_frame_id(buf, 1)
        pw_.set_col_headers(
            buf, np.arange(cpp, dtype=np.uint64) + 100,
            np.arange(cpp, dtype=np.uint16) + p * cpp,
            np.ones(cpp, dtype=np.uint32))
        pw_.set_field(buf, "RANGE",
                      rng.integers(0, 1 << 16, size=(h, cpp)))
        pkts.append(LidarPacket(buf.tobytes(), host_timestamp=p + 1))
    plan = make_decode_plan(info)
    words = np.asarray(frame_words_from_packets(pkts, plan))

    # restage word-planar (what FrameReader's native grouper produces)
    cols = words[:, plan.hw:plan.hw + plan.cpp * plan.cw].reshape(
        plan.w, plan.cw)
    pix = cols[:, plan.chw:plan.chw + plan.h * plan.pw]
    planes = np.ascontiguousarray(
        pix.reshape(plan.w, plan.h, plan.pw).transpose(2, 1, 0))
    hdrs = np.ascontiguousarray(cols[:, :plan.chw].T)

    pipe = ScanPipeline(info)
    xyz = np.asarray(pipe.project_planar(
        jnp.asarray(planes), jnp.asarray(hdrs), engine="xla"))[0]
    xyz = np.moveaxis(xyz, 0, -1)
    rng_img = np.asarray(decode_frame(jnp.asarray(words),
                                      plan)[ChanField.RANGE])
    ref = make_xyz_lut(info)(rng_img)
    assert np.abs(xyz - ref).max() < 1e-5, \
        "planar LUT fallback diverged from the f64 DF projection"


def test_lutfree_rejects_nondivisible_tile_w():
    """A tile width that doesn't divide the frame width must raise
    up front instead of leaving output columns unwritten."""
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    fr = FrameReader(PCAP)
    _, words, _ = next(iter(fr))
    tables = FactorTables(fr.info)
    plan = fr.plan
    with pytest.raises(ValueError, match="must divide"):
        unpack_project_lutfree(jnp.asarray(words), tables, plan,
                               tile_w=600, interpret=True)
    with pytest.raises(ValueError, match="must divide"):
        unpack_project_lutfree_dd(jnp.asarray(words), tables, plan,
                                  tile_w=2048, interpret=True)


def test_lutfree_planar_matches_packet_layout():
    """LUT-free dd over word-planar staging is bit-identical to the
    packet-layout LUT-free dd kernel."""
    from ouster_sdk_tpu.ops.pallas_lutfree import (
        unpack_project_lutfree_dd, unpack_project_lutfree_planar)
    from ouster_sdk_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    fr = FrameReader(PCAP)
    fids, frames, _ = next(fr.iter_chunks(1))
    _, planes, hdrs, _ = next(fr.iter_planar_chunks(1))
    tables = FactorTables(fr.info)
    a = np.asarray(unpack_project_lutfree_dd(
        jnp.asarray(frames), tables, fr.plan, interpret=True))
    b = np.asarray(unpack_project_lutfree_planar(
        jnp.asarray(planes.copy()), jnp.asarray(hdrs.copy()), tables,
        fr.plan, interpret=True))
    np.testing.assert_array_equal(a, b)
