"""Pallas fused unpack+project kernel vs the XLA reference path
(interpret mode on CPU; compiled path exercised on TPU by bench)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ouster_sdk_tpu import ChanField, LidarScan, ScanBatcher
from ouster_sdk_tpu.io.pcap_source import PcapPacketSource
from ouster_sdk_tpu.ops.pallas_kernels import unpack_project
from ouster_sdk_tpu.ops.unpack import frame_words_from_packets, \
    make_decode_plan
from ouster_sdk_tpu.ops.xyzlut import make_xyz_lut, to_device_lut

PCAP = "/root/reference/tests/pcaps/OS-2-128-U1_v2.3.0_1024x10.pcap"


def test_pallas_unpack_project_matches_reference():
    import os

    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    from ouster_sdk_tpu import PacketFormat

    src = PcapPacketSource(PCAP)
    info = src.sensor_info[0]
    pf = PacketFormat.from_info(info)
    batcher = ScanBatcher(info)
    scan = LidarScan(info)
    packets = []
    for idx, p in src:
        if p.type().value != "Lidar":
            continue
        packets.append(p)
        if batcher(p, scan):
            break
    packets = [p for p in packets if pf.frame_id(p.buf) == scan.frame_id]

    plan = make_decode_plan(info)
    words = jnp.asarray(frame_words_from_packets(packets, plan))
    lut = make_xyz_lut(info)
    dev_lut = to_device_lut(lut)

    xyz = np.asarray(unpack_project(words, dev_lut, plan, tile_w=128,
                                    interpret=True))

    ref = lut(scan.field(ChanField.RANGE))  # f64 reference
    ulp = np.spacing(np.abs(ref).astype(np.float32)).astype(np.float64)
    err = np.abs(xyz - ref)
    assert (err <= np.maximum(ulp, 1e-7)).all(), \
        f"max err {err.max()}, worst ulp ratio " \
        f"{(err / np.maximum(ulp, 1e-30)).max()}"


def test_planar_fused_dewarp_matches_host():
    """unpack -> xyz -> per-column SE(3) dewarp fused in one Pallas kernel
    (the SURVEY §3.3 north-star chain) matches the f64 host path within
    f32 representability."""
    from ouster_sdk_tpu.io.frames import FrameReader
    from ouster_sdk_tpu.ops.pallas_kernels import (
        PlanarLut, unpack_project_planar_batched)
    from ouster_sdk_tpu.utils import native
    from ouster_sdk_tpu.utils.pose_util import exp_pose6

    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    import os
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    fr = FrameReader(PCAP)
    info, plan = fr.info, fr.plan
    fids, planes, hdrs, _ = next(fr.iter_planar_chunks(1))
    lut64 = make_xyz_lut(info)
    lut = PlanarLut(lut64)
    rng = np.random.default_rng(0)
    poses = np.stack([
        exp_pose6(np.concatenate([rng.normal(0, 1, 3),
                                  rng.normal(0, 0.1, 3)]))
        for _ in range(plan.w)]).astype(np.float32)
    out = unpack_project_planar_batched(
        jnp.asarray(planes.copy()), jnp.asarray(hdrs.copy()),
        lut.stack, plan,
        interpret=True, poses=jnp.asarray(poses[None]))
    xyz_k = np.moveaxis(np.asarray(out[0]), 0, -1)

    fp = [f for f in plan.fields if f.name == "RANGE"][0]
    r = ((planes[0][0] >> fp.bit) & ((1 << fp.size) - 1)).astype(np.uint32)
    world = np.einsum("wij,hwj->hwi", poses[:, :3, :3].astype(np.float64),
                      lut64(r)) + poses[None, :, :3, 3]
    world[r == 0] = 0
    err = np.abs(xyz_k - world)
    # dot-product rounding scales with the point NORM, not the component
    norm = np.linalg.norm(world, axis=-1)[..., None]
    ulp = np.spacing(norm.astype(np.float32)).astype(np.float64)
    assert (err <= np.maximum(4 * ulp, 1e-6)).all(), err.max()
    # no-return pixels stay at the origin, not at the pose translation
    assert (xyz_k[r == 0] == 0).all()


def _stage_planar(frame, plan):
    """Host re-stage packet words to (pw, h, w) planes + (chw, w) headers
    (the layout native onat_group_frames_planar produces)."""
    cols = frame[:, plan.hw:plan.hw + plan.cpp * plan.cw]
    cols = cols.reshape(plan.w, plan.cw)
    pix = cols[:, plan.chw:plan.chw + plan.h * plan.pw]
    planes = np.ascontiguousarray(
        pix.reshape(plan.w, plan.h, plan.pw).transpose(2, 1, 0))
    hdrs = np.ascontiguousarray(cols[:, :plan.chw].T)
    return planes, hdrs


def _synth_profile_frame(profile, w=256, h=32):
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _make_info, _synth_frame
    from ouster_sdk_tpu import UDPProfileLidar

    info = _make_info(w=w, h=h, dual=False)
    info.format.udp_profile_lidar = UDPProfileLidar.from_string(profile)
    info.beam_azimuth_angles = list(np.tile([3.164, 1.055, -1.055, -3.164],
                                            h // 4))
    info.beam_altitude_angles = list(np.linspace(22.5, -22.5, h))
    return info, _synth_frame(info)


@pytest.mark.parametrize("profile", [
    "RNG19_RFL8_SIG16_NIR16_DUAL",      # aligned: pw=4, words 0,1
    "RNG19_RFL8_SIG16_NIR16_RGB16_DUAL",  # odd pw=5: split fallback
])
def test_planar_dual_kernel_paths(profile):
    """Both dual kernel layouts (merged 2-word block / split operands)
    match the numpy-f64 host projection, and the words= subset path is
    bit-identical to the full-plane path."""
    from ouster_sdk_tpu import ChanField, PacketFormat
    from ouster_sdk_tpu.ops.pallas_kernels import (
        PlanarLut, unpack_project_planar_batched)
    from ouster_sdk_tpu.ops.pallas_lutfree import _field_plan
    from ouster_sdk_tpu.ops.unpack import make_decode_plan

    info, frame = _synth_profile_frame(profile)
    plan = make_decode_plan(info)
    planes, hdrs = _stage_planar(frame, plan)
    lut64 = make_xyz_lut(info)
    lut = PlanarLut(lut64)

    o1, o2 = unpack_project_planar_batched(
        jnp.asarray(planes[None].copy()), jnp.asarray(hdrs[None].copy()),
        lut.stack, plan, dual=True, interpret=True, tile_w=128)

    pf = PacketFormat.from_info(info)
    bufs = np.ascontiguousarray(frame).view(np.uint8)
    for out, field in ((o1, ChanField.RANGE), (o2, ChanField.RANGE2)):
        rng = pf.packet_field_all(field, bufs)
        rng = np.concatenate(list(rng), axis=1)[:, :plan.w]
        ref = lut64(rng.astype(np.uint32))
        xyz = np.moveaxis(np.asarray(out[0]), 0, -1)
        ulp = np.spacing(np.abs(ref).astype(np.float32)).astype(np.float64)
        err = np.abs(xyz - ref)
        assert (err <= np.maximum(ulp, 1e-7)).all(), \
            f"{profile}/{field}: max err {err.max()}"

    # word-subset transfer path == full-plane path, bit for bit
    ws = (_field_plan(plan, "RANGE").word, _field_plan(plan, "RANGE2").word)
    sub = np.ascontiguousarray(planes[None][:, list(ws)])
    s1, s2 = unpack_project_planar_batched(
        jnp.asarray(sub), jnp.asarray(hdrs[None].copy()),
        lut.stack, plan, dual=True, interpret=True, tile_w=128, words=ws)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(o1))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(o2))


def test_planar_words_requires_needed_word():
    from ouster_sdk_tpu.ops.pallas_kernels import (
        PlanarLut, unpack_project_planar_batched)
    from ouster_sdk_tpu.ops.unpack import make_decode_plan

    info, frame = _synth_profile_frame("RNG19_RFL8_SIG16_NIR16_DUAL")
    plan = make_decode_plan(info)
    planes, hdrs = _stage_planar(frame, plan)
    lut = PlanarLut(make_xyz_lut(info))
    with pytest.raises(ValueError, match="needs packet word"):
        unpack_project_planar_batched(
            jnp.asarray(planes[None][:, 2:3].copy()),
            jnp.asarray(hdrs[None].copy()), lut.stack, plan,
            dual=True, interpret=True, tile_w=128, words=(2,))


@pytest.mark.parametrize("profile", [
    "RNG19_RFL8_SIG16_NIR16_DUAL",      # aligned: merged 2-word block
    "RNG19_RFL8_SIG16_NIR16_RGB16_DUAL",  # odd pw=5: split fallback
])
def test_planar_dual_fused_dewarp_matches_host(profile):
    """Dual-return fused unpack -> xyz -> dewarp (both kernel layouts):
    each return dewarps with the column's shared pose and matches the
    f64 host path within f32 representability; the XLA twin agrees
    bit-for-bit with itself across stagings (ref: pose_util.h:44-67 —
    dewarp is return-agnostic)."""
    from ouster_sdk_tpu import ChanField, PacketFormat
    from ouster_sdk_tpu.ops.pallas_kernels import (
        PlanarLut, unpack_project_planar_batched,
        unpack_project_planar_batched_xla)
    from ouster_sdk_tpu.ops.unpack import make_decode_plan
    from ouster_sdk_tpu.utils.pose_util import exp_pose6

    info, frame = _synth_profile_frame(profile)
    plan = make_decode_plan(info)
    planes, hdrs = _stage_planar(frame, plan)
    lut64 = make_xyz_lut(info)
    lut = PlanarLut(lut64)
    rng = np.random.default_rng(7)
    poses = np.stack([
        exp_pose6(np.concatenate([rng.normal(0, 1, 3),
                                  rng.normal(0, 0.1, 3)]))
        for _ in range(plan.w)]).astype(np.float32)

    o1, o2 = unpack_project_planar_batched(
        jnp.asarray(planes[None].copy()), jnp.asarray(hdrs[None].copy()),
        lut.stack, plan, dual=True, interpret=True, tile_w=128,
        poses=jnp.asarray(poses[None]))

    # XLA twin dewarps both returns too (same mask semantics; its einsum
    # accumulation order differs from the kernel's manual sum, so it gets
    # its own f64 bound rather than bitwise equality with the kernel)
    x1, x2 = unpack_project_planar_batched_xla(
        jnp.asarray(planes[None].copy()), jnp.asarray(hdrs[None].copy()),
        lut.stack, plan, dual=True, poses=jnp.asarray(poses[None]))

    pf = PacketFormat.from_info(info)
    bufs = np.ascontiguousarray(frame).view(np.uint8)
    for out, xout, field in ((o1, x1, ChanField.RANGE),
                             (o2, x2, ChanField.RANGE2)):
        r = pf.packet_field_all(field, bufs)
        r = np.concatenate(list(r), axis=1)[:, :plan.w].astype(np.uint32)
        world = np.einsum("wij,hwj->hwi",
                          poses[:, :3, :3].astype(np.float64),
                          lut64(r)) + poses[None, :, :3, 3]
        world[r == 0] = 0
        norm = np.linalg.norm(world, axis=-1)[..., None]
        ulp = np.spacing(norm.astype(np.float32)).astype(np.float64)
        for tag, o in (("pallas", out), ("xla", xout)):
            xyz = np.moveaxis(np.asarray(o[0]), 0, -1)
            err = np.abs(xyz - world)
            assert (err <= np.maximum(4 * ulp, 1e-6)).all(), \
                f"{profile}/{field}/{tag}: max err {err.max()}"
            # no-return pixels stay at the origin, not the translation
            assert (xyz[r == 0] == 0).all()
