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
