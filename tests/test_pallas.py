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
