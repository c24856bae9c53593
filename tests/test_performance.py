"""Performance property tests (no hard thresholds — regression tracking is
external, matching the reference strategy
ref: python/tests/test_performance.py:21-194)."""

import os

import numpy as np
import pytest

from ouster_sdk_tpu import ChanField, LidarScan, ScanBatcher, destagger, \
    make_xyz_lut
from ouster_sdk_tpu.io.pcap_source import PcapPacketSource
from ouster_sdk_tpu.utils.profiling import ProfileRunner

PCAP = "/root/reference/tests/pcaps/OS-2-128-U1_v2.3.0_1024x10.pcap"

ITERS = int(os.environ.get("OUSTER_PERF_ITERS", "3"))


@pytest.fixture(scope="module")
def scan_and_info():
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    src = PcapPacketSource(PCAP)
    info = src.sensor_info[0]
    batcher = ScanBatcher(info)
    scan = LidarScan(info)
    packets = [p for _, p in src if p.type().value == "Lidar"]
    for p in packets:
        if batcher(p, scan):
            break
    return scan, info, packets


def test_perf_destagger(scan_and_info, record_property):
    scan, info, _ = scan_and_info
    runner = ProfileRunner()
    rng = scan.field(ChanField.RANGE)
    for _ in range(ITERS):
        with runner.run("destagger"):
            destagger(info, rng)
    for k, v in runner.summary().items():
        record_property(k, v)


def test_perf_xyz(scan_and_info, record_property):
    scan, info, _ = scan_and_info
    lut = make_xyz_lut(info)
    runner = ProfileRunner()
    rng = scan.field(ChanField.RANGE)
    for _ in range(ITERS):
        with runner.run("cartesian_f64_host"):
            lut(rng)
    for k, v in runner.summary().items():
        record_property(k, v)


def test_perf_device_pipeline(scan_and_info, record_property):
    import jax
    import jax.numpy as jnp

    scan, info, packets = scan_and_info
    from ouster_sdk_tpu import PacketFormat
    from ouster_sdk_tpu.ops.fused import ScanPipeline
    from ouster_sdk_tpu.ops.unpack import frame_words_from_packets

    pf = PacketFormat.from_info(info)
    frame_pkts = [p for p in packets if pf.frame_id(p.buf) == scan.frame_id]
    pipe = ScanPipeline(info)
    words = jnp.asarray(frame_words_from_packets(frame_pkts, pipe.cfg.plan))
    out = pipe(words)
    jax.block_until_ready(out)  # compile outside timing
    runner = ProfileRunner()
    for _ in range(ITERS):
        with runner.run("fused_pipeline_device"):
            jax.block_until_ready(pipe(words))
    for k, v in runner.summary().items():
        record_property(k, v)


def test_perf_batching(scan_and_info, record_property):
    scan, info, packets = scan_and_info
    runner = ProfileRunner()
    for _ in range(ITERS):
        batcher = ScanBatcher(info)
        target = LidarScan(info)
        with runner.run("batching"):
            for p in packets:
                if batcher(p, target):
                    break
    for k, v in runner.summary().items():
        record_property(k, v)


def test_perf_dewarp(scan_and_info, record_property):
    from ouster_sdk_tpu.utils.pose_util import dewarp

    scan, info, _ = scan_and_info
    lut = make_xyz_lut(info)
    xyz = lut(scan.field(ChanField.RANGE))
    poses = np.broadcast_to(np.eye(4), (scan.w, 4, 4)).copy()
    runner = ProfileRunner()
    for _ in range(ITERS):
        with runner.run("dewarp"):
            dewarp(xyz, poses)
    for k, v in runner.summary().items():
        record_property(k, v)
