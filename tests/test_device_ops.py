"""Device (XLA) op correctness vs the numpy reference decoders.

- decode_frame vs PacketFormat (bit-exact on a real pcap frame)
- cartesian_dd vs float64 LUT (1e-5 m target; dd should be ~1e-9)
- destagger_jnp vs host destagger
- dewarp vs numpy mirror; exp/log roundtrip
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ouster_sdk_tpu import ChanField, LidarScan, ScanBatcher
from ouster_sdk_tpu.io.pcap_source import PcapPacketSource
from ouster_sdk_tpu.ops import destagger as ds
from ouster_sdk_tpu.ops import pose as pose_ops
from ouster_sdk_tpu.ops import xyzlut as xl
from ouster_sdk_tpu.ops.unpack import (
    decode_frame,
    frame_words_from_packets,
    make_decode_plan,
)

PCAPS = {
    "single": "/root/reference/tests/pcaps/OS-2-128-U1_v2.3.0_1024x10.pcap",
    "legacy": "/root/reference/tests/pcaps/OS-2-32-U0_v2.0.0_1024x10.pcap",
    "lb": "/root/reference/tests/pcaps/OS-0-128-U1_v2.3.0_1024x10.pcap",
}


def _first_scan_and_packets(path):
    from ouster_sdk_tpu import PacketFormat

    src = PcapPacketSource(path)
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
    # keep only packets belonging to the completed frame
    packets = [p for p in packets if pf.frame_id(p.buf) == scan.frame_id]
    return info, scan, packets


@pytest.mark.parametrize("kind", sorted(PCAPS))
def test_decode_frame_matches_host(kind):
    info, scan, packets = _first_scan_and_packets(PCAPS[kind])
    plan = make_decode_plan(info)
    words = frame_words_from_packets(packets, plan)
    out = decode_frame(jnp.asarray(words), plan)

    for name in (ChanField.RANGE, ChanField.SIGNAL, ChanField.REFLECTIVITY,
                 ChanField.NEAR_IR, ChanField.FLAGS):
        if not scan.has_field(name):
            continue
        dev = np.asarray(out[name])
        host = scan.field(name)
        assert dev.dtype == host.dtype, name
        np.testing.assert_array_equal(dev, host, err_msg=name)

    np.testing.assert_array_equal(np.asarray(out["status"]), scan.status)
    np.testing.assert_array_equal(np.asarray(out["measurement_id"]),
                                  scan.measurement_id)
    ts = (np.asarray(out["timestamp_hi"]).astype(np.uint64) << np.uint64(32)) \
        | np.asarray(out["timestamp_lo"]).astype(np.uint64)
    np.testing.assert_array_equal(ts, scan.timestamp)


def test_decode_frame_scatter_path():
    info, scan, packets = _first_scan_and_packets(PCAPS["single"])
    plan = make_decode_plan(info)
    words = frame_words_from_packets(packets, plan)
    # shuffle packet order; scatter path must still place columns correctly
    rng = np.random.default_rng(0)
    shuffled = words[rng.permutation(words.shape[0])]
    out = decode_frame(jnp.asarray(shuffled), plan, dense=False)
    np.testing.assert_array_equal(np.asarray(out[ChanField.RANGE]),
                                  scan.field(ChanField.RANGE))
    np.testing.assert_array_equal(np.asarray(out["status"]), scan.status)


def test_cartesian_precision():
    info, scan, _ = _first_scan_and_packets(PCAPS["single"])
    lut = xl.make_xyz_lut(info)
    rng_img = scan.field(ChanField.RANGE)
    ref = lut(rng_img)  # float64 reference

    dev_lut = xl.to_device_lut(lut)
    xyz_dd = np.asarray(xl.cartesian_dd(jnp.asarray(rng_img), dev_lut))

    # The dd path computes the f64 result then rounds once to f32: error must
    # be bounded by the f32 representation error of the reference (1 ulp),
    # i.e. the output is the correctly-rounded f32 of the f64 answer.
    ulp = np.spacing(np.abs(ref).astype(np.float32)).astype(np.float64)
    err_dd = np.abs(xyz_dd - ref)
    assert (err_dd <= np.maximum(ulp, 1e-7)).all(), \
        f"beyond-correctly-rounded error: {(err_dd / np.maximum(ulp, 1e-30)).max()} ulp"

    # and in absolute terms the 1e-5 m target holds wherever f32 can express
    # it (|coord| < 2^23 * 1e-5 / 0.5 ≈ 168 m); document the global bound too
    near = np.abs(ref) < 150.0
    assert err_dd[near].max() < 1e-5
    assert err_dd.max() < 4e-5  # 1 ulp at the longest fixture ranges

    xyz_f32 = np.asarray(xl.cartesian_f32(jnp.asarray(rng_img), dev_lut))
    err_f32 = np.abs(xyz_f32 - ref).max()
    assert err_f32 < 1e-3  # sanity for the fast path


def test_destagger_matches_host_and_roundtrip():
    info, scan, _ = _first_scan_and_packets(PCAPS["single"])
    img = scan.field(ChanField.RANGE)
    host = ds.destagger(info, img)
    dev = np.asarray(ds.destagger_jnp(
        jnp.asarray(img), info.format.pixel_shift_by_row))
    np.testing.assert_array_equal(host, dev)
    # stagger(destagger(x)) == x
    back = ds.stagger(info, host)
    np.testing.assert_array_equal(back, img)
    # 3-channel variant
    img3 = np.stack([img, img + 1, img + 2], axis=-1)
    host3 = ds.destagger(info, img3)
    dev3 = np.asarray(ds.destagger_jnp(
        jnp.asarray(img3), info.format.pixel_shift_by_row))
    np.testing.assert_array_equal(host3, dev3)


def test_destagger_against_known_shift():
    # tiny example: w=4, shift=1 moves column j to j+1
    img = np.arange(8, dtype=np.int64).reshape(2, 4)
    out = ds.destagger([1, 0], img)
    np.testing.assert_array_equal(out[0], np.roll(img[0], 1))
    np.testing.assert_array_equal(out[1], img[1])


def test_dewarp_and_se3():
    rng = np.random.default_rng(42)
    W = 32
    pts = rng.normal(size=(8, W, 3)).astype(np.float32)

    # random rigid poses per column
    def rand_pose():
        angle = rng.normal(size=3) * 0.1
        t = rng.normal(size=3)
        xi = np.concatenate([angle, t]).astype(np.float32)
        return np.asarray(pose_ops.exp_pose(jnp.asarray(xi)))

    poses = np.stack([rand_pose() for _ in range(W)])
    # rotation blocks orthonormal
    RtR = np.einsum("wij,wik->wjk", poses[:, :3, :3], poses[:, :3, :3])
    assert np.abs(RtR - np.eye(3)).max() < 1e-5

    host = pose_ops.dewarp_np(pts, poses)
    dev = np.asarray(pose_ops.dewarp(jnp.asarray(pts), jnp.asarray(poses)))
    assert np.abs(host - dev).max() < 1e-5

    # log/exp roundtrip
    xi = rng.normal(size=(16, 6)).astype(np.float32) * 0.5
    T = pose_ops.exp_pose(jnp.asarray(xi))
    xi_back = np.asarray(pose_ops.log_pose(T))
    assert np.abs(xi_back - xi).max() < 1e-4

    # interpolation endpoints + midpoint sanity
    p0 = np.eye(4, dtype=np.float32)
    p1 = np.asarray(pose_ops.exp_pose(
        jnp.asarray(np.array([0, 0, 0.2, 1, 2, 3], dtype=np.float32))))
    mid = np.asarray(pose_ops.interp_pose(0.5, jnp.asarray(p0),
                                          jnp.asarray(p1)))
    ends = np.asarray(pose_ops.interp_pose(
        np.array([0.0, 1.0], dtype=np.float32),
        jnp.asarray(p0), jnp.asarray(p1)))
    assert np.abs(ends[0] - p0).max() < 1e-5
    assert np.abs(ends[1] - p1).max() < 1e-5
    half = np.asarray(pose_ops.log_pose(jnp.asarray(mid)))
    full = np.asarray(pose_ops.log_pose(jnp.asarray(p1)))
    assert np.abs(half * 2 - full).max() < 1e-4
