"""SLAM tests: synthetic ICP recovery + trajectory vs KITTI ground truth
(ref: tests/slam_test.cpp, tests/integration/mapping)."""

import os

import numpy as np
import pytest

from ouster_sdk_tpu.slam.kiss_icp import (
    KissConfig,
    KissICP,
    VoxelHashMap,
    register_points_to_map,
    se3_exp,
)

OSF = "/root/reference/tests/osfs/OS-1-128_v2.3.0_1024x10_lb_n3.osf"
GT = "/root/reference/tests/pcaps/OS-1-128_v2.3.0_1024x10_lb_n3_poses_kitti.txt"


def _random_world(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    # structured scene: two walls + floor + scattered clutter
    pts = []
    pts.append(np.stack([rng.uniform(5, 30, n // 4),
                         np.full(n // 4, 8.0) + rng.normal(0, 0.01, n // 4),
                         rng.uniform(0, 4, n // 4)], axis=1))
    pts.append(np.stack([np.full(n // 4, 25.0) + rng.normal(0, 0.01, n // 4),
                         rng.uniform(-10, 8, n // 4),
                         rng.uniform(0, 4, n // 4)], axis=1))
    pts.append(np.stack([rng.uniform(5, 30, n // 4),
                         rng.uniform(-10, 8, n // 4),
                         rng.normal(0, 0.01, n // 4)], axis=1))
    pts.append(rng.uniform([5, -10, 0], [30, 8, 4], size=(n // 4, 3)))
    return np.concatenate(pts, axis=0)


def test_icp_recovers_known_transform():
    world = _random_world()
    vm = VoxelHashMap(voxel_size=1.0, max_distance=200.0,
                      max_points_per_voxel=20)
    vm.add_points(world)

    true_xi = np.array([0.3, -0.2, 0.1, 0.02, -0.01, 0.03])
    T_true = se3_exp(true_xi)
    # scan = world seen from T_true: register(scan, I) should estimate T s.t.
    # T @ scan ~ world, i.e. T ~ T_true^-1... use forward convention:
    scan = (world - T_true[:3, 3]) @ T_true[:3, :3]
    est = register_points_to_map(scan, vm, np.eye(4),
                                 max_correspondence_distance=1.0,
                                 kernel_scale=0.3)
    err_t = np.linalg.norm(est[:3, 3] - T_true[:3, 3])
    err_r = np.abs(est[:3, :3] - T_true[:3, :3]).max()
    assert err_t < 0.02, f"translation error {err_t}"
    assert err_r < 0.01, f"rotation error {err_r}"


def test_kiss_icp_odometry_synthetic():
    """Three synthetic frames moving forward: estimated motion ~ truth."""
    world = _random_world(6000, seed=1)
    kiss = KissICP(KissConfig(voxel_size=0.5, min_range=0.5, max_range=200))
    motion = np.eye(4)
    motion[:3, 3] = [0.5, 0.05, 0.0]

    poses = [np.eye(4)]
    T = np.eye(4)
    est = []
    for i in range(4):
        # frame in sensor coords at pose T: p_sensor = R^-1 (p_world - t)
        frame = (world - T[:3, 3]) @ T[:3, :3]
        guess = poses[-1] if len(est) < 2 else est[-1] @ \
            np.linalg.solve(est[-2], est[-1])
        new_pose = kiss.register_frame(frame, guess)
        est.append(new_pose)
        poses.append(T.copy())
        T = T @ motion

    # after warmup, per-frame translation should be ~0.5 m
    d = np.linalg.norm(est[3][:3, 3] - est[2][:3, 3])
    assert 0.3 < d < 0.7, f"frame-to-frame displacement {d}"


@pytest.mark.slow
def test_slam_trajectory_vs_kitti():
    if not (os.path.exists(OSF) and os.path.exists(GT)):
        pytest.skip("fixtures missing")
    from ouster_sdk_tpu.io.osf import OsfScanSource
    from ouster_sdk_tpu.slam.engine import SlamConfig, SlamEngine

    src = OsfScanSource(OSF)
    engine = SlamEngine(src.sensor_info,
                        SlamConfig(min_range=1.0, max_range=100.0,
                                   voxel_size=1.0))
    traj = []
    for ls_set in src:
        engine.update(ls_set)
        traj.append(engine.last_pose.copy())

    gt = np.loadtxt(GT).reshape(-1, 3, 4)
    assert len(traj) == gt.shape[0]

    # frame-to-frame translation deltas vs ground truth: with the
    # reference-exact kiss-icp internals (first-point downsample,
    # voxel-hash map, 27-voxel NN — proven against the compiled
    # reference in test_kiss_icp_oracle.py) this fixture measures
    # 0.016 / 0.041 m; bound at 0.05 m
    for i in range(1, len(traj)):
        est_d = traj[i][:3, 3] - traj[i - 1][:3, 3]
        gt_d = gt[i][:, 3] - gt[i - 1][:, 3]
        err = np.linalg.norm(est_d - gt_d)
        assert err < 0.05, f"frame {i}: delta error {err} (est {est_d}, " \
            f"gt {gt_d})"
        abs_err = np.linalg.norm(traj[i][:3, 3] - gt[i][:, 3])
        assert abs_err < 0.05, f"frame {i}: absolute error {abs_err}"


def test_jax_icp_matches_host_single_shot():
    """Device-resident GN ICP (slam/jax_icp.py) recovers the same pose
    as the host voxel-hash ICP on one registration."""
    import jax.numpy as jnp

    from ouster_sdk_tpu.slam.jax_icp import (_MAP_CHUNK, _bucket,
                                             register_points_jax)

    world = _random_world()
    vm = VoxelHashMap(voxel_size=1.0, max_distance=200.0,
                      max_points_per_voxel=20)
    vm.add_points(world)
    T_true = se3_exp(np.array([0.3, -0.2, 0.1, 0.02, -0.01, 0.03]))
    scan = (world - T_true[:3, 3]) @ T_true[:3, :3]
    host = register_points_to_map(scan, vm, np.eye(4),
                                  max_correspondence_distance=1.0,
                                  kernel_scale=0.3)

    mp = vm.pointcloud().astype(np.float32)
    N = _bucket(len(scan))
    M = _bucket(max(len(mp), _MAP_CHUNK), _MAP_CHUNK)
    sp = np.zeros((N, 3), np.float32)
    sp[: len(scan)] = scan
    sv = np.zeros(N, bool)
    sv[: len(scan)] = True
    mpad = np.zeros((M, 3), np.float32)
    mpad[: len(mp)] = mp
    mv = np.zeros(M, bool)
    mv[: len(mp)] = True
    dev = np.asarray(register_points_jax(
        jnp.asarray(sp), jnp.asarray(sv), jnp.asarray(mpad),
        jnp.asarray(mv), jnp.asarray(np.eye(4), jnp.float32),
        jnp.float32(1.0), jnp.float32(0.3), voxel_size=jnp.float32(1.0)))
    assert np.linalg.norm(dev[:3, 3] - host[:3, 3]) < 1e-3
    assert np.abs(dev[:3, :3] - host[:3, :3]).max() < 1e-4


def test_jax_icp_odometry_matches_host():
    """JaxICP odometry tracks the host KissICP trajectory."""
    from ouster_sdk_tpu.slam.jax_icp import JaxICP

    world = _random_world(6000, seed=1)
    motion = np.eye(4)
    motion[:3, 3] = [0.5, 0.05, 0.0]

    def drive(icp):
        est = []
        T = np.eye(4)
        for i in range(4):
            frame = (world - T[:3, 3]) @ T[:3, :3]
            guess = np.eye(4) if len(est) < 2 else est[-1] @ \
                np.linalg.solve(est[-2], est[-1])
            if len(est) in (0, 1) and est:
                guess = est[-1]
            est.append(icp.register_frame(frame, guess))
            T = T @ motion
        return est

    est_h = drive(KissICP(KissConfig(voxel_size=0.5, min_range=0.5,
                                     max_range=200)))
    est_j = drive(JaxICP(KissConfig(voxel_size=0.5, min_range=0.5,
                                    max_range=200)))
    for a, b in zip(est_h, est_j):
        assert np.linalg.norm(a[:3, 3] - b[:3, 3]) < 0.05


def test_time_correction_rewrites_nonmonotonic_and_shifts_imu():
    """Non-monotonic frames are rewritten from the previous frame start
    + frame duration, packet-offset mode engages, IMU timestamps shift
    with the columns, and reset() restores everything
    (ref: active_time_correction.cpp:60-133, 221-244)."""
    from ouster_sdk_tpu import ChanField, LidarScan
    from ouster_sdk_tpu.core.metadata import sensor_info_from_metadata
    from ouster_sdk_tpu.slam.time_correction import ActiveTimeCorrection

    meta = open("/root/reference/tests/pcaps/"
                "OS-2-128-U1_v2.3.0_1024x10.json").read()
    info = sensor_info_from_metadata(meta)
    tc = ActiveTimeCorrection([info])

    s = LidarScan(info)
    s.status[:] = 1
    s.timestamp[:] = np.arange(s.w, dtype=np.uint64) * 100_000 + 10**9
    s.timestamp[10] = 1  # backwards jump mid-frame
    s.packet_timestamp[:] = 2 * 10**9
    from ouster_sdk_tpu.core.field import FieldClass

    s.add_field("IMU_TIMESTAMP", (np.arange(6, dtype=np.uint64) + 1)
                * 10**8, FieldClass.SCAN_FIELD)
    orig_ts = s.timestamp.copy()
    orig_imu = s.field(ChanField.IMU_TIMESTAMP).copy()

    offs = tc.update([s])
    # rewritten to monotonic + packet offset applied
    nz = s.timestamp[s.timestamp != 0].astype(np.int64)
    assert np.all(np.diff(nz) > 0)
    assert offs[0] != 0
    assert s.field(ChanField.IMU_TIMESTAMP)[0] != orig_imu[0]

    tc.reset([s])
    np.testing.assert_array_equal(s.timestamp, orig_ts)
    np.testing.assert_array_equal(s.field(ChanField.IMU_TIMESTAMP),
                                  orig_imu)


def test_clipped_scan_source_raw_units_and_copies():
    """ClippedScanSource clips in RAW units and yields copies
    (ref: sdk/core/clipped_scan_source.py)."""
    from ouster_sdk_tpu import ChanField, LidarScan
    from ouster_sdk_tpu.io.derived import ClippedScanSource
    from ouster_sdk_tpu.io.sources import LidarScanSet, ScanSource

    class Fake(ScanSource):
        def __init__(self):
            super().__init__([None])
            self.scans = []

        def _iter_sets(self):
            s = LidarScan(w=32, h=4)
            s.field(ChanField.RANGE)[:] = 5000  # 5 m in mm
            self.scans.append(s)
            yield LidarScanSet([s])

    src = Fake()
    out = list(ClippedScanSource(src, [ChanField.RANGE], 1000, 4000))
    clipped = out[0][0]
    assert (clipped.field(ChanField.RANGE) == 0).all()   # 5000 > 4000
    # parent's scan untouched (copies, not in-place)
    assert (src.scans[0].field(ChanField.RANGE) == 5000).all()
    with pytest.raises(ValueError):
        ClippedScanSource(src, [ChanField.RANGE], 10, 5)


def test_constant_velocity_deskew_screw_scaling():
    """pose_at(last_ts + dt_hist) reproduces the last relative motion
    exactly (true SE(3) geodesic, not component scaling)."""
    from ouster_sdk_tpu.slam.deskew import ConstantVelocityDeskewMethod
    from ouster_sdk_tpu.utils.pose_util import _se3_exp64

    d = ConstantVelocityDeskewMethod()
    p0 = np.eye(4)
    rel = _se3_exp64(np.array([0.5, 0.2, 0.1, 1.0, 0.4, 0.0]))
    p1 = p0 @ rel
    d.set_last_pose(1_000_000_000, p0)
    d.set_last_pose(1_100_000_000, p1)

    from ouster_sdk_tpu import LidarScan
    s = LidarScan(w=64, h=4)
    s.status[:] = 1
    # scan spanning exactly one historic interval beyond last_ts
    s.timestamp[:] = np.linspace(1_100_000_000, 1_200_000_000, 64,
                                 dtype=np.uint64)
    d.update([s])
    # first column = last pose; last column = last_pose @ rel
    np.testing.assert_allclose(s.pose[0], p1, atol=1e-9)
    np.testing.assert_allclose(s.pose[-1], p1 @ rel, atol=1e-9)
