"""Pose-graph optimizer tests (ref: pose_optimizer.cpp behaviors)."""

import numpy as np

from ouster_sdk_tpu.slam.kiss_icp import se3_exp
from ouster_sdk_tpu.slam.pose_optimizer import (
    AbsolutePoseConstraint,
    AbsolutePointConstraint,
    PointToPointConstraint,
    PoseOptimizer,
    PoseToPoseConstraint,
    SolverConfig,
)


def _traj(n=6, step=1.0, drift=0.02, seed=0):
    """Ground truth straight line + drifty odometry estimate."""
    rng = np.random.default_rng(seed)
    gt, est = [], []
    T_gt = np.eye(4)
    T_est = np.eye(4)
    for i in range(n):
        gt.append(T_gt.copy())
        est.append(T_est.copy())
        inc_gt = np.eye(4)
        inc_gt[:3, 3] = [step, 0, 0]
        inc_est = se3_exp(np.concatenate([
            [step, 0, 0] + rng.normal(0, drift, 3),
            rng.normal(0, drift * 0.2, 3)]))
        T_gt = T_gt @ inc_gt
        T_est = T_est @ inc_est
    return gt, est


def test_absolute_pose_anchors_pull_trajectory():
    gt, est = _traj()
    ts = list(range(len(gt)))
    opt = PoseOptimizer.from_trajectory(ts, est)
    # anchor first and last nodes to ground truth
    opt.add_constraint(AbsolutePoseConstraint(
        ts[-1], gt[-1], rotation_weight=50, translation_weight=50))
    nodes = opt.solve()
    end_err_before = np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3])
    end_err_after = np.linalg.norm(nodes[-1].pose[:3, 3] - gt[-1][:3, 3])
    assert end_err_after < end_err_before * 0.2 + 1e-6
    # intermediate nodes also improve
    mid = len(gt) // 2
    mid_before = np.linalg.norm(est[mid][:3, 3] - gt[mid][:3, 3])
    mid_after = np.linalg.norm(nodes[mid].pose[:3, 3] - gt[mid][:3, 3])
    assert mid_after <= mid_before + 1e-9


def test_pose_to_pose_loop_closure():
    gt, est = _traj(n=8, drift=0.05, seed=3)
    ts = list(range(len(gt)))
    opt = PoseOptimizer.from_trajectory(ts, est)
    # loop closure: true relative pose between first and last
    rel_true = np.linalg.solve(gt[0], gt[-1])
    opt.add_constraint(PoseToPoseConstraint(
        ts[0], ts[-1], rel_true, rotation_weight=20, translation_weight=20))
    nodes = opt.solve()
    rel_est = np.linalg.solve(nodes[0].pose, nodes[-1].pose)
    assert np.linalg.norm(rel_est[:3, 3] - rel_true[:3, 3]) < 0.05


def test_point_constraints():
    gt, est = _traj(n=4, drift=0.05, seed=5)
    ts = list(range(len(gt)))
    opt = PoseOptimizer.from_trajectory(ts, est)
    # a landmark at world (2, 1, 0) observed from nodes 0 and 3
    lm = np.array([2.0, 1.0, 0.0])
    p0 = np.linalg.solve(gt[0], np.append(lm, 1))[:3]
    p3 = np.linalg.solve(gt[3], np.append(lm, 1))[:3]
    opt.add_constraint(PointToPointConstraint(ts[0], p0, ts[3], p3,
                                              translation_weight=20))
    opt.add_constraint(AbsolutePointConstraint(ts[3], p3, lm,
                                               translation_weight=20))
    nodes = opt.solve()
    lm_est = nodes[3].pose[:3, :3] @ p3 + nodes[3].pose[:3, 3]
    assert np.linalg.norm(lm_est - lm) < 0.05


def test_trajectory_exports(tmp_path):
    gt, est = _traj(n=3)
    opt = PoseOptimizer.from_trajectory([0, 1, 2], est)
    kitti = str(tmp_path / "t.kitti")
    tum = str(tmp_path / "t.tum")
    opt.save_trajectory_kitti(kitti)
    opt.save_trajectory_tum(tum)
    k = np.loadtxt(kitti)
    assert k.shape == (3, 12)
    t = np.loadtxt(tum)
    assert t.shape == (3, 8)
    # quaternion normalized
    assert np.allclose(np.linalg.norm(t[:, 4:], axis=1), 1.0, atol=1e-6)


def test_optimize_osf_trajectory(tmp_path):
    """End-to-end: constraint JSON anchors the first scan; the odometry
    chain carries the rest rigidly (ref: plugins/source.py:856
    pose_optimize, constraint_config.cpp)."""
    import json
    import os

    import pytest

    OSF = "/root/reference/tests/osfs/OS-1-128_v2.3.0_1024x10_lb_n3.osf"
    if not os.path.exists(OSF):
        pytest.skip("fixture missing")

    from ouster_sdk_tpu.io.osf import OsfScanSource
    from ouster_sdk_tpu.slam.engine import SlamConfig, SlamEngine
    from ouster_sdk_tpu.slam.pose_optimizer import optimize_osf_trajectory
    from ouster_sdk_tpu.io.osf import Writer

    # build a slammed OSF
    src = OsfScanSource(OSF)
    engine = SlamEngine(src.sensor_info, SlamConfig())
    slammed = str(tmp_path / "slammed.osf")
    with Writer(slammed) as w:
        for info in src.sensor_info:
            w.add_sensor(info)
        for ls_set in src:
            engine.update(ls_set)
            for idx, s in enumerate(ls_set):
                if s is not None:
                    w.save(idx, s)
    src.close()

    back = OsfScanSource(slammed)
    scans = [s for ls in back for s in ls.valid()]
    cols = np.flatnonzero(scans[0].status & 1)
    mid = int(cols[len(cols) // 2])
    ts0 = int(scans[0].timestamp[mid])
    rel_before = [np.linalg.solve(scans[i].pose[mid],
                                  scans[i + 1].pose[mid])
                  for i in range(len(scans) - 1)]
    back.close()

    cfg = {"loss_function": "HuberLoss",
           "constraints": [{"type": "ABSOLUTE_POSE", "timestamp": ts0,
                            "pose": {"x": 0.5},
                            "rotation_weight": 100.0,
                            "translation_weight": 100.0}]}
    out = str(tmp_path / "optimized.osf")
    n = optimize_osf_trajectory(slammed, out, json.dumps(cfg))
    assert n == len(scans)

    opt = OsfScanSource(out)
    oscans = [s for ls in opt for s in ls.valid()]
    assert np.allclose(oscans[0].pose[mid][:3, 3], [0.5, 0, 0], atol=1e-2)
    rel_after = [np.linalg.solve(oscans[i].pose[mid],
                                 oscans[i + 1].pose[mid])
                 for i in range(len(oscans) - 1)]
    for a, b in zip(rel_before, rel_after):
        np.testing.assert_allclose(a, b, atol=1e-3)
    opt.close()
