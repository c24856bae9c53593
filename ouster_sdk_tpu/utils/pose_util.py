"""Pose utilities at the Python API surface.

Rebuild of the reference numpy pose helpers (ref: python/src/ouster/sdk/
util/pose_util.py): log/exp maps, pose (de)composition, trajectory
evaluation at query timestamps, and dewarp — thin host wrappers over the
device ops in ops/pose.py.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import numpy as np

from ..ops import pose as _ops

Numeric = Union[np.ndarray, Sequence[float]]


def exp_pose6(xi: Numeric) -> np.ndarray:
    """se(3) (rot, trans) -> 4x4 (float64)."""
    import jax.numpy as jnp

    return np.asarray(_ops.exp_pose(jnp.asarray(np.asarray(xi,
                                                np.float32))),
                      dtype=np.float64)


def log_pose(T: Numeric) -> np.ndarray:
    import jax.numpy as jnp

    return np.asarray(_ops.log_pose(jnp.asarray(np.asarray(T, np.float32))),
                      dtype=np.float64)


def pose_interp(t, pose0: Numeric, pose1: Numeric) -> np.ndarray:
    import jax.numpy as jnp

    return np.asarray(_ops.interp_pose(
        jnp.asarray(np.asarray(t, np.float32)),
        jnp.asarray(np.asarray(pose0, np.float32)),
        jnp.asarray(np.asarray(pose1, np.float32))), dtype=np.float64)


def dewarp(points: np.ndarray, poses: np.ndarray) -> np.ndarray:
    """(ref: pose_util.py dewarp): points (..., W, 3) x poses (W, 4, 4)."""
    return _ops.dewarp_np(np.asarray(points, np.float64),
                          np.asarray(poses, np.float64))


def transform(points: np.ndarray, pose: np.ndarray) -> np.ndarray:
    return _ops.transform_np(np.asarray(points, np.float64),
                             np.asarray(pose, np.float64))


class Trajectory:
    """Pose trajectory with timestamped knots, evaluable at arbitrary
    timestamps (ref: pose_util.py TrajectoryEvaluator)."""

    def __init__(self, timestamps: np.ndarray, poses: np.ndarray):
        order = np.argsort(np.asarray(timestamps))
        self.timestamps = np.asarray(timestamps, dtype=np.int64)[order]
        self.poses = np.asarray(poses, dtype=np.float64).reshape(
            -1, 4, 4)[order]
        if len(self.timestamps) < 1:
            raise ValueError("trajectory needs at least one knot")

    def pose_at(self, ts) -> np.ndarray:
        """Evaluate at ts (scalar or array); out-of-range queries
        extrapolate along the first/last interval (reference semantics).
        Times are converted to frame-local seconds before f32 interp."""
        ts = np.atleast_1d(np.asarray(ts, dtype=np.int64))
        if len(self.timestamps) == 1:
            out = np.broadcast_to(self.poses[0], (ts.size, 4, 4)).copy()
            return out if ts.size > 1 else out[0]

        base = self.timestamps[0]
        knots_s = (self.timestamps - base) * 1e-9
        query_s = (ts - base) * 1e-9
        import jax.numpy as jnp

        out = np.asarray(_ops.interp_trajectory(
            jnp.asarray(query_s, jnp.float32),
            jnp.asarray(knots_s, jnp.float32),
            jnp.asarray(self.poses, jnp.float32)), dtype=np.float64)
        return out if ts.size > 1 else out[0]

    def dewarp_scan(self, scan) -> None:
        """Write interpolated per-column poses into a scan."""
        ts = scan.timestamp.astype(np.int64)
        valid = scan.status.astype(bool) & (ts > 0)
        if valid.any():
            scan.pose[valid] = self.pose_at(ts[valid])


def get_rot_matrix_to_align_to_gravity(accel_x: float, accel_y: float,
                                       accel_z: float) -> np.ndarray:
    """Rotation aligning the measured gravity (accelerometer mean) with
    [0, 0, 1], yaw fixed to zero (ref: sdk/util/pose_util.py:636
    get_rot_matrix_to_align_to_gravity — Rodrigues + counter-yaw)."""
    g = np.array([0.0, 0.0, 1.0])
    a = np.array([accel_x, accel_y, accel_z], dtype=np.float64)
    a = a / np.linalg.norm(a)
    axis = np.cross(a, g)
    n = np.linalg.norm(axis)
    if n > 0:
        axis = axis / n
    angle = np.arccos(np.clip(np.dot(a, g), -1.0, 1.0))
    K = np.array([[0.0, -axis[2], axis[1]],
                  [axis[2], 0.0, -axis[0]],
                  [-axis[1], axis[0], 0.0]])
    R_align = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)
    fwd = R_align @ np.array([1.0, 0.0, 0.0])
    yaw = np.arctan2(fwd[1], fwd[0])
    c, s = np.cos(-yaw), np.sin(-yaw)
    R_yaw = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    return R_yaw @ R_align


def load_kitti_poses(path: str) -> np.ndarray:
    """(ref: slam_util.cpp KITTI import): (N, 4, 4) from N x 12 rows."""
    rows = np.loadtxt(path).reshape(-1, 3, 4)
    out = np.broadcast_to(np.eye(4), (rows.shape[0], 4, 4)).copy()
    out[:, :3, :] = rows
    return out
