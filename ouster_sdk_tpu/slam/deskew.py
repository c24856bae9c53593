"""Motion deskew methods: constant-velocity extrapolation and IMU
integration.

Rebuild of the reference deskew machinery (ref: ouster_mapping/src/
deskew_method.{h,cpp}:32-514): a DeskewMethod updates each scan's
per-column pose array before registration so points are motion-compensated.
The per-column SE(3) interpolation itself is the batched device op
(ops/pose.interp_pose).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..core.constants import ChanField
from ..core.lidar_scan import LidarScan
from ..core.types import SensorInfo


def _interp_cols(scan: LidarScan, pose0: np.ndarray,
                 pose1: np.ndarray) -> None:
    import jax.numpy as jnp

    from ..ops.pose import interp_pose

    frac = np.linspace(0.0, 1.0, scan.w, dtype=np.float32)
    out = interp_pose(jnp.asarray(frac), jnp.asarray(pose0,
                                                     dtype=jnp.float32),
                      jnp.asarray(pose1, dtype=jnp.float32))
    scan.pose[:] = np.asarray(out, dtype=np.float64)


class DeskewMethod:
    """Interface (ref: deskew_method.h:32)."""

    def update(self, scans: Sequence[Optional[LidarScan]]) -> None:
        raise NotImplementedError

    def set_last_pose(self, ts: int, pose: np.ndarray) -> None:
        raise NotImplementedError


class NoneDeskewMethod(DeskewMethod):
    def __init__(self):
        self._last_pose = np.eye(4)

    def update(self, scans) -> None:
        for s in scans:
            if s is not None:
                s.pose[:] = self._last_pose

    def set_last_pose(self, ts: int, pose: np.ndarray) -> None:
        self._last_pose = np.asarray(pose).reshape(4, 4).copy()


class ConstantVelocityDeskewMethod(DeskewMethod):
    """Extrapolate the last relative motion across the new scan's columns
    (ref: deskew_method.h:102, deskew_method.cpp)."""

    def __init__(self):
        self._last_ts: Optional[int] = None
        self._last_pose = np.eye(4)
        self._prev_ts: Optional[int] = None
        self._prev_pose: Optional[np.ndarray] = None

    def update(self, scans) -> None:
        anchor = next((s for s in scans if s is not None), None)
        if anchor is None:
            return
        if self._prev_pose is None or self._prev_ts is None or \
                self._last_ts is None or self._last_ts == self._prev_ts:
            for s in scans:
                if s is not None:
                    s.pose[:] = self._last_pose
            return

        t0 = anchor.first_valid_column_timestamp()
        t1 = anchor.last_valid_column_timestamp()
        dt_hist = self._last_ts - self._prev_ts
        rel = np.linalg.solve(self._prev_pose, self._last_pose)
        # velocity-scaled extrapolation from last pose to scan start/end
        from .kiss_icp import se3_exp
        from .pose_optimizer import _R_to_rotvec

        w = _R_to_rotvec(rel[:3, :3])
        v = rel[:3, 3]

        def pose_at(ts: int) -> np.ndarray:
            a = (ts - self._last_ts) / dt_hist
            return self._last_pose @ se3_exp(
                np.concatenate([a * v, a * w]))

        for s in scans:
            if s is None:
                continue
            st = s.first_valid_column_timestamp() or t0
            en = s.last_valid_column_timestamp() or t1
            _interp_cols(s, pose_at(st), pose_at(en if en > st else st + 1))

    def set_last_pose(self, ts: int, pose: np.ndarray) -> None:
        self._prev_ts, self._prev_pose = self._last_ts, \
            (self._last_pose.copy() if self._last_ts is not None else None)
        self._last_ts = int(ts)
        self._last_pose = np.asarray(pose).reshape(4, 4).copy()


class InertialIntegrationImuDeskewMethod(DeskewMethod):
    """Gyro/accel integration between column timestamps
    (ref: deskew_method.h:133, deskew_method.cpp inertial integration)."""

    GRAVITY = np.array([0.0, 0.0, -9.80665])

    def __init__(self, infos: List[SensorInfo]):
        self._infos = infos
        self._last_ts: Optional[int] = None
        self._last_pose = np.eye(4)
        self._velocity = np.zeros(3)

    def update(self, scans) -> None:
        from .kiss_icp import se3_exp

        for s in scans:
            if s is None:
                continue
            if not s.has_field(ChanField.IMU_GYRO) or \
                    not s.has_field(ChanField.IMU_TIMESTAMP):
                s.pose[:] = self._last_pose
                continue
            gyro = s.field(ChanField.IMU_GYRO)  # (n, 3) deg/s
            imu_ts = s.field(ChanField.IMU_TIMESTAMP).astype(np.float64)
            valid = imu_ts > 0
            if valid.sum() < 2:
                s.pose[:] = self._last_pose
                continue
            gyro = np.deg2rad(gyro[valid])
            imu_ts = imu_ts[valid] * 1e-9
            col_ts = s.timestamp.astype(np.float64) * 1e-9

            # integrate gyro into incremental rotations at IMU rate, then
            # sample per column
            dts = np.diff(imu_ts)
            inc = np.zeros((len(imu_ts), 3))
            inc[1:] = np.cumsum(gyro[:-1] * dts[:, None], axis=0)
            col_rot = np.stack([
                np.interp(col_ts, imu_ts, inc[:, k]) for k in range(3)],
                axis=1)
            base = col_rot[max(len(col_rot) // 2, 0)]
            for c in range(s.w):
                s.pose[c] = self._last_pose @ se3_exp(
                    np.concatenate([np.zeros(3), col_rot[c] - base]))

    def set_last_pose(self, ts: int, pose: np.ndarray) -> None:
        self._last_ts = int(ts)
        self._last_pose = np.asarray(pose).reshape(4, 4).copy()


def make_deskew_method(name: str,
                       infos: Optional[List[SensorInfo]] = None
                       ) -> DeskewMethod:
    """Factory (ref: deskew_method.h:203 DeskewMethodFactory)."""
    name = (name or "none").lower()
    if name in ("none", "off"):
        return NoneDeskewMethod()
    if name in ("constant_velocity", "default"):
        return ConstantVelocityDeskewMethod()
    if name in ("imu", "inertial", "inertial_integration"):
        return InertialIntegrationImuDeskewMethod(infos or [])
    raise ValueError(f"unknown deskew method {name!r}")


class DeskewMethodFactory:
    """Named-method factory (ref: deskew_method.h:203
    DeskewMethodFactory::create)."""

    @staticmethod
    def create(name: str, **kwargs) -> DeskewMethod:
        return make_deskew_method(name, **kwargs)
