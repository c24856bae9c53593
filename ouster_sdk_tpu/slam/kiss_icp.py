"""KISS-ICP odometry: voxel map + adaptive threshold + robust point-to-point
ICP.

Rebuild of the reference's vendored kiss-icp pipeline
(ref: ouster_mapping/src/kiss_icp.{h,cpp}:17-69, thirdparty/kiss-icp/cpp/
kiss_icp/core/{Registration,Threshold,VoxelHashMap}.cpp). Differences from
the reference are intentional and noted:
  - nearest neighbors come from a cKDTree rebuilt per frame instead of the
    27-voxel-neighborhood scan (equal or better associations; the TPU-side
    fixed-capacity grid-hash path lives in ops/downsample.py and
    slam/registration_jax.py as it matures)
  - math in numpy float64 like the reference's Eigen doubles
  - voxelize() keeps per-voxel CENTROIDS (ops/downsample.voxel_downsample)
    where the reference VoxelDownsample keeps the first point per voxel;
    centroids are a standard variant with slightly better sampling
    uniformity, at the cost of tiny trajectory differences
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np
from scipy.spatial import cKDTree

from ..ops.downsample import voxel_downsample


@dataclass
class KissConfig:
    """(ref: ouster_mapping/src/kiss_icp.h:18-34)"""

    voxel_size: float = 1.0
    max_range: float = 100.0
    min_range: float = 5.0
    max_points_per_voxel: int = 20
    min_motion_th: float = 0.1
    initial_threshold: float = 2.0
    max_num_iterations: int = 500
    convergence_criterion: float = 1e-4
    deskew: bool = False


def _hat(v: np.ndarray) -> np.ndarray:
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]],
                     [-v[1], v[0], 0]])


def se3_exp(xi: np.ndarray) -> np.ndarray:
    """(rho(3), theta(3)) -> 4x4 (kiss-icp dx layout: translation first)."""
    rho, theta = xi[:3], xi[3:]
    angle = np.linalg.norm(theta)
    K = _hat(theta)
    if angle < 1e-10:
        R = np.eye(3) + K
        V = np.eye(3) + 0.5 * K
    else:
        K2 = K @ K
        s, c = np.sin(angle), np.cos(angle)
        R = np.eye(3) + (s / angle) * K + ((1 - c) / angle**2) * K2
        V = np.eye(3) + ((1 - c) / angle**2) * K \
            + ((angle - s) / angle**3) * K2
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = V @ rho
    return T


class AdaptiveThreshold:
    """(ref: Threshold.cpp)"""

    def __init__(self, initial_threshold: float, min_motion_th: float,
                 max_range: float):
        self._min_motion = min_motion_th
        self._max_range = max_range
        self._model_sse = initial_threshold * initial_threshold
        self._num_samples = 1

    def compute_threshold(self) -> float:
        return float(np.sqrt(self._model_sse / self._num_samples))

    def update_model_deviation(self, deviation: np.ndarray) -> None:
        R = deviation[:3, :3]
        theta = np.arccos(np.clip((np.trace(R) - 1) / 2, -1.0, 1.0))
        delta_rot = 2.0 * self._max_range * np.sin(theta / 2.0)
        delta_trans = np.linalg.norm(deviation[:3, 3])
        model_error = delta_trans + delta_rot
        if model_error > self._min_motion:
            self._model_sse += model_error * model_error
            self._num_samples += 1


class VoxelHashMap:
    """Local map: capped points per voxel, pruned by distance
    (ref: VoxelHashMap.cpp)."""

    def __init__(self, voxel_size: float, max_distance: float,
                 max_points_per_voxel: int):
        self.voxel_size = voxel_size
        self.max_distance = max_distance
        self.max_points_per_voxel = max_points_per_voxel
        self._voxels: Dict[Tuple[int, int, int], np.ndarray] = {}
        self._tree: Optional[cKDTree] = None
        self._tree_pts: Optional[np.ndarray] = None

    def clear(self) -> None:
        self._voxels.clear()
        self._tree = None

    def empty(self) -> bool:
        return not self._voxels

    def pointcloud(self) -> np.ndarray:
        if not self._voxels:
            return np.zeros((0, 3))
        return np.concatenate(list(self._voxels.values()), axis=0)

    def add_points(self, points: np.ndarray) -> None:
        if points.size == 0:
            return
        keys = np.floor(points / self.voxel_size).astype(np.int64)
        order = np.lexsort((keys[:, 2], keys[:, 1], keys[:, 0]))
        keys_s, pts_s = keys[order], points[order]
        change = np.concatenate([[True], np.any(np.diff(keys_s, axis=0) != 0,
                                                axis=1)])
        starts = np.flatnonzero(change)
        ends = np.concatenate([starts[1:], [keys_s.shape[0]]])
        for s, e in zip(starts, ends):
            key = tuple(keys_s[s])
            existing = self._voxels.get(key)
            cap = self.max_points_per_voxel
            if existing is None:
                self._voxels[key] = pts_s[s:min(e, s + cap)].copy()
            elif existing.shape[0] < cap:
                room = cap - existing.shape[0]
                self._voxels[key] = np.concatenate(
                    [existing, pts_s[s:min(e, s + room)]], axis=0)
        self._tree = None

    def remove_far_points(self, origin: np.ndarray) -> None:
        md2 = self.max_distance * self.max_distance
        dead = [k for k, pts in self._voxels.items()
                if np.sum((pts[0] - origin) ** 2) > md2]
        for k in dead:
            del self._voxels[k]
        self._tree = None

    def update(self, points: np.ndarray, pose: np.ndarray) -> None:
        """(ref: VoxelHashMap::Update): transform to world, add, prune."""
        world = points @ pose[:3, :3].T + pose[:3, 3]
        self.add_points(world)
        self.remove_far_points(pose[:3, 3])

    def _ensure_tree(self) -> Optional[cKDTree]:
        if self._tree is None and self._voxels:
            self._tree_pts = self.pointcloud()
            self._tree = cKDTree(self._tree_pts)
        return self._tree

    def closest_neighbors(self, points: np.ndarray, max_dist: float
                          ) -> Tuple[np.ndarray, np.ndarray]:
        """Vectorized GetClosestNeighbor: (mask, target_points)."""
        tree = self._ensure_tree()
        if tree is None:
            return np.zeros(len(points), bool), np.zeros_like(points)
        dist, idx = tree.query(points, k=1,
                               distance_upper_bound=max_dist)
        mask = np.isfinite(dist)
        tgt = np.zeros_like(points)
        tgt[mask] = self._tree_pts[idx[mask]]
        return mask, tgt


def register_points_to_map(
    points: np.ndarray, voxel_map: VoxelHashMap, initial_guess: np.ndarray,
    max_correspondence_distance: float, kernel_scale: float,
    max_iterations: int = 500, convergence: float = 1e-4,
) -> np.ndarray:
    """Robust point-to-point GN ICP (ref: Registration.cpp
    AlignPointsToMap)."""
    if voxel_map.empty():
        return initial_guess.copy()

    src = points @ initial_guess[:3, :3].T + initial_guess[:3, 3]
    T_icp = np.eye(4)

    for _ in range(max_iterations):
        mask, tgt = voxel_map.closest_neighbors(
            src, max_correspondence_distance)
        if mask.sum() < 6:
            break
        s = src[mask]
        t = tgt[mask]
        residual = s - t  # (N, 3)
        r2 = np.einsum("nc,nc->n", residual, residual)
        w = (kernel_scale ** 2) / (kernel_scale + r2) ** 2  # GM kernel

        # J_r = [I | -hat(s)]; accumulate JTJ (6,6) and JTr (6,)
        JTJ = np.zeros((6, 6))
        JTr = np.zeros(6)
        # J_r^T r with J_r = [I | -hat(s)]: bottom block is
        # (-hat(s))^T r = hat(s) r = s x r
        wsum = w[:, None] * residual
        JTr[:3] = wsum.sum(axis=0)
        JTr[3:] = np.cross(s, wsum).sum(axis=0)

        W = w.sum()
        hs = _hat_batch(s)
        JTJ[:3, :3] = np.eye(3) * W
        Sx = -np.einsum("n,nij->ij", w, hs)
        JTJ[:3, 3:] = Sx
        JTJ[3:, :3] = Sx.T
        JTJ[3:, 3:] = np.einsum("n,nij,nik->jk", w, hs, hs)

        try:
            dx = np.linalg.solve(JTJ, -JTr)
        except np.linalg.LinAlgError:
            break
        dT = se3_exp(dx)
        src = src @ dT[:3, :3].T + dT[:3, 3]
        T_icp = dT @ T_icp
        if np.linalg.norm(dx) < convergence:
            break

    return T_icp @ initial_guess


def _hat_batch(v: np.ndarray) -> np.ndarray:
    n = v.shape[0]
    out = np.zeros((n, 3, 3))
    out[:, 0, 1] = -v[:, 2]
    out[:, 0, 2] = v[:, 1]
    out[:, 1, 0] = v[:, 2]
    out[:, 1, 2] = -v[:, 0]
    out[:, 2, 0] = -v[:, 1]
    out[:, 2, 1] = v[:, 0]
    return out


class KissICP:
    """(ref: ouster_mapping/src/kiss_icp.cpp:10-62)"""

    def __init__(self, config: Optional[KissConfig] = None):
        self.config = config or KissConfig()
        c = self.config
        self.adaptive_threshold = AdaptiveThreshold(
            c.initial_threshold, c.min_motion_th, c.max_range)
        self.local_map = VoxelHashMap(c.voxel_size, c.max_range,
                                      c.max_points_per_voxel)
        self._frame_count = 0

    def preprocess(self, frame: np.ndarray) -> np.ndarray:
        """Range crop (ref: kiss-icp Preprocessing.cpp)."""
        d = np.linalg.norm(frame, axis=1)
        keep = (d > self.config.min_range) & (d < self.config.max_range)
        return frame[keep]

    def voxelize(self, frame: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(ref: kiss_icp.cpp:50-57): map update at 0.5*voxel, registration
        source at 1.5*voxel."""
        frame_downsample, _ = voxel_downsample(
            frame, self.config.voxel_size * 0.5)
        source, _ = voxel_downsample(frame_downsample,
                                     self.config.voxel_size * 1.5)
        return source, frame_downsample

    def register_frame(self, frame: np.ndarray, initial_guess: np.ndarray,
                       update_map: bool = True) -> np.ndarray:
        """(ref: kiss_icp.cpp:19-48)"""
        source, frame_downsample = self.voxelize(frame)
        sigma = self.adaptive_threshold.compute_threshold()

        new_pose = register_points_to_map(
            source, self.local_map, initial_guess,
            max_correspondence_distance=3.0 * sigma,
            kernel_scale=sigma / 3.0,
            max_iterations=self.config.max_num_iterations,
            convergence=self.config.convergence_criterion)

        deviation = np.linalg.solve(initial_guess, new_pose)
        self.adaptive_threshold.update_model_deviation(deviation)

        if update_map:
            # clear the map on the first frames to drop badly deskewed data
            # (ref: kiss_icp.cpp:39-43)
            if self._frame_count <= 2:
                self.local_map.clear()
            self._frame_count += 1
            self.local_map.update(frame_downsample, new_pose)

        return new_pose
