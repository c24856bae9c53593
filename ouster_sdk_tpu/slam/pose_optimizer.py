"""Offline pose-graph optimization over a trajectory.

Rebuild of the reference PoseOptimizer (ref: ouster_mapping/src/
pose_optimizer.cpp, pose_optimizer_node.h:17, pose_optimizer_constraint.h:
158-505). The reference solves with Ceres LM over quaternion+translation
nodes; here nodes are (rotvec, translation) 6-vectors and the sparse
nonlinear least-squares solve runs through scipy (TRF with analytic
sparsity), with residuals evaluated in vectorized numpy. Constraint types
and semantics match: AbsolutePose, PoseToPose, PointToPoint, AbsolutePoint.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np
from scipy.optimize import least_squares
from scipy.sparse import lil_matrix


def _rotvec_to_R(w: np.ndarray) -> np.ndarray:
    theta = np.linalg.norm(w)
    if theta < 1e-12:
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        return np.eye(3) + K
    k = w / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def _R_to_rotvec(R: np.ndarray) -> np.ndarray:
    cos_t = np.clip((np.trace(R) - 1) / 2, -1, 1)
    theta = np.arccos(cos_t)
    if theta < 1e-12:
        return np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                         R[1, 0] - R[0, 1]]) / 2
    return theta / (2 * np.sin(theta)) * np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])


def _params_to_T(p: np.ndarray) -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = _rotvec_to_R(p[:3])
    T[:3, 3] = p[3:]
    return T


def _T_to_params(T: np.ndarray) -> np.ndarray:
    return np.concatenate([_R_to_rotvec(T[:3, :3]), T[:3, 3]])


@dataclass
class Node:
    """One trajectory knot (ref: pose_optimizer_node.h:17)."""

    ts: int
    pose: np.ndarray  # 4x4
    fixed: bool = False


@dataclass
class AbsolutePoseConstraint:
    """Anchor a node to a world pose (ref: pose_optimizer_constraint.h:241)."""

    ts: int
    target_pose: np.ndarray
    rotation_weight: float = 1.0
    translation_weight: float = 1.0


@dataclass
class PoseToPoseConstraint:
    """Relative transform between two nodes
    (ref: pose_optimizer_constraint.h:298)."""

    ts1: int
    ts2: int
    relative_pose: np.ndarray  # T such that T1 * rel ~= T2
    rotation_weight: float = 1.0
    translation_weight: float = 1.0


@dataclass
class PointToPointConstraint:
    """Pin a point seen at ts1 to a point seen at ts2
    (ref: pose_optimizer_constraint.h:357)."""

    ts1: int
    point1: np.ndarray  # local frame of node 1
    ts2: int
    point2: np.ndarray
    translation_weight: float = 1.0


@dataclass
class AbsolutePointConstraint:
    """Pin a locally-observed point to a world position
    (ref: pose_optimizer_constraint.h:439)."""

    ts: int
    point: np.ndarray
    target: np.ndarray
    translation_weight: float = 1.0


@dataclass
class SolverConfig:
    """(ref: pose_optimizer_constraint.h:505)"""

    max_num_iterations: int = 100
    function_tolerance: float = 1e-8
    gradient_tolerance: float = 1e-10
    parameter_tolerance: float = 1e-10
    loss: str = "huber"  # scipy loss name or "linear"
    loss_scale: float = 1.0


class PoseOptimizer:
    """Pose-graph refinement (ref: pose_optimizer.cpp)."""

    def __init__(self, nodes: Sequence[Node],
                 config: Optional[SolverConfig] = None):
        self.nodes = sorted(nodes, key=lambda n: n.ts)
        self.config = config or SolverConfig()
        self._ts_index = {n.ts: i for i, n in enumerate(self.nodes)}
        self.constraints: List = []

    @classmethod
    def from_trajectory(cls, timestamps: Sequence[int],
                        poses: Sequence[np.ndarray],
                        config: Optional[SolverConfig] = None,
                        fix_first: bool = True) -> "PoseOptimizer":
        nodes = [Node(int(t), np.asarray(p, dtype=np.float64).reshape(4, 4))
                 for t, p in zip(timestamps, poses)]
        if nodes and fix_first:
            nodes[0].fixed = True
        opt = cls(nodes, config)
        # odometry chain constraints from the input trajectory
        for a, b in zip(opt.nodes[:-1], opt.nodes[1:]):
            rel = np.linalg.solve(a.pose, b.pose)
            opt.add_constraint(PoseToPoseConstraint(a.ts, b.ts, rel))
        return opt

    def node_at(self, ts: int) -> Node:
        if ts in self._ts_index:
            return self.nodes[self._ts_index[ts]]
        # closest node (reference snaps to nearest knot)
        idx = int(np.argmin([abs(n.ts - ts) for n in self.nodes]))
        return self.nodes[idx]

    def add_constraint(self, c) -> None:
        self.constraints.append(c)

    # ------------------------------------------------------------------
    def _residuals(self, x: np.ndarray) -> np.ndarray:
        n = len(self.nodes)
        params = x.reshape(n, 6)
        Ts = [(_params_to_T(params[i]) if not self.nodes[i].fixed
               else self.nodes[i].pose) for i in range(n)]
        res: List[np.ndarray] = []
        for c in self.constraints:
            if isinstance(c, AbsolutePoseConstraint):
                i = self._ts_index[self.node_at(c.ts).ts]
                diff = np.linalg.solve(Ts[i], c.target_pose)
                res.append(_R_to_rotvec(diff[:3, :3]) * c.rotation_weight)
                res.append(diff[:3, 3] * c.translation_weight)
            elif isinstance(c, PoseToPoseConstraint):
                i = self._ts_index[self.node_at(c.ts1).ts]
                j = self._ts_index[self.node_at(c.ts2).ts]
                rel = np.linalg.solve(Ts[i], Ts[j])
                diff = np.linalg.solve(c.relative_pose, rel)
                res.append(_R_to_rotvec(diff[:3, :3]) * c.rotation_weight)
                res.append(diff[:3, 3] * c.translation_weight)
            elif isinstance(c, PointToPointConstraint):
                i = self._ts_index[self.node_at(c.ts1).ts]
                j = self._ts_index[self.node_at(c.ts2).ts]
                p1 = Ts[i][:3, :3] @ c.point1 + Ts[i][:3, 3]
                p2 = Ts[j][:3, :3] @ c.point2 + Ts[j][:3, 3]
                res.append((p1 - p2) * c.translation_weight)
            elif isinstance(c, AbsolutePointConstraint):
                i = self._ts_index[self.node_at(c.ts).ts]
                p = Ts[i][:3, :3] @ c.point + Ts[i][:3, 3]
                res.append((p - c.target) * c.translation_weight)
        if not res:
            return np.zeros(1)
        return np.concatenate(res)

    def _jac_sparsity(self) -> lil_matrix:
        n = len(self.nodes)
        rows = 0
        entries: List[Tuple[int, List[int]]] = []
        for c in self.constraints:
            if isinstance(c, AbsolutePoseConstraint):
                i = self._ts_index[self.node_at(c.ts).ts]
                entries.append((6, [i]))
            elif isinstance(c, PoseToPoseConstraint):
                i = self._ts_index[self.node_at(c.ts1).ts]
                j = self._ts_index[self.node_at(c.ts2).ts]
                entries.append((6, [i, j]))
            elif isinstance(c, PointToPointConstraint):
                i = self._ts_index[self.node_at(c.ts1).ts]
                j = self._ts_index[self.node_at(c.ts2).ts]
                entries.append((3, [i, j]))
            elif isinstance(c, AbsolutePointConstraint):
                i = self._ts_index[self.node_at(c.ts).ts]
                entries.append((3, [i]))
        total = sum(r for r, _ in entries) or 1
        S = lil_matrix((total, n * 6), dtype=np.int8)
        row = 0
        for nrows, node_ids in entries:
            for nid in node_ids:
                S[row:row + nrows, nid * 6:(nid + 1) * 6] = 1
            row += nrows
        return S

    def solve(self) -> List[Node]:
        n = len(self.nodes)
        x0 = np.concatenate([_T_to_params(nd.pose) for nd in self.nodes])
        cfg = self.config
        result = least_squares(
            self._residuals, x0,
            jac_sparsity=self._jac_sparsity(),
            method="trf",
            loss=cfg.loss if cfg.loss != "linear" else "linear",
            f_scale=cfg.loss_scale,
            max_nfev=cfg.max_num_iterations * 10,
            ftol=cfg.function_tolerance,
            gtol=cfg.gradient_tolerance,
            xtol=cfg.parameter_tolerance,
        )
        params = result.x.reshape(n, 6)
        for i, nd in enumerate(self.nodes):
            if not nd.fixed:
                nd.pose = _params_to_T(params[i])
        return self.nodes

    # -- exports (ref: slam_util.cpp) -----------------------------------
    def save_trajectory_kitti(self, path: str) -> None:
        with open(path, "w") as f:
            for nd in self.nodes:
                row = nd.pose[:3, :].reshape(-1)
                f.write(" ".join(f"{v:.18e}" for v in row) + "\n")

    def save_trajectory_tum(self, path: str) -> None:
        with open(path, "w") as f:
            for nd in self.nodes:
                t = nd.pose[:3, 3]
                R = nd.pose[:3, :3]
                # rotation matrix -> quaternion (w last per TUM: x y z w)
                qw = np.sqrt(max(0.0, 1 + np.trace(R))) / 2
                if qw > 1e-8:
                    qx = (R[2, 1] - R[1, 2]) / (4 * qw)
                    qy = (R[0, 2] - R[2, 0]) / (4 * qw)
                    qz = (R[1, 0] - R[0, 1]) / (4 * qw)
                else:
                    w = _R_to_rotvec(R)
                    angle = np.linalg.norm(w)
                    axis = w / max(angle, 1e-12)
                    qw = np.cos(angle / 2)
                    qx, qy, qz = axis * np.sin(angle / 2)
                f.write(f"{nd.ts * 1e-9:.9f} {t[0]} {t[1]} {t[2]} "
                        f"{qx} {qy} {qz} {qw}\n")
