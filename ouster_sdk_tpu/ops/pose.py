"""SE(3) pose utilities: dewarp, transform, log/exp, interpolation.

Rebuild of the reference pose machinery (ref: ouster_client/include/ouster/
pose_util.h:44-262, impl/transformation.h). The reference runs OpenMP loops
over columns; here everything is batched linear algebra that XLA maps onto
the vector units, with numpy mirrors for host use.

Conventions match the reference: poses are 4x4 row-major homogeneous
matrices; `dewarp` applies pose[w] to point (i, w) of an (..., W, 3) cloud.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

Array = Union[np.ndarray, jnp.ndarray]


# ---------------------------------------------------------------------------
# numpy host mirrors
# ---------------------------------------------------------------------------

def dewarp_np(points: np.ndarray, poses: np.ndarray) -> np.ndarray:
    """points: (H, W, 3) or (N=H*W, 3); poses: (W, 4, 4) or (W, 16).
    Applies poses[w] to points[..., w, :]
    (ref: pose_util.h:44-67)."""
    poses = poses.reshape(-1, 4, 4)
    w = poses.shape[0]
    shaped = points.reshape(-1, w, 3)
    rot = poses[:, :3, :3]          # (W, 3, 3)
    trans = poses[:, :3, 3]         # (W, 3)
    out = np.einsum("wij,hwj->hwi", rot, shaped) + trans[None]
    return out.reshape(points.shape)


def transform_np(points: np.ndarray, pose: np.ndarray) -> np.ndarray:
    """Single-pose transform (ref: pose_util.h:127-139)."""
    pose = pose.reshape(4, 4)
    return points @ pose[:3, :3].T + pose[:3, 3]


# ---------------------------------------------------------------------------
# jax device path
# ---------------------------------------------------------------------------

@jax.jit
def dewarp(points: jnp.ndarray, poses: jnp.ndarray) -> jnp.ndarray:
    """Device dewarp: points (..., W, 3) x poses (W, 4, 4) -> (..., W, 3)."""
    poses = poses.reshape(-1, 4, 4).astype(points.dtype)
    rot = poses[:, :3, :3]
    trans = poses[:, :3, 3]
    return jnp.einsum("wij,...wj->...wi", rot, points) + trans


@jax.jit
def transform(points: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    pose = pose.reshape(4, 4).astype(points.dtype)
    return points @ pose[:3, :3].T + pose[:3, 3]


# ---------------------------------------------------------------------------
# SO(3)/SE(3) log & exp (ref: impl/transformation.h PoseH/PoseV)
# ---------------------------------------------------------------------------

def _so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) -> (..., 3, 3)."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]  # (...,1,1)
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    K = jnp.stack([
        jnp.stack([zeros, -wz, wy], axis=-1),
        jnp.stack([wz, zeros, -wx], axis=-1),
        jnp.stack([-wy, wx, zeros], axis=-1),
    ], axis=-2)
    eye = jnp.eye(3, dtype=w.dtype)
    t2 = theta * theta
    # stable small-angle series for sin(t)/t and (1-cos t)/t^2
    small = theta < 1e-5
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / jnp.where(
        small, 1.0, theta))
    b = jnp.where(small, 0.5 - t2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, t2))
    return eye + a * K + b * (K @ K)


def _so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3)."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_t = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    vee = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], axis=-1)
    small = theta < 1e-5
    scale = jnp.where(small, 0.5 + theta * theta / 12.0,
                      theta / (2.0 * jnp.sin(jnp.where(small, 1.0, theta))))
    return vee * scale[..., None]


def exp_pose(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) -> SE(3): xi = (..., 6) [rot(3), trans(3)] -> (..., 4, 4)."""
    w, v = xi[..., :3], xi[..., 3:]
    R = _so3_exp(w)
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    K = jnp.stack([
        jnp.stack([zeros, -wz, wy], axis=-1),
        jnp.stack([wz, zeros, -wx], axis=-1),
        jnp.stack([-wy, wx, zeros], axis=-1),
    ], axis=-2)
    t2 = theta * theta
    small = theta < 1e-5
    b = jnp.where(small, 0.5 - t2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, t2))
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (theta - jnp.sin(theta)) / jnp.where(small, 1.0,
                                                       t2 * theta))
    eye = jnp.eye(3, dtype=xi.dtype)
    V = eye + b * K + c * (K @ K)
    t = jnp.einsum("...ij,...j->...i", V, v)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0, 0, 0, 1], dtype=xi.dtype),
        top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def log_pose(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) -> se(3): (..., 4, 4) -> (..., 6) [rot, trans]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = _so3_log(R)
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    K = jnp.stack([
        jnp.stack([zeros, -wz, wy], axis=-1),
        jnp.stack([wz, zeros, -wx], axis=-1),
        jnp.stack([-wy, wx, zeros], axis=-1),
    ], axis=-2)
    t2 = theta * theta
    small = theta < 1e-5
    # V^{-1} = I - K/2 + (1/t^2)(1 - a/(2b)) K^2
    a = jnp.where(small, 1.0 - t2 / 6.0,
                  jnp.sin(theta) / jnp.where(small, 1.0, theta))
    b = jnp.where(small, 0.5 - t2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, t2))
    coef = jnp.where(
        small, 1.0 / 12.0 + t2 / 720.0,
        (1.0 - a / (2.0 * b)) / jnp.where(small, 1.0, t2))
    eye = jnp.eye(3, dtype=T.dtype)
    Vinv = eye - K / 2.0 + coef * (K @ K)
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([w, v], axis=-1)


def interp_pose(t: jnp.ndarray, pose0: jnp.ndarray,
                pose1: jnp.ndarray) -> jnp.ndarray:
    """Geodesic SE(3) interpolation: pose0 * exp(t * log(pose0^-1 pose1))
    (ref: pose_util.h:207-232); t broadcasts, so a (W,) vector of fractions
    yields (W, 4, 4) per-column poses in one shot."""
    rel = jnp.linalg.solve(pose0, pose1)
    xi = log_pose(rel)
    t = jnp.asarray(t, dtype=xi.dtype)
    xi_t = t[..., None] * xi
    return pose0 @ exp_pose(xi_t)


def interp_pose_np(t, pose0: np.ndarray, pose1: np.ndarray) -> np.ndarray:
    return np.asarray(interp_pose(jnp.asarray(t), jnp.asarray(pose0),
                                  jnp.asarray(pose1)))


def interp_trajectory(query_ts: Array, knot_ts: Array,
                      knot_poses: Array, clamp: bool = False
                      ) -> jnp.ndarray:
    """Piecewise-geodesic interpolation of a pose trajectory at query
    timestamps (ref: pose_util.h:262+). Out-of-range queries EXTRAPOLATE
    along the first/last interval like the reference (verified against
    the compiled pose_util oracle); pass clamp=True to pin to the
    endpoints instead."""
    # NOTE: pass timestamps relative to a frame-local epoch — f32 cannot
    # carry absolute nanosecond epochs.
    query_ts = jnp.asarray(query_ts, dtype=jnp.float32)
    knot_ts = jnp.asarray(knot_ts, dtype=query_ts.dtype)
    knot_poses = jnp.asarray(knot_poses)
    n = knot_ts.shape[0]
    idx = jnp.clip(jnp.searchsorted(knot_ts, query_ts, side="right") - 1,
                   0, n - 2)
    t0 = knot_ts[idx]
    t1 = knot_ts[idx + 1]
    frac = (query_ts - t0) / jnp.where(t1 == t0, 1.0, t1 - t0)
    if clamp:
        frac = jnp.clip(frac, 0.0, 1.0)
    return interp_pose(frac, knot_poses[idx], knot_poses[idx + 1])
