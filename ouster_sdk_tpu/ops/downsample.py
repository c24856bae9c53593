"""Voxel downsampling: centroid (not center) per occupied voxel.

Rebuild of the reference voxel_downsample (ref: ouster_client/include/
ouster/downsample.h:11-60, impl/downsample_impl.h — robin-map accumulation
of per-voxel point/attribute means with a min_pts_per_voxel threshold).

Two paths:
  - voxel_downsample: host numpy via sort+reduceat (exact reference
    semantics, variable output size)
  - voxel_downsample_jax: device path with static capacity — sort-based
    segment means padded to `capacity`, usable inside jit for the SLAM
    pipeline.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def pack_voxel_coords(idx: np.ndarray) -> np.ndarray:
    """Pack (..., 3) int64 voxel coords into one int64 key — 21 bits per
    signed axis, so +-2^20 voxels from the origin (e.g. ~52 km at
    0.05 m voxels); coordinates beyond that wrap silently. Single
    source of truth for the packing (VoxelHashMap shares it)."""
    off = np.int64(1 << 20)
    return ((idx[..., 0] + off) << 42) | ((idx[..., 1] + off) << 21) | \
        (idx[..., 2] + off)


def _voxel_keys_np(points: np.ndarray, voxel_size: np.ndarray) -> np.ndarray:
    return pack_voxel_coords(np.floor(points / voxel_size).astype(np.int64))


def voxel_downsample_first(points: np.ndarray,
                           voxel_size: float) -> np.ndarray:
    """First-point-per-voxel downsample — kiss-icp's VoxelDownsample
    semantics (ref: thirdparty/kiss-icp/cpp/kiss_icp/core/VoxelUtils.cpp:
    `if (!grid.contains(voxel)) grid.insert({voxel, point})`). The SDK's
    own voxel_downsample (downsample.h) keeps CENTROIDS; KISS-ICP keeps
    the first point inserted, so both live side by side. Output order is
    first-occurrence order (the reference's robin_map iteration order is
    unspecified)."""
    points = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    if points.size == 0:
        return points.reshape(0, 3)
    vs = np.broadcast_to(np.float64(voxel_size), (3,))
    keys = _voxel_keys_np(points, vs)
    _, first_idx = np.unique(keys, return_index=True)
    return points[np.sort(first_idx)]


def voxel_downsample(
    points: np.ndarray,
    voxel_size: Union[float, Sequence[float]],
    attribs: Optional[List[np.ndarray]] = None,
    min_pts_per_voxel: int = 1,
) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Centroid-of-voxel downsample (ref: downsample.h:11-60).

    points: (N, 3); attribs: optional list of (N, ...) arrays averaged per
    voxel. Returns (centroids (M, 3), [attrib means]).
    """
    points = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    vs = np.broadcast_to(np.asarray(voxel_size, dtype=np.float64), (3,))
    if np.any(vs <= 0):
        # ref: downsample.h throws invalid_argument for non-positive sizes
        raise ValueError("voxel size is zero or negative")
    if points.size == 0:
        return points.reshape(0, 3), [
            a[:0] for a in (attribs or [])]

    keys = _voxel_keys_np(points, vs)
    order = np.argsort(keys, kind="stable")
    keys_s = keys[order]
    boundaries = np.flatnonzero(np.diff(keys_s)) + 1
    starts = np.concatenate([[0], boundaries])
    counts = np.diff(np.concatenate([starts, [keys_s.size]]))

    sums = np.add.reduceat(points[order], starts, axis=0)
    keep = counts >= min_pts_per_voxel
    centroids = sums[keep] / counts[keep, None]

    out_attribs: List[np.ndarray] = []
    for a in attribs or []:
        a = np.asarray(a)
        a_s = a[order].astype(np.float64)
        a_sums = np.add.reduceat(a_s, starts, axis=0)
        denom = counts[keep].reshape((-1,) + (1,) * (a.ndim - 1))
        out_attribs.append((a_sums[keep] / denom).astype(a.dtype
                           if np.issubdtype(a.dtype, np.floating)
                           else np.float64))
    return centroids, out_attribs


def voxel_downsample_jax(
    points: jnp.ndarray,
    voxel_size: float,
    capacity: int,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device voxel downsample with a static output capacity.

    points: (N, 3) f32 (invalid rows masked via `valid`). Returns
    (centroids (capacity, 3), mask (capacity,)) — unused slots are zero with
    mask False. Deterministic, jit/vmap-safe: sort by voxel key +
    segment-mean.
    """
    if voxel_size <= 0:
        # ref: downsample.h throws invalid_argument for non-positive sizes
        raise ValueError("voxel size is zero or negative")
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)

    # three unpacked int32 keys (avoids int64, which jax disables by
    # default, without any cell-coordinate range limit); lexsort groups
    # equal voxels together, invalid points sort last
    idx = jnp.floor(points / voxel_size).astype(jnp.int32)
    big = jnp.int32(2**30)
    kx = jnp.where(valid, idx[:, 0], big)
    ky = jnp.where(valid, idx[:, 1], big)
    kz = jnp.where(valid, idx[:, 2], big)

    order = jnp.lexsort((kz, ky, kx))
    kx_s, ky_s, kz_s = kx[order], ky[order], kz[order]
    pts_s = points[order]
    valid_s = valid[order]

    # segment ids: positions where any key changes
    new_seg = jnp.concatenate([
        jnp.ones((1,), bool),
        (kx_s[1:] != kx_s[:-1]) | (ky_s[1:] != ky_s[:-1])
        | (kz_s[1:] != kz_s[:-1])])
    seg_id = jnp.cumsum(new_seg) - 1  # 0..n_segments-1
    # voxels beyond capacity are DROPPED into an overflow slot (sliced off
    # below) rather than corrupting the last real voxel's centroid
    seg_id = jnp.where(seg_id >= capacity, capacity, seg_id)

    w = valid_s.astype(points.dtype)
    sums = jax.ops.segment_sum(pts_s * w[:, None], seg_id,
                               num_segments=capacity + 1)[:capacity]
    counts = jax.ops.segment_sum(w, seg_id,
                                 num_segments=capacity + 1)[:capacity]
    mask = counts > 0
    centroids = jnp.where(mask[:, None], sums / jnp.maximum(counts, 1)[:, None],
                          0.0)
    return centroids, mask
