"""Device (JAX) surface normals — the TPU twin of ops/normals.py.

Same algorithm as the host implementation (itself proven equal to the
reference's compiled normals.cpp to 6e-14, see ops/normals.py and
tests/test_normals_conformance.py; ref: ouster_client/src/
normals.cpp:30-500): per-pixel best vertical/horizontal neighbor search
with AOI gating, thin-foreground detection, and the four-case normal
assembly. Everything is static-shape shift/where/reduce work — ideal
VPU material that XLA fuses into a handful of passes — so the whole
computation jits into one device program (including the vertical-subtent
probe, vectorized from the reference's first-usable-column scan into an
argmin over a per-column preference score).

Precision: the math runs in the ambient JAX precision — float32 on TPU
(unit normals good to ~1e-6; a small boundary population can flip
case/neighbor decisions vs the f64 host path), float64 under
`jax.enable_x64(True)` where it matches the host implementation
to ~1e-12 (tests/test_normals_jax.py proves both).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .normals import (
    DEFAULT_MIN_ANGLE_INCIDENCE_RAD,
    DEFAULT_TARGET_DISTANCE_METER,
    FOREGROUND_SALIENCE_MM,
    _axis_candidates,
)


def _shifted_jnp(arr: jnp.ndarray, dr: int, dc: int, wrap_cols: bool
                 ) -> jnp.ndarray:
    """arr[(u+dr, v+dc)] with vertical edge zero-fill and horizontal
    wrap (or edge fill when wrap_cols is False) — ops/normals._shifted
    semantics on device."""
    out = arr
    extra = (None,) * (arr.ndim - 2)  # broadcast masks over trailing dims
    if dc:
        out = jnp.roll(out, -dc, axis=1)
        if not wrap_cols:
            w = arr.shape[1]
            cols = jnp.arange(w)
            mask = (cols >= w - dc) if dc > 0 else (cols < -dc)
            out = jnp.where(mask[(None, slice(None)) + extra], 0, out)
    if dr:
        out = jnp.roll(out, -dr, axis=0)
        h = arr.shape[0]
        rows = jnp.arange(h)
        mask = (rows >= h - dr) if dr > 0 else (rows < -dr)
        out = jnp.where(mask[(slice(None), None) + extra], 0, out)
    return out


def _vertical_subtent_jnp(range_img: jnp.ndarray, beams: jnp.ndarray,
                          dtype) -> jnp.ndarray:
    """Vectorized _compute_vertical_subtent (ref: normals.cpp:29-75):
    the reference walks columns outward from the center (left candidate
    before right at each offset) and takes the first with >= 2 valid
    pixels; expressed here as an argmin over the per-column preference
    score 2*|c-mid| + (c>mid)."""
    h, w = range_img.shape
    validpx = range_img != 0
    rows = jnp.arange(h)[:, None]
    first = jnp.min(jnp.where(validpx, rows, h), axis=0)
    last = jnp.max(jnp.where(validpx, rows, -1), axis=0)
    ok = last > first  # >= 2 valid pixels in the column

    mid = w // 2
    cols = jnp.arange(w)
    pref = 2 * jnp.abs(cols - mid) + (cols > mid)
    c = jnp.argmin(jnp.where(ok, pref, 4 * w))
    b_top = beams[last[c], c]
    b_bot = beams[first[c], c]
    dot = jnp.clip(jnp.sum(b_top * b_bot), -1.0, 1.0)
    span = jnp.maximum(last[c] - first[c], 1).astype(dtype)
    fallback = jnp.asarray((0.5 * math.pi) / max(h - 1, 1), dtype)
    return jnp.where(jnp.any(ok), jnp.arccos(dot) / span, fallback)


def _find_best_neighbors_jnp(axis, xyz, rng, xyz2, rng2, thresh_sq,
                             target_sq, search_range, dtype):
    """Vectorized find_best_neighbor (ref: normals.cpp:170-300) on
    device. Returns (found, diff, flip, thin)."""
    h, w = rng.shape
    inf = jnp.asarray(jnp.inf, dtype)
    best_d_sq = jnp.full((h, w), inf, dtype)
    best_diff = jnp.zeros((h, w, 3), dtype)
    best_flip = jnp.zeros((h, w), bool)
    best_radius = jnp.ones((h, w), dtype)
    thin = jnp.ones((h, w), bool)
    good = jnp.zeros((h, w), bool)
    active = jnp.ones((h, w), bool)

    center_r = rng.astype(jnp.int32)
    returns = [(xyz, rng)]
    if xyz2 is not None and rng2 is not None:
        returns.append((xyz2, rng2))

    for radius in range(1, search_range + 1):
        for dr, dc, flip, wrap in _axis_candidates(axis, radius, h, w):
            for nb_xyz, nb_rng in returns:
                n_r = _shifted_jnp(nb_rng, dr, dc, wrap)
                n_xyz = _shifted_jnp(nb_xyz, dr, dc, wrap)
                valid = (n_r != 0) & active
                diff = n_xyz - xyz
                d_sq = jnp.sum(diff * diff, axis=-1)
                salient = (n_r.astype(jnp.int32) - center_r) < \
                    FOREGROUND_SALIENCE_MM
                thin &= ~(valid & salient)
                err = jnp.abs(d_sq - target_sq)
                better = valid & (err < jnp.abs(best_d_sq - target_sq))
                best_d_sq = jnp.where(better, d_sq, best_d_sq)
                best_diff = jnp.where(better[..., None], diff, best_diff)
                best_flip = jnp.where(better, flip, best_flip)
                best_radius = jnp.where(better, radius, best_radius)

        cap = best_radius * best_radius * thresh_sq
        good |= active & (best_d_sq >= target_sq) & (best_d_sq < cap)
        if radius == search_range:
            good |= active & (best_d_sq > 0) & (best_d_sq < cap)
        active &= ~(good & ~thin)

    found = good & jnp.isfinite(best_d_sq)
    return found, best_diff, best_flip, thin


def _normals_single_jnp(xyz, range_img, origins, xyz2, range2,
                        search_range, min_aoi, target_m, dtype,
                        v_subtent=None, beams=None):
    h, w = range_img.shape
    target_sq = jnp.asarray(target_m * target_m, dtype)
    safe_aoi = max(min_aoi, 1e-6)
    eps = jnp.asarray(np.finfo(dtype).eps, dtype)
    tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)

    if beams is None:
        direction = xyz - origins[None, :, :]
        mag = jnp.linalg.norm(direction, axis=-1, keepdims=True)
        beams = jnp.where(mag > 0, direction / jnp.maximum(mag, tiny), 0.0)

    h_subtent = 2.0 * math.pi / w
    if v_subtent is None:
        v_subtent = _vertical_subtent_jnp(range_img, beams, dtype)

    def thresh_sq(subtent):
        # AOI gating thresholds per pixel (ref: normals.cpp:152-163)
        perimeter = 2.0 * math.pi * (range_img.astype(dtype) * 0.001)
        px_res = (2.0 * math.pi) / subtent
        min_spacing = perimeter / px_res
        t = min_spacing / math.tan(safe_aoi)
        return t * t

    v_found, v_diff, v_flip, v_thin = _find_best_neighbors_jnp(
        "v", xyz, range_img, xyz2, range2, thresh_sq(v_subtent),
        target_sq, search_range, dtype)
    h_found, h_diff, h_flip, h_thin = _find_best_neighbors_jnp(
        "h", xyz, range_img, xyz2, range2, thresh_sq(h_subtent),
        target_sq, search_range, dtype)

    valid = (range_img != 0) & (jnp.sum(beams * beams, axis=-1) > eps)
    out = jnp.zeros((h, w, 3), dtype)

    thin_both = v_thin & h_thin
    case_a = valid & ((~v_found & ~h_found) | thin_both)
    out = jnp.where(case_a[..., None], -beams, out)

    def project_perp(out, diff, mask):
        denom = jnp.sum(diff * diff, axis=-1)
        ok = mask & (jnp.abs(denom) > eps)
        dot = jnp.sum(diff * beams, axis=-1)
        proj = beams - (dot / jnp.maximum(denom, tiny))[..., None] * diff
        n_sq = jnp.sum(proj * proj, axis=-1)
        ok &= jnp.abs(n_sq) > eps
        unit = -proj / jnp.maximum(jnp.sqrt(n_sq), tiny)[..., None]
        return jnp.where(ok[..., None], unit, out)

    case_b_v = valid & ~case_a & v_found & (~h_found | h_thin)
    out = project_perp(out, v_diff, case_b_v)
    case_b_h = valid & ~case_a & h_found & (~v_found | v_thin) & ~case_b_v
    out = project_perp(out, h_diff, case_b_h)

    case_c = valid & ~case_a & ~case_b_v & ~case_b_h & v_found & h_found
    vd = jnp.where((h_flip != v_flip)[..., None], -v_diff, v_diff)
    n = jnp.cross(vd, h_diff)
    mag_n = jnp.linalg.norm(n, axis=-1, keepdims=True)
    ok_c = case_c & (mag_n[..., 0] != 0)
    out = jnp.where(ok_c[..., None],
                    n / jnp.maximum(mag_n, tiny), out)
    return out


@functools.partial(jax.jit, static_argnames=(
    "pixel_search_range", "min_angle_of_incidence_rad",
    "target_distance_m", "dual"))
def _normals_jax_impl(xyz, range_img, origins, xyz2, range2,
                      pixel_search_range, min_angle_of_incidence_rad,
                      target_distance_m, dual):
    dtype = xyz.dtype
    tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)
    if dual:
        # the dual overload shares the first return's beams + vertical
        # subtent with BOTH passes (ref: normals.cpp:480-536)
        dir1 = xyz - origins[None, :, :]
        mag1 = jnp.linalg.norm(dir1, axis=-1, keepdims=True)
        beams1 = jnp.where(mag1 > 0, dir1 / jnp.maximum(mag1, tiny), 0.0)
        v_subtent = _vertical_subtent_jnp(range_img, beams1, dtype)
        out1 = _normals_single_jnp(
            xyz, range_img, origins, xyz2, range2, pixel_search_range,
            min_angle_of_incidence_rad, target_distance_m, dtype,
            v_subtent=v_subtent, beams=beams1)
        out2 = _normals_single_jnp(
            xyz2, range2, origins, xyz, range_img, pixel_search_range,
            min_angle_of_incidence_rad, target_distance_m, dtype,
            v_subtent=v_subtent)
        return out1, out2
    out1 = _normals_single_jnp(
        xyz, range_img, origins, None, None, pixel_search_range,
        min_angle_of_incidence_rad, target_distance_m, dtype)
    return out1, None


def normals_jax(
    xyz,
    range_img,
    sensor_origins_xyz,
    xyz2=None,
    range2=None,
    pixel_search_range: int = 1,
    min_angle_of_incidence_rad: float = DEFAULT_MIN_ANGLE_INCIDENCE_RAD,
    target_distance_m: float = DEFAULT_TARGET_DISTANCE_METER,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Device twin of ops/normals.normals: same signature, returns
    ((H, W, 3) normals, second-return normals | None) as device arrays.
    One jitted program per (shape, search range, dual) combination."""
    if target_distance_m <= 0:
        raise ValueError("normals: target_distance_m must be positive")
    if min_angle_of_incidence_rad <= 0:
        raise ValueError(
            "normals: min_angle_of_incidence_rad must be positive")
    ftype = jnp.zeros(0).dtype  # f64 under enable_x64, else f32
    h, w = np.shape(range_img)
    xyz = jnp.asarray(xyz, ftype).reshape(h, w, 3)
    range_img = jnp.asarray(range_img, jnp.uint32)
    origins = jnp.asarray(sensor_origins_xyz, ftype)
    if origins.shape[0] != w:
        raise ValueError(
            "normals: sensor_origins size must match image width")
    dual = xyz2 is not None and range2 is not None
    if dual:
        xyz2 = jnp.asarray(xyz2, ftype).reshape(h, w, 3)
        range2 = jnp.asarray(range2, jnp.uint32)
    else:
        xyz2 = range2 = None
    return _normals_jax_impl(xyz, range_img, origins, xyz2, range2,
                             int(pixel_search_range),
                             float(min_angle_of_incidence_rad),
                             float(target_distance_m), dual)
