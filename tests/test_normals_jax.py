"""Device normals (ops/normals_jax.py) vs the host implementation.

The host implementation is itself proven equal to the reference's
compiled normals.cpp (tests/test_normals_conformance.py), so agreement
here chains to the reference. Two tiers:

- algorithm identity: under jax.enable_x64(True) the device program
  runs the same f64 math and must match the host to ~1e-9 everywhere
  except exact neighbor-selection ties (synthetic box scenes have
  perfectly symmetric candidates whose d^2 rounds differently under
  XLA's reduction order than numpy's einsum; the flips stay < 1e-4 in
  the normal and < 0.1% of pixels);
- f32 fidelity: at the TPU's native precision, normals agree to a tight
  angular tolerance except for a tiny boundary population whose
  neighbor/case decisions legitimately flip at f32 rounding.
"""

import math
import os

import numpy as np
import pytest

from ouster_sdk_tpu.ops.normals import normals
from ouster_sdk_tpu.ops.normals_jax import normals_jax

REF = "/root/reference"
OSF = os.path.join(REF, "tests/osfs/single_scan_016.osf")


def _synth_scene(h=64, w=256, dual=False, seed=3):
    """Ray-cast a box room: smooth walls (representative content) with
    a sprinkling of dropouts."""
    rng = np.random.default_rng(seed)
    alt = np.deg2rad(np.linspace(20, -20, h))[:, None]
    az = (2 * np.pi * np.arange(w) / w)[None, :]
    d = np.stack([np.cos(alt) * np.cos(az),
                  np.cos(alt) * np.sin(az),
                  np.broadcast_to(np.sin(alt), (h, w))], axis=-1)
    # distance to an axis-aligned box [-6,6]x[-8,8]x[-2,3]
    t = np.full((h, w), np.inf)
    for axis, (lo, hi) in enumerate([(-6, 6), (-8, 8), (-2, 3)]):
        for bound in (lo, hi):
            denom = d[..., axis]
            with np.errstate(divide="ignore", invalid="ignore"):
                tc = bound / denom
            tc = np.where((tc > 0.1) & np.isfinite(tc), tc, np.inf)
            t = np.minimum(t, tc)
    t = np.where(np.isfinite(t), t, 0.0)
    drop = rng.random((h, w)) < 0.03
    t = np.where(drop, 0.0, t)
    # mm-scale jitter kills the box's perfectly symmetric neighbor
    # candidates (exact d^2 ties break differently under XLA's
    # reduction rounding than numpy's — a tie is not a defect, but it
    # would mask real algorithm divergence in the identity test)
    jitter = rng.integers(0, 127, (h, w)) * 0.001
    t = np.where(t > 0, t + jitter, 0.0)
    rng_mm = np.round(t * 1000).astype(np.uint32)
    xyz = d * (rng_mm[..., None] * 0.001)
    if not dual:
        return rng_mm, xyz, None, None
    t2 = np.where(rng_mm > 0, t + 0.4, 0.0)
    drop2 = rng.random((h, w)) < 0.5
    t2 = np.where(drop2, 0.0, t2)
    rng2_mm = np.round(t2 * 1000).astype(np.uint32)
    xyz2 = d * (rng2_mm[..., None] * 0.001)
    return rng_mm, xyz, rng2_mm, xyz2


def _angular_compare(host, dev, tol_deg, max_flip_frac):
    host = np.asarray(host)
    dev = np.asarray(dev, np.float64)
    hn = np.linalg.norm(host, axis=-1)
    dn = np.linalg.norm(dev, axis=-1)
    # zero/nonzero classification must agree except for boundary flips
    both = (hn > 0.5) & (dn > 0.5)
    either = (hn > 0.5) | (dn > 0.5)
    dot = np.clip(np.sum(host * dev, axis=-1)
                  / np.maximum(hn * dn, 1e-300), -1, 1)
    ang = np.degrees(np.arccos(dot))
    agree = both & (ang < tol_deg)
    n_either = max(int(either.sum()), 1)
    flip_frac = 1.0 - agree.sum() / n_either
    assert flip_frac <= max_flip_frac, \
        f"{flip_frac:.4%} of pixels disagree (> {max_flip_frac:.2%}); " \
        f"max angle among both-valid: {ang[both].max() if both.any() else 0}"



def _assert_x64_identity(host, dev, max_tie_frac=0.001):
    """Agreement to 1e-9 on > 99.9% of pixels. No cap on the residual
    population: those are exact d^2 ties (verified by hand: equal
    neighbor ranges at symmetric offsets), and a tie may legitimately
    resolve to a different neighbor/case with an arbitrarily different
    normal."""
    d = np.linalg.norm(np.asarray(host) - np.asarray(dev), axis=-1)
    frac = float((d > 1e-9).mean())
    assert frac <= max_tie_frac, \
        f"{frac:.5%} of pixels differ > 1e-9 (max {d.max()})"

def test_x64_matches_host_exactly_single():
    import jax

    rng_mm, xyz, _, _ = _synth_scene()
    origins = np.zeros((rng_mm.shape[1], 3))
    host, _ = normals(xyz, rng_mm, origins)
    with jax.enable_x64(True):
        dev, dev2 = normals_jax(xyz, rng_mm, origins)
        dev = np.asarray(dev)
    assert dev2 is None
    _assert_x64_identity(host, dev)


def test_x64_matches_host_exactly_dual():
    import jax

    rng_mm, xyz, rng2_mm, xyz2 = _synth_scene(dual=True)
    origins = np.zeros((rng_mm.shape[1], 3))
    h1, h2 = normals(xyz, rng_mm, origins, xyz2, rng2_mm)
    with jax.enable_x64(True):
        d1, d2 = normals_jax(xyz, rng_mm, origins, xyz2, rng2_mm)
        d1, d2 = np.asarray(d1), np.asarray(d2)
    _assert_x64_identity(h1, d1)
    _assert_x64_identity(h2, d2)


def test_x64_matches_host_search_range_3():
    import jax

    rng_mm, xyz, _, _ = _synth_scene(seed=9)
    origins = np.zeros((rng_mm.shape[1], 3))
    host, _ = normals(xyz, rng_mm, origins, pixel_search_range=3)
    with jax.enable_x64(True):
        dev, _ = normals_jax(xyz, rng_mm, origins, pixel_search_range=3)
    _assert_x64_identity(host, dev)


def test_f32_fidelity_synthetic():
    rng_mm, xyz, _, _ = _synth_scene()
    origins = np.zeros((rng_mm.shape[1], 3))
    host, _ = normals(xyz, rng_mm, origins)
    dev, _ = normals_jax(xyz, rng_mm, origins)
    # the synthetic box has symmetric exact-tie candidates: allow
    # a slightly larger flip population than the real fixture
    _angular_compare(host, dev, tol_deg=0.5, max_flip_frac=0.03)


def test_f32_fidelity_reference_fixture():
    if not os.path.exists(OSF):
        pytest.skip("fixture missing")
    from ouster_sdk_tpu import ChanField
    from ouster_sdk_tpu.io.sources import open_source
    from ouster_sdk_tpu.ops.destagger import destagger
    from ouster_sdk_tpu.ops.xyzlut import make_xyz_lut

    src = open_source(OSF)
    scan = list(src)[0].valid()[0]
    info = src.sensor_info[0]
    lut = make_xyz_lut(info)
    rng_d = np.ascontiguousarray(destagger(info, scan.field(ChanField.RANGE)),
                                 np.uint32)
    xyz_d = destagger(info, lut(scan.field(ChanField.RANGE)))
    origins = np.zeros((rng_d.shape[1], 3))
    host, _ = normals(xyz_d, rng_d, origins)
    dev, _ = normals_jax(xyz_d, rng_d, origins)
    _angular_compare(host, dev, tol_deg=0.2, max_flip_frac=0.02)


def test_empty_and_validation():
    rng_mm = np.zeros((8, 16), np.uint32)
    xyz = np.zeros((8, 16, 3))
    origins = np.zeros((16, 3))
    dev, _ = normals_jax(xyz, rng_mm, origins)
    assert np.all(np.asarray(dev) == 0)
    with pytest.raises(ValueError):
        normals_jax(xyz, rng_mm, origins, target_distance_m=0)
    with pytest.raises(ValueError):
        normals_jax(xyz, rng_mm, origins, min_angle_of_incidence_rad=0)
    with pytest.raises(ValueError):
        normals_jax(xyz, rng_mm, np.zeros((7, 3)))


def test_scan_normals_jax_backend():
    """scan_normals(backend='jax') writes the same NORMALS fields as the
    numpy backend up to f32 decision flips; the CLI stage accepts
    --backend jax."""
    from ouster_sdk_tpu import ChanField, PacketWriter, ScanBatcher, LidarScan
    from ouster_sdk_tpu.core.metadata import default_sensor_info
    from ouster_sdk_tpu import LidarMode
    from ouster_sdk_tpu.ops.normals import scan_normals

    info = default_sensor_info(LidarMode(512, 10))
    pw = PacketWriter(info.format)
    b = ScanBatcher(info)
    scan = LidarScan(info)
    rng = np.random.default_rng(5)
    w, cpp, h = info.format.columns_per_frame, \
        info.format.columns_per_packet, info.format.pixels_per_column
    for p in range(w // cpp):
        buf = pw.new_packet()
        pw.set_packet_header(buf, init_id=info.init_id, prod_sn=info.sn)
        pw.set_frame_id(buf, 1)
        m0 = p * cpp
        pw.set_col_headers(
            buf, np.arange(cpp, dtype=np.uint64) + m0 * 1000,
            np.arange(cpp, dtype=np.uint16) + m0,
            np.ones(cpp, dtype=np.uint32))
        pw.set_field(buf, ChanField.RANGE,
                     rng.integers(2000, 40000, size=(h, cpp)))
        from ouster_sdk_tpu.core.packets import LidarPacket

        b(LidarPacket(buf.tobytes()), scan)
    import copy

    s_np = copy.deepcopy(scan)
    s_jx = copy.deepcopy(scan)
    scan_normals(s_np, backend="numpy")
    scan_normals(s_jx, backend="jax")
    _angular_compare(s_np.field(ChanField.NORMALS),
                     s_jx.field(ChanField.NORMALS),
                     tol_deg=0.5, max_flip_frac=0.05)
    with pytest.raises(ValueError):
        scan_normals(copy.deepcopy(scan), backend="bogus")
