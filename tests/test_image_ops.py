"""Tests for AutoExposure, BeamUniformityCorrector, voxel_downsample,
normals (ref: test strategy SURVEY.md §4; reference
python/tests/test_data.py AE tests + downsample/normals C++ tests)."""

import numpy as np
import pytest

from ouster_sdk_tpu.ops.downsample import voxel_downsample, \
    voxel_downsample_jax
from ouster_sdk_tpu.ops.image_processing import (
    AutoExposure,
    BeamUniformityCorrector,
)
from ouster_sdk_tpu.ops.normals import normals


def test_autoexposure_stretches_to_unit_range():
    rng = np.random.default_rng(0)
    img = rng.uniform(100, 200, size=(64, 512)).astype(np.float64)
    ae = AutoExposure()
    ae(img)
    assert img.min() >= 0.0 and img.max() <= 1.0
    # bulk of the data spread across the range
    assert img.max() - img.min() > 0.5


def test_autoexposure_ignores_zeros_and_is_damped():
    rng = np.random.default_rng(1)
    img = rng.uniform(10, 20, size=(64, 512))
    img[:, ::3] = 0.0  # dropped columns must not drag lo percentile to 0
    ae = AutoExposure()
    ae(img.copy())
    lo1, hi1 = ae.lo_state, ae.hi_state
    assert lo1 >= 10.0  # percentile from nonzero values only
    # feed a brighter frame: damped state moves only slightly
    img2 = rng.uniform(100, 200, size=(64, 512))
    ae.counter = 0
    ae(img2.copy())
    assert ae.lo_state < 40  # 0.9 damping keeps state near old value


def test_autoexposure_few_points_noop():
    img = np.zeros((16, 16))
    img[0, 0] = 5.0
    ae = AutoExposure()
    out = ae(img.copy())
    np.testing.assert_array_equal(out, img)  # too few nonzero -> untouched


def test_autoexposure_occluded_frame_freezes_state():
    """An initialized AE that hits a sampling frame with too few nonzero
    points must leave the frame RAW and freeze lo/hi state + counter
    (ref: image_processing.cpp:88-90 unconditional early return)."""
    rng = np.random.default_rng(7)
    ae = AutoExposure()
    for _ in range(3):   # update_every=3 -> counter wraps back to 0
        ae(rng.uniform(50, 150, size=(32, 64)))
    lo, hi, counter = ae.lo_state, ae.hi_state, ae.counter
    assert counter == 0  # next frame is a sampling frame
    occluded = np.zeros((32, 64))
    occluded[0, :10] = 5.0   # < AE_MIN_NONZERO_POINTS after stride
    out = ae(occluded.copy())
    np.testing.assert_array_equal(out, occluded)     # untouched
    assert (ae.lo_state, ae.hi_state, ae.counter) == (lo, hi, counter)


def test_beam_uniformity_removes_row_bias():
    rng = np.random.default_rng(2)
    base = rng.uniform(100, 110, size=(1, 256)).repeat(32, axis=0)
    bias = np.linspace(0, 40, 32)[:, None] * 0 + \
        rng.uniform(0, 30, size=(32, 1))
    img = (base + bias).astype(np.float64)
    buc = BeamUniformityCorrector()
    out = buc(img.copy())
    # row means should be nearly equal after correction
    # correction removes the non-linear bias component (the reference
    # detrends the dark count, so a linear-in-row residual remains)
    row_means = out.mean(axis=1)
    assert row_means.std() < bias.std() * 0.5


def test_voxel_downsample_centroids():
    pts = np.array([
        [0.1, 0.1, 0.1], [0.2, 0.2, 0.2],   # voxel (0,0,0)
        [1.5, 0.0, 0.0],                     # voxel (1,0,0)
        [-0.5, 0.0, 0.0],                    # voxel (-1,0,0)
    ])
    cent, _ = voxel_downsample(pts, 1.0)
    assert cent.shape == (3, 3)
    sums = {tuple(np.round(c, 3)) for c in cent}
    assert (0.15, 0.15, 0.15) in sums
    # min_pts threshold
    cent2, _ = voxel_downsample(pts, 1.0, min_pts_per_voxel=2)
    assert cent2.shape == (1, 3)
    np.testing.assert_allclose(cent2[0], [0.15, 0.15, 0.15])


def test_voxel_downsample_attribs():
    pts = np.array([[0.1, 0, 0], [0.3, 0, 0], [5.0, 0, 0]])
    refl = np.array([10.0, 30.0, 100.0])
    cent, (r_out,) = voxel_downsample(pts, 1.0, attribs=[refl])
    assert cent.shape[0] == 2
    assert set(np.round(r_out, 3)) == {20.0, 100.0}


def test_voxel_downsample_jax_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    pts = rng.uniform(-10, 10, size=(500, 3)).astype(np.float32)
    cent_np, _ = voxel_downsample(pts, 1.0)
    cent_j, mask = voxel_downsample_jax(jnp.asarray(pts), 1.0, capacity=1024)
    cent_j = np.asarray(cent_j)[np.asarray(mask)]
    assert cent_j.shape == cent_np.shape
    # same voxel set -> same centroids (sorted lexicographic, f32 tolerance)
    def key(a):
        return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]

    np.testing.assert_allclose(key(cent_j), key(cent_np.astype(np.float32)),
                               atol=1e-4)


def test_voxel_downsample_jax_far_coordinates():
    """Cell indices beyond +/-2^14 must not collide (the old packed-int32
    key overflowed at ~1.6 km with 0.1 m voxels)."""
    import jax.numpy as jnp

    pts = np.array([[0.05, 1700.0, 0.0],      # iy = 17000
                    [1.05, -1576.85, 0.0],    # old packing collided these
                    [0.05, 1700.05, 0.0]], np.float32)
    cent, mask = voxel_downsample_jax(jnp.asarray(pts), 0.1, capacity=16)
    cent = np.asarray(cent)[np.asarray(mask)]
    assert cent.shape[0] == 2                 # two distinct voxels
    cent_np, _ = voxel_downsample(pts, 0.1)
    def key(a):
        return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]
    np.testing.assert_allclose(key(cent), key(cent_np.astype(np.float32)),
                               atol=1e-3)


def test_voxel_downsample_jax_capacity_overflow_drops():
    """Voxels beyond the static capacity are dropped, not merged into the
    last slot as a phantom centroid."""
    import jax.numpy as jnp

    # 32 distinct voxels along x, capacity 8
    pts = np.stack([np.arange(32) * 2.0, np.zeros(32), np.zeros(32)],
                   axis=1).astype(np.float32)
    cent, mask = voxel_downsample_jax(jnp.asarray(pts), 1.0, capacity=8)
    cent = np.asarray(cent)[np.asarray(mask)]
    assert cent.shape[0] == 8
    # every surviving centroid is a real input point, not a mean of many
    for c in cent:
        assert np.min(np.linalg.norm(pts - c, axis=1)) < 1e-5


def test_voxel_downsample_rejects_nonpositive_size():
    pts = np.zeros((4, 3))
    with pytest.raises(ValueError):
        voxel_downsample(pts, 0.0)
    with pytest.raises(ValueError):
        voxel_downsample(pts, -1.0)
    import jax.numpy as jnp
    with pytest.raises(ValueError):
        voxel_downsample_jax(jnp.zeros((4, 3)), 0.0, capacity=8)


def test_normals_flat_wall():
    """Points on the x=5 plane -> normals along -x (toward the sensor)."""
    h, w = 32, 64
    ys = np.linspace(-2, 2, w)
    zs = np.linspace(-1, 1, h)
    xyz = np.zeros((h, w, 3))
    xyz[..., 0] = 5.0
    xyz[..., 1] = ys[None, :]
    xyz[..., 2] = zs[:, None]
    rng_img = np.full((h, w), 5000, dtype=np.uint32)
    origins = np.zeros((w, 3))
    n, _ = normals(xyz, rng_img, origins, pixel_search_range=2,
                   target_distance_m=0.2)
    interior = n[4:-4, 4:-4]
    # unit length
    mags = np.linalg.norm(interior, axis=-1)
    assert np.allclose(mags, 1.0, atol=1e-6)
    # aligned with +-x
    assert np.all(np.abs(interior[..., 0]) > 0.99)


def test_normals_zero_range_pixels():
    h, w = 16, 32
    xyz = np.random.default_rng(0).normal(size=(h, w, 3))
    rng_img = np.zeros((h, w), dtype=np.uint32)
    origins = np.zeros((w, 3))
    n, _ = normals(xyz, rng_img, origins)
    assert not n.any()
