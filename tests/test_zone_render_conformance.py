"""Zone render conformance against the reference's own shipped golden
artifacts (ref: tests/zone_render_test.cpp, zrb_test.cpp, mesh_test.cpp,
beam_config_test.cpp; fixtures /root/reference/tests/zone_monitor/).

The strongest check here renders tests/zone_monitor/0.stl through the
785.json beam geometry (sensor_to_body z+1 m, exactly like the
reference's test rig) and compares the result against the reference's
shipped 0.zrb: near bounds are bit-exact per pixel in bin space and far
bounds within one quantization bin (f32-vs-f64 ray math at one
boundary pixel).
"""

import json
import os

import numpy as np
import pytest

from ouster_sdk_tpu.zone.monitor import (
    closest_and_farthest_intersections,
    ray_triangle_intersect,
)
from ouster_sdk_tpu.zone.zone import (
    BeamConfig,
    CoordinateFrame,
    Stl,
    Zone,
    ZoneMode,
    load_stl,
)
from ouster_sdk_tpu.zone.zrb import DEFAULT_M_PER_ZMBIN, Zrb

DATA_DIR = "/root/reference/tests/zone_monitor"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA_DIR), reason="reference zone fixtures missing")


def _beam_config(sensor_to_body=None):
    """The reference test rig's BeamConfig from 785.json
    (ref: zone_render_test.cpp:28-62 test_beam_config)."""
    si = json.load(open(os.path.join(DATA_DIR, "785.json")))
    bi, li = si["beam_intrinsics"], si["lidar_intrinsics"]
    if sensor_to_body is None:
        # "simulate a nontrivial zm metadata.json extrinsics"
        sensor_to_body = np.eye(4)
        sensor_to_body[2, 3] = 1.0
    return BeamConfig(
        si["lidar_data_format"]["columns_per_frame"],
        bi["beam_altitude_angles"], bi["beam_azimuth_angles"],
        np.array(bi["beam_to_lidar_transform"]).reshape(4, 4),
        np.array(li["lidar_to_sensor_transform"]).reshape(4, 4),
        sensor_to_body, DEFAULT_M_PER_ZMBIN,
        si["sensor_info"]["prod_sn"])


def _rendered_zone():
    zone = Zone(0)
    zone.point_count = 1000
    zone.frame_count = 10
    zone.mode = ZoneMode.OCCUPANCY
    zone.stl = Stl(os.path.join(DATA_DIR, "0.stl"),
                   coordinate_frame=CoordinateFrame.BODY)
    assert zone.render(_beam_config())
    return zone


# ---------------------------------------------------------------- Zrb IO

def test_golden_zrb_read():
    """(ref: zrb_test.cpp from_file)"""
    z = Zrb.from_file(os.path.join(DATA_DIR, "0.zrb"))
    assert z.near_range_mm.shape == (128, 1024)
    assert z.far_range_mm.shape == (128, 1024)
    assert z.serial_number == 122247000785
    # stl_hash surfaces as a hex string (ref: client.pyi:1818)
    assert z.stl_hash == ("9cb392667efd9bb1dd2f02c138049243"
                          "a6103b4a0ef86574681c0641a195c7fd")
    assert z.m_per_zmbin == np.float32(DEFAULT_M_PER_ZMBIN)
    # transforms are column-major in the blob: the z+1 m translation
    # must land at (2, 3) of the row-major matrix
    assert z.sensor_to_body_transform[2, 3] == 1.0
    assert z.sensor_to_body_transform[3, 2] == 0.0


def test_golden_zrb_missing_file():
    """(ref: zrb_test.cpp from_file_bad error text)"""
    with pytest.raises(RuntimeError, match="could not open file"):
        Zrb.from_file("non_existent_file.zrb")


def test_golden_zrb_blob_roundtrip_bytes():
    """Re-serializing the golden reproduces it byte-for-byte except the
    valid-column mask (the shipped artifact predates mask computation
    and carries all zeros; our save computes it like zrb.cpp:116-118)."""
    raw = open(os.path.join(DATA_DIR, "0.zrb"), "rb").read()
    z = Zrb.from_blob(raw)
    out = z.blob()
    assert len(out) == len(raw)
    info_meta_end = 39 + 540
    mask_lo, mask_hi = 39 + 284, 39 + 540
    assert out[:mask_lo] == raw[:mask_lo]          # header + meta prefix
    assert out[info_meta_end:] == raw[info_meta_end:]  # data section
    # golden mask is all zeros; ours is the recomputed truth
    assert not any(raw[mask_lo:mask_hi])
    truth = np.zeros(2048, dtype=bool)
    truth[:1024] = (z.far_range_mm > 0).any(axis=0)
    assert np.array_equal(z.valid_col_mask[:1024], truth[:1024]) or \
        np.array_equal(
            np.unpackbits(np.frombuffer(out[mask_lo:mask_hi],
                                        dtype=np.uint8),
                          bitorder="little").astype(bool), truth)


def test_zrb_equality_matrix():
    """(ref: zrb_test.cpp equality/inequality)"""
    path = os.path.join(DATA_DIR, "0.zrb")
    z1, z2 = Zrb.from_file(path), Zrb.from_file(path)
    assert z1 == z2
    z2.serial_number += 1
    assert z1 != z2
    z2 = Zrb.from_file(path)
    z2.near_range_mm = z2.near_range_mm.copy()
    z2.near_range_mm[0, 0] += 4
    assert z1 != z2
    z2 = Zrb.from_file(path)
    z2.sensor_to_body_transform = z2.sensor_to_body_transform.copy()
    z2.sensor_to_body_transform[0, 0] += 0.1
    assert z1 != z2


# ------------------------------------------------------------- rendering

def test_render_matches_golden_zrb():
    """Full render of 0.stl through the 785.json geometry vs the
    reference's shipped 0.zrb (ref: zone_render_test.cpp render +
    the golden artifact itself)."""
    zone = _rendered_zone()
    ours = zone.zrb
    gold = Zrb.from_file(os.path.join(DATA_DIR, "0.zrb"))
    assert ours.stl_hash == gold.stl_hash
    assert ours.serial_number == gold.serial_number

    mm_per_bin = np.float32(DEFAULT_M_PER_ZMBIN) * np.float32(1000.0)

    def bins(img):
        return np.round(img.astype(np.float32) / mm_per_bin).astype(int)

    near_d = np.abs(bins(ours.near_range_mm) - bins(gold.near_range_mm))
    far_d = np.abs(bins(ours.far_range_mm) - bins(gold.far_range_mm))
    assert (near_d == 0).all(), f"near bins diverge: max {near_d.max()}"
    assert far_d.max() <= 1
    assert (far_d == 0).mean() > 0.9999


def test_render_pinned_values():
    """(ref: zone_render_test.cpp:64-119 render: pinned mm values)"""
    zone = _rendered_zone()
    zrb = zone.zrb
    assert zrb.near_range_mm[50, 100] == 0
    assert zrb.far_range_mm[50, 100] == 0
    max_error = 4  # mm
    assert abs(int(zrb.near_range_mm[59, 180]) - 2253) <= max_error
    assert abs(int(zrb.far_range_mm[59, 180]) - 3027) <= max_error
    assert abs(int(zrb.near_range_mm[71, 274]) - 2285) <= max_error
    assert abs(int(zrb.far_range_mm[71, 274]) - 2375) <= max_error

    # blob roundtrip preserves the values and sets the column mask only
    # at save time (ref: zone_render_test.cpp:105-119)
    assert not zrb.valid_col_mask.any()
    blob = zrb.blob()
    zrb2 = Zrb.from_blob(blob)
    assert zrb2.valid_col_mask.any()
    assert abs(int(zrb2.near_range_mm[59, 180]) - 2253) <= max_error
    assert abs(int(zrb2.far_range_mm[71, 274]) - 2375) <= max_error
    assert zrb2.stl_hash == zone.stl.hash


def test_render_no_stl_raises():
    """(ref: zone_render_test.cpp render_no_stl_or_zrb)"""
    zone = Zone(0)
    zone.point_count = 1000
    zone.frame_count = 10
    zone.mode = ZoneMode.OCCUPANCY
    with pytest.raises(ValueError, match="must have either STL or ZRB"):
        zone.render(_beam_config())


def test_render_area_smaller_than_point_count():
    """(ref: zone.cpp:118-125)"""
    zone = Zone(0)
    zone.point_count = 200000      # larger than any possible area
    zone.frame_count = 10
    zone.stl = Stl(os.path.join(DATA_DIR, "0.stl"),
                   coordinate_frame=CoordinateFrame.BODY)
    with pytest.raises(ValueError, match="smaller than"):
        zone.render(_beam_config())


def test_render_out_of_view_returns_false():
    """A mesh far outside every beam renders empty and returns False
    (ref: zone.cpp:127 'pixels_with_intersections > 0')."""
    zone = Zone.box(1, center=[0, 0, 500], size=[1, 1, 1])
    zone.stl = Stl(
        __import__("ouster_sdk_tpu.zone.zone", fromlist=["save_stl"])
        .save_stl(None, zone.triangles),
        coordinate_frame=CoordinateFrame.BODY)
    assert zone.render(_beam_config()) is False
    assert zone.zrb is not None
    assert not zone.zrb.far_range_mm.any()


def test_render_coordinate_frame_selects_lut():
    """BODY uses the sensor_to_body LUT; SENSOR ignores it
    (ref: zone.cpp:80-88)."""
    cfg = _beam_config()
    stl_body = Stl(os.path.join(DATA_DIR, "0.stl"),
                   coordinate_frame=CoordinateFrame.BODY)
    stl_sensor = Stl(os.path.join(DATA_DIR, "0.stl"),
                     coordinate_frame=CoordinateFrame.SENSOR)
    zb, zs = Zone(0), Zone(1)
    zb.stl, zs.stl = stl_body, stl_sensor
    zb.render(cfg)
    zs.render(cfg)
    assert not np.array_equal(zb.zrb.near_range_mm, zs.zrb.near_range_mm)
    # with identity sensor_to_body the two frames coincide
    cfg_id = _beam_config(sensor_to_body=np.eye(4))
    zb2, zs2 = Zone(0), Zone(1)
    zb2.stl, zs2.stl = stl_body, stl_sensor
    zb2.render(cfg_id)
    zs2.render(cfg_id)
    assert np.array_equal(zb2.zrb.near_range_mm, zs2.zrb.near_range_mm)
    assert np.array_equal(zb2.zrb.far_range_mm, zs2.zrb.far_range_mm)


# ------------------------------------------------------------ BeamConfig

def test_beam_config_validation():
    """(ref: beam_config_test.cpp it_throws_if_transforms_are_not_set)"""
    eye = np.eye(4)
    zero = np.zeros((4, 4))
    for idx, msg in [(0, "beam_to_lidar_transform not set"),
                     (1, "lidar_to_sensor_transform not set"),
                     (2, "sensor_to_body_transform not set")]:
        mats = [eye, eye, eye]
        mats[idx] = zero
        with pytest.raises(ValueError, match=msg):
            BeamConfig(1024, [0.0], [0.0], *mats, 0.0025, 123456789)


def test_beam_config_scales_translation():
    """sensor_to_body translation is scaled m->mm for the LUT
    (ref: beam_config.cpp scale_translation; beam_config_test.cpp
    construct_valid)."""
    s2b = np.eye(4)
    s2b[0, 3], s2b[1, 3], s2b[2, 3] = 1.0, 2.0, 3.0
    cfg = BeamConfig(4, [0.0], [0.0], np.eye(4), np.eye(4), s2b,
                     0.0025, 1)
    base = BeamConfig(4, [0.0], [0.0], np.eye(4), np.eye(4), np.eye(4),
                      0.0025, 1)
    # offsets differ by exactly the translation (LUT offset is meters)
    d = cfg.lut.offset.reshape(-1, 3) - base.lut.offset.reshape(-1, 3)
    np.testing.assert_allclose(d, [[1.0, 2.0, 3.0]] * d.shape[0],
                               atol=1e-9)
    # the no-s2b LUT ignores it
    np.testing.assert_allclose(cfg.lut_no_sensor_to_body_transform.offset,
                               base.lut.offset, atol=0)


# ------------------------------------------------------------- STL / mesh

def test_stl_ascii_parses():
    """(ref: mesh_test.cpp load_from_stl_ascii)"""
    tris = load_stl(os.path.join(DATA_DIR, "ascii.stl"))
    assert tris.shape == (12, 3, 3)
    # the reference test pins only the first vertex + the facet normal
    np.testing.assert_array_equal(tris[0, 0], [-20, -20, 40])
    # normal of the first facet
    n = np.cross(tris[0, 1] - tris[0, 0], tris[0, 2] - tris[0, 0])
    n /= np.linalg.norm(n)
    np.testing.assert_allclose(np.abs(n), [0, 0, 1], atol=1e-12)


@pytest.mark.parametrize("name", [
    "ascii_invalid_expected_vertex.stl",
    "ascii_invalid_expected_endloop.stl",
    "ascii_invalid_expected_outer_loop.stl",
    "ascii_invalid_expected_endfacet.stl",
    "ascii_empty.stl",
    "ascii_invalid_expected_solid.stl",
    "ascii_invalid_expected_endsolid.stl",
    "ascii_invalid_unexpected_line.stl",
])
def test_stl_ascii_invalid(name):
    """(ref: mesh_test.cpp load_from_ascii_invalid — all must fail)"""
    with pytest.raises(ValueError):
        load_stl(os.path.join(DATA_DIR, name))


def test_stl_binary_fixtures():
    """(ref: mesh_test.cpp load_from_stl_binary/bytes)"""
    tris = load_stl(os.path.join(DATA_DIR, "0.stl"))
    assert tris.shape == (12, 3, 3)
    with open(os.path.join(DATA_DIR, "0.stl"), "rb") as f:
        from_bytes = load_stl(f.read())
    np.testing.assert_array_equal(tris, from_bytes)
    assert load_stl(os.path.join(DATA_DIR, "plane.stl")).shape[0] == 2
    assert load_stl(os.path.join(DATA_DIR, "tiny.stl")).shape[0] == 124


def test_mesh_intersection_regression():
    """Pinned intersection distances
    (ref: mesh_test.cpp closest_and_farthest_intersections /
    intersection_distances — values determined experimentally there)."""
    tris = load_stl(os.path.join(DATA_DIR, "0.stl"))
    origin = np.array([[0.00397694, 0.000619036, 1.0436]])
    direction = np.array([[-0.0914688, 0.975646, -0.199368]])
    t = ray_triangle_intersect(origin, direction, tris)
    hits = np.sort(t[0][np.isfinite(t[0])])
    assert hits.size == 2
    np.testing.assert_allclose(hits, [2.02771592, 2.65380812], rtol=1e-5)
    near, far, n = closest_and_farthest_intersections(
        origin, direction, tris)
    assert n[0] == 2
    np.testing.assert_allclose(near[0], 2.02771592, rtol=1e-5)
    np.testing.assert_allclose(far[0], 2.65380812, rtol=1e-5)


def test_single_hit_means_inside():
    """One positive hit -> near=0 (ref: mesh.cpp:278-281)."""
    tris = load_stl(os.path.join(DATA_DIR, "plane.stl"))
    # aim at the interior of ONE triangle: exactly one intersection
    center = tris[0].mean(axis=0)
    origin = np.zeros((1, 3))
    d = center / np.linalg.norm(center)
    near, far, n = closest_and_farthest_intersections(
        origin, d[None], tris)
    assert n[0] == 1
    assert near[0] == 0.0
    assert far[0] > 0


def test_coordinate_frame_strings():
    """(ref: stl_test.cpp coordinate_frame_from_string/to_string)"""
    assert CoordinateFrame.from_string("BODY") is CoordinateFrame.BODY
    assert CoordinateFrame.from_string("SENSOR") is CoordinateFrame.SENSOR
    assert CoordinateFrame.from_string("NONE") is None
    assert CoordinateFrame.from_string("bogus") is None
    assert CoordinateFrame.BODY.name == "BODY"
    assert CoordinateFrame.NONE.value == 0


# --------------------------------------------- ZM OSF fixture conformance

ZM_OSF = os.path.join(DATA_DIR, "single_frame_zm.osf")


@pytest.fixture(scope="module")
def zm_source():
    from ouster_sdk_tpu import open_source

    src = open_source(ZM_OSF)
    info = src.sensor_info[0]
    scan = next(iter(src))[0]
    return info, scan


def test_zm_osf_zone_states_pinned(zm_source):
    """ZONE_STATES decode from the reference's ZM OSF fixture
    (ref: python/tests/test_zone_monitor.py:297-313 pinned values)."""
    _, scan = zm_source
    z0 = scan.field("ZONE_STATES")[0]
    assert z0["id"] == 0 and z0["live"] == 1 and z0["error_flags"] == 0
    assert z0["min_range"] == 674
    assert z0["max_range"] == 1019
    assert z0["mean_range"] == 832
    assert z0["count"] == 1094
    assert z0["trigger_type"] == ZoneMode.OCCUPANCY.value
    assert z0["trigger_status"] == 1
    assert z0["triggered_frames"] == 10553
    assert z0["occlusion_count"] == 837
    assert z0["invalid_count"] == 1093
    assert z0["max_count"] == 3439


def test_zm_osf_embedded_zone_set(zm_source):
    """sensor metadata carries the zone set as base64 zip
    (ref: metadata.cpp:871-875, sensor_info.cpp:388-392)."""
    info, _ = zm_source
    zs = info.zone_set
    assert zs is not None
    assert sorted(zs.zones) == [0, 1, 2, 3]
    for z in zs.zones.values():
        assert z.zrb is not None and z.stl is not None
    # serialize -> reparse roundtrip through sensor metadata json
    import json as _json

    from ouster_sdk_tpu import sensor_info_from_metadata

    blob = info.to_json_string()
    assert "zone_set" in _json.loads(blob)
    back = sensor_info_from_metadata(blob)
    assert back.zone_set is not None
    assert back.zone_set == zs


def test_zm_osf_emulated_zone_mon_pinned(zm_source):
    """EmulatedZoneMon over the fixture's RANGE reproduces the
    reference's pinned per-zone stats bit-for-bit
    (ref: python/tests/test_zone_monitor.py:315-341)."""
    import numpy as _np

    from ouster_sdk_tpu.zone.monitor import EmulatedZoneMon

    info, scan = zm_source
    ezm = EmulatedZoneMon(info.zone_set)
    bm = _np.zeros((info.format.pixels_per_column,
                    info.format.columns_per_frame), dtype=_np.uint32)
    ezm.calc_triggers(scan.field("RANGE"), bm)
    ezm.calc_triggers(scan.field("RANGE"), bm)
    p = ezm.get_packet()[0]
    assert p["id"] == 0 and p["live"] == 1 and p["error_flags"] == 0
    assert p["min_range"] == 676
    assert p["max_range"] == 1020
    assert p["mean_range"] == 836
    assert p["count"] == 1089
    assert p["trigger_type"] == ZoneMode.OCCUPANCY.value
    assert p["trigger_status"] == 1
    assert p["triggered_frames"] == 1
    assert p["occlusion_count"] == 847
    assert p["invalid_count"] == 1140
    assert p["max_count"] == 3439
    # pixels inside zone 0 carry live-index bit 0 in the bitmask
    assert int((bm & 1).sum()) >= p["count"]


def test_zm_osf_vacancy_modes(zm_source):
    """(ref: python/tests/test_zone_monitor.py vacancy_mode/_2)"""
    import numpy as _np

    from ouster_sdk_tpu.zone.monitor import EmulatedZoneMon

    info, scan = zm_source
    zs = info.zone_set
    zs.zones[0].mode = ZoneMode.VACANCY
    try:
        ezm = EmulatedZoneMon(zs)
        bm = _np.zeros((info.format.pixels_per_column,
                        info.format.columns_per_frame), dtype=_np.uint32)
        rng = scan.field("RANGE")
        ezm.calc_triggers(rng, bm)
        ezm.calc_triggers(rng, bm)
        p = ezm.get_packet()[0]
        assert p["trigger_type"] == ZoneMode.VACANCY.value
        assert p["trigger_status"] == 0
        assert p["triggered_frames"] == 0
        # pushing everything past the zone triggers VACANCY
        ezm2 = EmulatedZoneMon(zs)
        ezm2.calc_triggers(rng + 1000, bm)
        ezm2.calc_triggers(rng + 1000, bm)
        p2 = ezm2.get_packet()[0]
        assert p2["trigger_status"] == 1
        assert p2["triggered_frames"] == 1
    finally:
        zs.zones[0].mode = ZoneMode.OCCUPANCY


def test_emulated_zone_mon_requires_rendered_zones():
    """(ref: python/tests/test_zone_monitor.py:280-294)"""
    from ouster_sdk_tpu.zone.monitor import EmulatedZoneMon
    from ouster_sdk_tpu.zone.zone import ZoneSet

    zone = Zone(0)
    zone.point_count = 1
    zone.frame_count = 1
    zone.mode = ZoneMode.OCCUPANCY
    zone.stl = Stl(os.path.join(DATA_DIR, "0.stl"),
                   coordinate_frame=CoordinateFrame.BODY)
    zs = ZoneSet({0: zone}, sensor_to_body_transform=np.eye(4))
    assert zs.zones[0].zrb is None
    with pytest.raises(ValueError,
                       match="all zones in ZoneSet must have a valid ZRB"):
        EmulatedZoneMon(zs)


# ---------------------------------------------------- ZoneSet render API

def test_zone_set_render_matches_golden_size():
    """(ref: zone_monitor_test.cpp:73-102 ZoneSet render)"""
    from ouster_sdk_tpu import sensor_info_from_metadata
    from ouster_sdk_tpu.zone.zone import ZoneSet

    info = sensor_info_from_metadata(
        open(os.path.join(DATA_DIR, "785.json")).read())
    s2b = np.eye(4)
    s2b[2, 3] = 1.0
    zone = Zone(0)
    zone.point_count = 100
    zone.frame_count = 10
    zone.mode = ZoneMode.OCCUPANCY
    zone.stl = Stl(os.path.join(DATA_DIR, "0.stl"),
                   coordinate_frame=CoordinateFrame.BODY)
    zs = ZoneSet({0: zone}, sensor_to_body_transform=s2b)
    zs.render(info)
    golden = open(os.path.join(DATA_DIR, "0.zrb"), "rb").read()
    blob = zs.zones[0].zrb.blob()
    assert len(blob) == len(golden)
    assert zs.zones[0].zrb.serial_number == info.sn


def test_zone_set_render_requires_s2b():
    """(ref: zone_monitor_test.cpp:41-71)"""
    from ouster_sdk_tpu import sensor_info_from_metadata
    from ouster_sdk_tpu.zone.zone import ZoneSet

    info = sensor_info_from_metadata(
        open(os.path.join(DATA_DIR, "785.json")).read())
    zone = Zone(0)
    zone.point_count = 100
    zone.frame_count = 2
    zone.stl = Stl(os.path.join(DATA_DIR, "0.stl"),
                   coordinate_frame=CoordinateFrame.BODY)
    zs = ZoneSet({0: zone})
    with pytest.raises(ValueError,
                       match="sensor_to_body_transform not set"):
        zs.render(info)


def test_zone_set_render_out_of_fov():
    """(ref: zone_monitor_test.cpp:104-140 render_out_of_fov)"""
    from ouster_sdk_tpu import sensor_info_from_metadata
    from ouster_sdk_tpu.zone.zone import ZoneSet

    info = sensor_info_from_metadata(
        open(os.path.join(DATA_DIR, "785.json")).read())
    # rotate the body frame 90 deg about Y: the zone points away
    s2b = np.eye(4)
    c, s = np.cos(np.pi / 2), np.sin(np.pi / 2)
    s2b[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    zone = Zone(0)
    zone.point_count = 1
    zone.frame_count = 10
    zone.stl = Stl(os.path.join(DATA_DIR, "1.stl"),
                   coordinate_frame=CoordinateFrame.BODY)
    zs = ZoneSet({0: zone}, sensor_to_body_transform=s2b)
    with pytest.raises(RuntimeError, match="was out of sensor FOV"):
        zs.render(info)


def test_zone_set_all_zrbs_same_resolution():
    """(ref: zone_monitor_test.cpp:354 all_zrbs_must_have_the_same...)"""
    from ouster_sdk_tpu.zone.zone import ZoneSet

    a, b = Zone(0), Zone(1)
    a.zrb = Zrb(64, 1024, serial_number=1)
    a.zrb.far_range_mm[:] = 100
    b.zrb = Zrb(128, 1024, serial_number=1)
    b.zrb.far_range_mm[:] = 100
    zs = ZoneSet({0: a, 1: b}, sensor_to_body_transform=np.eye(4))
    with pytest.raises(ValueError,
                       match="same resolution"):
        zs.check_invariants()
