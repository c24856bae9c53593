"""Zone monitor tests: ZRB roundtrip, mesh rendering, occupancy
(ref: tests/zone_monitor*.cpp, zrb_test.cpp)."""

import numpy as np
import pytest

from ouster_sdk_tpu import LidarMode, SensorInfo
from ouster_sdk_tpu.zone import Zone, ZoneSet, Zrb
from ouster_sdk_tpu.zone.monitor import (
    ZoneMonitor,
    ray_triangle_intersect,
    render_zone_bounds,
    zone_occupancy,
    zone_occupancy_jax,
)
from ouster_sdk_tpu.zone.zone import load_stl, save_stl


def test_zrb_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    z = Zrb(32, 64, 0.004, serial_number=992210000957)
    bin_mm = 4.0
    z.near_range_mm = (rng.integers(0, 1000, (32, 64))
                       * 4).astype(np.uint32)
    z.far_range_mm = z.near_range_mm + 4000
    path = str(tmp_path / "zone.zrb")
    z.save(path)
    back = Zrb.from_file(path)
    assert back.serial_number == z.serial_number
    assert back.m_per_zmbin == np.float32(0.004)
    # 16-bit binning is lossy by at most one bin
    assert np.abs(back.near_range_mm.astype(int)
                  - z.near_range_mm.astype(int)).max() <= bin_mm
    assert np.abs(back.far_range_mm.astype(int)
                  - z.far_range_mm.astype(int)).max() <= bin_mm


def test_zrb_rejects_corruption(tmp_path):
    z = Zrb(4, 8, 0.004, serial_number=1)
    z.far_range_mm[:] = 1000
    blob = bytearray(z.blob())
    blob[100] ^= 0xFF  # corrupt metadata
    with pytest.raises(ValueError):
        Zrb.from_blob(bytes(blob))


def test_stl_roundtrip(tmp_path):
    tris = np.random.default_rng(1).normal(size=(10, 3, 3))
    p = str(tmp_path / "mesh.stl")
    save_stl(p, tris)
    back = load_stl(p)
    np.testing.assert_allclose(back, tris, atol=1e-5)


def test_ray_triangle():
    tri = np.array([[[0, -1, -1], [0, 1, -1], [0, 0, 1.0]]])
    origins = np.array([[-5, 0, 0.0], [-5, 0, 5.0]])
    dirs = np.array([[1, 0, 0.0], [1, 0, 0.0]])
    t = ray_triangle_intersect(origins, dirs, tri)
    assert abs(t[0, 0] - 5.0) < 1e-9
    assert np.isinf(t[1, 0])


def _box_info():
    info = SensorInfo.from_default(LidarMode.from_string("512x10"))
    return info


def test_zone_render_and_occupancy():
    info = _box_info()
    # a 2x2x2 m box centred 5 m in front of the sensor (+x)
    zone = Zone.box(1, center=[5, 0, 0], size=[2, 2, 2])
    zrb = render_zone_bounds(zone, info)
    hit = zrb.far_range_mm > 0
    assert hit.any(), "no beams intersect the zone"
    # bounds should be around 4-6 m
    near = zrb.near_range_mm[hit]
    assert near.min() >= 3500 and near.max() <= 6500

    # a synthetic range image: wall at 5 m everywhere
    rng_img = np.full((info.h, info.w), 5000, dtype=np.uint32)
    count, mask = zone_occupancy(rng_img, zrb)
    assert count > 0
    assert mask.sum() == count
    # wall at 20 m: nothing inside the zone
    count2, _ = zone_occupancy(
        np.full((info.h, info.w), 20000, dtype=np.uint32), zrb)
    assert count2 == 0

    # device path agrees with host
    import jax.numpy as jnp

    near_s = jnp.asarray(zrb.near_range_mm[None])
    far_s = jnp.asarray(zrb.far_range_mm[None])
    dev_counts = np.asarray(zone_occupancy_jax(
        jnp.asarray(rng_img), near_s, far_s))
    assert dev_counts[0] == count


def test_zoneset_zip_roundtrip():
    zs = ZoneSet([Zone.box(1, [5, 0, 0], [2, 2, 2]),
                  Zone.box(2, [0, 5, 0], [1, 1, 3])],
                 sensor_to_body_transform=np.eye(4))
    blob = zs.to_zip()
    back = ZoneSet.from_zip(blob)
    assert sorted(back.zones) == [1, 2]
    np.testing.assert_allclose(back.zones[1].triangles,
                               zs.zones[1].triangles, atol=1e-5)
    assert back.hash() == zs.hash()
    assert back == zs  # reference operator== semantics


def test_zoneset_requires_sensor_to_body():
    """(ref: zone_monitor_test.cpp it_should_throw_if_no_s2b)"""
    zs = ZoneSet([Zone.box(1, [5, 0, 0], [2, 2, 2])])
    with pytest.raises(ValueError,
                       match="sensor_to_body_transform must be set"):
        zs.to_zip_blob()


def test_zone_monitor_end_to_end():
    info = _box_info()
    zs = ZoneSet([Zone.box(1, [5, 0, 0], [2, 2, 2])])
    mon = ZoneMonitor(zs, info)
    from ouster_sdk_tpu.core.lidar_scan import LidarScan
    from ouster_sdk_tpu.core.constants import ChanField

    scan = LidarScan(info)
    scan.field(ChanField.RANGE)[:] = 5000
    counts = mon.check_scan(scan)
    assert counts[1] > 0


def test_zone_viz_snapshot(tmp_path):
    """Zone wireframes + triggered highlighting render headlessly
    (ref: ouster_viz/src/zone_monitor_voxel_mesh.cpp)."""
    import os

    from ouster_sdk_tpu.viz.zone_viz import (render_zone_scene,
                                             save_zone_snapshot,
                                             zone_color)
    from ouster_sdk_tpu.zone.zone import Zone, ZoneSet

    zs = ZoneSet([Zone.box(1, (5, 0, 0), (2, 2, 2)),
                  Zone.box(2, (0, 6, 0), (3, 1, 1))])
    from ouster_sdk_tpu.core.constants import ChanField
    from ouster_sdk_tpu.core.lidar_scan import LidarScan

    info = _box_info()
    scan = LidarScan(info)
    scan.field(ChanField.RANGE)[:] = 5000
    frame_idle = render_zone_scene(zs, info, scan, triggered={})
    frame_hit = render_zone_scene(zs, info, scan, triggered={1: 123})
    assert frame_idle.shape == frame_hit.shape == (768, 1024, 3)
    # triggered rendering differs (bright wireframe + count label)
    assert np.abs(frame_idle.astype(int) - frame_hit.astype(int)).sum() > 0
    p = save_zone_snapshot(zs, info, scan, {1: 123},
                           str(tmp_path / "zones.png"))
    assert os.path.getsize(p) > 500
    assert zone_color(1) != zone_color(2)


def test_emulated_zone_mon_hysteresis():
    """Trigger hysteresis + ZoneState records
    (ref: sdk/zone_monitor/zone_common.py EmulatedZoneMon)."""
    from ouster_sdk_tpu.zone.monitor import EmulatedZoneMon
    from ouster_sdk_tpu.zone.zone import ZoneMode

    info = _box_info()
    z = Zone.box(1, [5, 0, 0], [2, 2, 2])
    z.min_points = 5
    z.frame_count = 2  # two consecutive triggered frames before alerting
    mon = EmulatedZoneMon(ZoneSet([z]), info)

    inside = np.full((info.h, info.w), 5000, dtype=np.uint32)
    outside = np.full((info.h, info.w), 20000, dtype=np.uint32)
    mask = np.zeros((info.h, info.w), np.uint16)

    mon.calc_triggers(inside, mask)
    assert mon.zone_counts[1] >= 5
    assert mon.triggered_zone_ids == []      # 1 frame < frame_count
    assert (mask[inside <= 0].size == 0) and mask.any()
    mon.calc_triggers(inside)
    assert mon.triggered_zone_ids == [1]     # 2 consecutive frames
    pkt = mon.get_packet()
    assert pkt[0]["id"] == 1 and pkt[0]["live"] == 1
    assert pkt[0]["trigger_status"] == 1
    assert pkt[0]["trigger_type"] == ZoneMode.OCCUPANCY.value
    assert 4000 <= pkt[0]["mean_range"] <= 6500
    assert pkt[1]["id"] == 255               # inactive slot sentinel
    # leaving the zone resets both counters
    mon.calc_triggers(outside)
    assert mon.triggered_zone_ids == []
    assert mon.zone_counts[1] == 0
    # occlusion: everything closer than the zone's near bound
    near_wall = np.full((info.h, info.w), 1000, dtype=np.uint32)
    mon.calc_triggers(near_wall)
    assert mon.occlusion_counts[1] > 0
    # invalid: no return where the zone expects one
    mon.calc_triggers(np.zeros((info.h, info.w), np.uint32))
    assert mon.invalid_counts[1] > 0


def test_emulated_zone_mon_vacancy_mode():
    from ouster_sdk_tpu.zone.monitor import EmulatedZoneMon
    from ouster_sdk_tpu.zone.zone import ZoneMode

    info = _box_info()
    z = Zone.box(1, [5, 0, 0], [2, 2, 2])
    z.mode = ZoneMode.VACANCY
    z.min_points = 5
    mon = EmulatedZoneMon(ZoneSet([z]), info)
    # empty zone triggers VACANCY immediately (frame_count=1)
    mon.calc_triggers(np.full((info.h, info.w), 20000, dtype=np.uint32))
    assert mon.triggered_zone_ids == [1]
    mon.calc_triggers(np.full((info.h, info.w), 5000, dtype=np.uint32))
    assert mon.triggered_zone_ids == []


def test_zoneset_live_ids_zip_roundtrip():
    zs = ZoneSet([Zone.box(1, [5, 0, 0], [2, 2, 2]),
                  Zone.box(2, [0, 5, 0], [1, 1, 3])],
                 power_on_live_ids=[2],
                 sensor_to_body_transform=np.eye(4))
    back = ZoneSet.from_zip(zs.to_zip())
    assert back.live_ids == [2]
    zs2 = ZoneSet([Zone.box(1, [5, 0, 0], [2, 2, 2])],
                  sensor_to_body_transform=np.eye(4))
    assert ZoneSet.from_zip(zs2.to_zip()).live_ids == [1]


def test_cli_emulate_zones():
    import os

    from click.testing import CliRunner

    from ouster_sdk_tpu.cli import cli

    pcap = "/root/reference/tests/pcaps/OS-2-128-U1_v2.3.0_1024x10.pcap"
    if not os.path.exists(pcap):
        import pytest

        pytest.skip("fixture missing")
    zs = ZoneSet([Zone.box(1, [5, 0, 0], [6, 6, 6])],
                 sensor_to_body_transform=np.eye(4))
    zpath = "/tmp/test_zones.zip"
    open(zpath, "wb").write(zs.to_zip())
    r = CliRunner().invoke(cli, [
        "source", pcap, "slice", ":1",
        "emulate_zones", "-c", zpath, "stats"])
    assert r.exit_code == 0, r.output


def test_voxel_style_zone_mesh():
    """Voxel-style zone boundary mesh (ref: zone_monitor_voxel_mesh.cpp
    voxel_style_mesh_from_zone_image_pair)."""
    import ouster_sdk_tpu as o
    from ouster_sdk_tpu.viz import (precompute_voxel_vertices,
                                    voxel_style_mesh_from_zone_image_pair)
    from ouster_sdk_tpu.zone import Zone, render_zone_bounds

    meta = open("/root/reference/tests/pcaps/"
                "OS-2-128-U1_v2.3.0_1024x10.json").read()
    info = o.sensor_info_from_metadata(meta)
    zone = Zone.box(1, (6, 0, 0), (4, 4, 2))
    zrb = render_zone_bounds(zone, info)
    vv = precompute_voxel_vertices(info)
    mesh = voxel_style_mesh_from_zone_image_pair(zrb, info, vv)
    assert mesh.triangles.shape[0] > 100
    # every vertex must lie within the zone's range band (plus margin)
    import numpy as np

    d = np.linalg.norm(mesh.triangles.reshape(-1, 3), axis=1)
    assert d.min() > 3.0 and d.max() < 12.0


def test_cli_emulate_zones_embedded_zone_set():
    """emulate_zones with no --config uses the zone set embedded in the
    source metadata (ref: metadata.cpp:871-875 embedded zone_set)."""
    import os

    from click.testing import CliRunner

    from ouster_sdk_tpu.cli import cli

    osf = "/root/reference/tests/zone_monitor/single_frame_zm.osf"
    if not os.path.exists(osf):
        pytest.skip("fixture missing")
    r = CliRunner().invoke(cli, [
        "source", osf, "slice", ":1", "emulate_zones", "stats"])
    assert r.exit_code == 0, r.output
