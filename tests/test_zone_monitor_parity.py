"""Behavioral parity with the reference's python zone-monitor suite.

Near-literal ports of /root/reference/python/tests/test_zone_monitor.py
and test_zrb.py against this package's API, using the reference's own
shipped fixtures (tests/zone_monitor/). Pinned numeric values (max
counts, packet counts, JSON shapes, STL hashes) are the reference
suite's own expectations — matching them proves the renderer, the
emulated monitor, and the serialization model behave identically.
"""

import json
import os
import zipfile

import numpy as np
import pytest

from ouster_sdk_tpu import SensorInfo, open_source
from ouster_sdk_tpu.zone import (
    CoordinateFrame,
    EmulatedZoneMon,
    Stl,
    Zone,
    ZoneMode,
    ZoneSet,
    ZoneSetOutputFilter,
    Zrb,
)

DATA_DIR = "/root/reference/tests/zone_monitor"
PCAP_JSON = "/root/reference/tests/pcaps/OS-0-128_v3.0.1_1024x10.2.json"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA_DIR), reason="reference zone fixtures missing")


def create_test_zone_set() -> ZoneSet:
    """(ref: python/tests/test_zone_monitor.py:12-31)"""
    sensor_info = SensorInfo(
        open(os.path.join(DATA_DIR, "785.json")).read())
    zone_set = ZoneSet()
    s2b = np.eye(4)
    s2b[2, 3] = 1.0
    zone_set.sensor_to_body_transform = s2b
    zone_set.power_on_live_ids = [0, 1]
    for i in range(2):
        zone = Zone()
        zone.point_count = 50
        zone.frame_count = 2
        zone.stl = Stl(os.path.join(DATA_DIR, f"{i}.stl"))
        zone.stl.coordinate_frame = CoordinateFrame.BODY
        zone.mode = ZoneMode.OCCUPANCY
        zone_set.zones[i] = zone
    zone_set.zones[1].frame_count = 4
    zone_set.render(sensor_info)
    return zone_set


def test_zone_set_zip(tmp_path):
    """Zip write -> read -> write round-trips content-identically
    (ref: test_zone_monitor.py:34-52)."""
    zip_path = tmp_path / "test_zmcfg.zip"
    result_zip_path = tmp_path / "result_zsc.zip"
    test_zsc = create_test_zone_set()
    test_zsc.save(str(zip_path), ZoneSetOutputFilter.STL_AND_ZRB)
    with zipfile.ZipFile(zip_path, "r") as original_zip:
        assert "metadata.json" in original_zip.namelist()
    zsc = ZoneSet(str(zip_path))
    zsc.save(str(result_zip_path), ZoneSetOutputFilter.STL_AND_ZRB)
    result_zsc = ZoneSet(str(result_zip_path))
    assert zsc == result_zsc


def test_zone_set_to_json_stl():
    """Exact metadata.json shape for an STL-only export
    (ref: test_zone_monitor.py:54-88)."""
    zone_set = ZoneSet()
    zone_set.sensor_to_body_transform = np.eye(4)
    zone_set.power_on_live_ids = [0]
    zone = Zone()
    zone.point_count = 1
    zone.frame_count = 1
    zone.mode = ZoneMode.OCCUPANCY
    stl = Stl(os.path.join(DATA_DIR, "0.stl"))
    stl.coordinate_frame = CoordinateFrame.BODY
    zone.stl = stl
    zone_set.zones = {0: zone}
    res = json.loads(zone_set.to_json(ZoneSetOutputFilter.STL))
    assert res == {
        "power_on_live_ids": zone_set.power_on_live_ids,
        "sensor_to_body_transform":
            zone_set.sensor_to_body_transform.flatten().tolist(),
        "version": {"file_naming": 1, "metadata": 1},
        "label": "",
        "zones": {
            "0": {
                "label": "",
                "frame_count": 1,
                "mode": str(zone.mode.name),
                "point_count": 1,
                "stl": {
                    "file_name": "0.stl",
                    "coordinate_frame": str(stl.coordinate_frame.name),
                    "hash": stl.hash,
                },
            }
        },
    }


def test_zone_set_to_json_zrb(tmp_path):
    """Exact metadata.json after an STL_AND_ZRB round-trip, pinned STL
    hashes included (ref: test_zone_monitor.py:91-139)."""
    zip_path = tmp_path / "test_zmcfg.zip"
    test_zsc = create_test_zone_set()
    test_zsc.save(str(zip_path), ZoneSetOutputFilter.STL_AND_ZRB)
    zsc = ZoneSet(str(zip_path))
    zsc_json = json.loads(zsc.to_json(ZoneSetOutputFilter.STL_AND_ZRB))
    for zone in zsc_json["zones"].values():
        del zone["zrb"]["hash"]  # non-deterministic in the reference too
    assert zsc_json == {
        "power_on_live_ids": zsc.power_on_live_ids,
        "sensor_to_body_transform":
            zsc.sensor_to_body_transform.flatten().tolist(),
        "version": {"file_naming": 1, "metadata": 1},
        "label": "",
        "zones": {
            "0": {
                "label": "",
                "frame_count": 2,
                "mode": "OCCUPANCY",
                "point_count": 50,
                "stl": {
                    "coordinate_frame": "BODY",
                    "file_name": "0.stl",
                    "hash": "9cb392667efd9bb1dd2f02c138049243"
                            "a6103b4a0ef86574681c0641a195c7fd",
                },
                "zrb": {"file_name": "0.zrb"},
            },
            "1": {
                "label": "",
                "frame_count": 4,
                "mode": "OCCUPANCY",
                "point_count": 50,
                "stl": {
                    "coordinate_frame": "BODY",
                    "file_name": "1.stl",
                    "hash": "5dd053e7a8682674e9b4cdd7f48d1ffd"
                            "5c3ffc6aebe20b0f4a58f7da9d210fbd",
                },
                "zrb": {"file_name": "1.zrb"},
            },
        },
    }


def test_zone_set_properties():
    """(ref: test_zone_monitor.py:142-156)"""
    zsc = create_test_zone_set()
    expected_s2b = np.eye(4)
    expected_s2b[2, 3] = 1.0
    assert np.array_equal(zsc.sensor_to_body_transform, expected_s2b)
    assert set(zsc.zones.keys()) == set(range(2))
    assert zsc.power_on_live_ids == list(range(2))
    zone = zsc.zones[1]
    assert zone.point_count == 50
    assert zone.frame_count == 4
    assert zone.mode == ZoneMode.OCCUPANCY


def test_mesh_bindings():
    """Mesh/Triangle accessors incl. pinned first-triangle coords
    (ref: test_zone_monitor.py:159-181)."""
    zsc = create_test_zone_set()
    zone = zsc.zones[0]
    assert zone.zrb is not None
    mesh = zone.stl.to_mesh()
    assert len(mesh.triangles) > 0
    triangle = mesh.triangles[0]
    assert len(triangle.coords) == 3
    coord_a = np.array([-0.05188167, 2.3761053, 0.8726386])
    coord_b = np.array([-1.8653536, 2.1534388, 1.6861119])
    coord_c = np.array([-2.1566067, 0.50841117, 0.5865412])
    assert np.allclose(triangle.coords[0], coord_a)
    assert np.allclose(triangle.coords[1], coord_b)
    assert np.allclose(triangle.coords[2], coord_c)
    assert np.allclose(triangle.edges[0], coord_b - coord_a)
    assert np.allclose(triangle.edges[1], coord_c - coord_b)
    assert np.allclose(triangle.edges[2], coord_a - coord_c)
    assert len(triangle.edges) == 3
    normal = np.cross(triangle.edges[0], triangle.edges[1])
    normal /= np.linalg.norm(normal)
    assert np.allclose(triangle.normal, normal)


def test_zrb_from_stl():
    """(ref: test_zone_monitor.py:183-203)"""
    sensor_info = SensorInfo(
        open(os.path.join(DATA_DIR, "785.json")).read())
    zone = Zone()
    zone.point_count = 1
    zone.frame_count = 1
    zone.mode = ZoneMode.OCCUPANCY
    zone.stl = Stl(os.path.join(DATA_DIR, "0.stl"))
    zone.stl.coordinate_frame = CoordinateFrame.BODY
    assert zone.stl.coordinate_frame == CoordinateFrame.BODY
    zone_set = ZoneSet()
    zone_set.sensor_to_body_transform = np.eye(4)
    zone_set.zones = {0: zone}
    assert zone_set.zones[0] == zone
    zone_set.render(sensor_info)
    zrb = zone_set.zones[0].zrb
    assert zrb is not None
    assert zrb.stl_hash == zone.stl.hash
    assert zrb.near_range_mm.shape == (sensor_info.h, sensor_info.w)
    assert zrb.serial_number == sensor_info.sn


def test_zone_render_older_fw():
    """Rendering against a v3.0.1 sensor's metadata (SENSOR frame)
    (ref: test_zone_monitor.py:205-224)."""
    sensor_info = SensorInfo(open(PCAP_JSON).read())
    assert sensor_info.fw_rev == "v3.0.1"
    zone = Zone()
    zone.point_count = 1
    zone.frame_count = 1
    zone.mode = ZoneMode.OCCUPANCY
    zone.stl = Stl(os.path.join(DATA_DIR, "0.stl"))
    zone.stl.coordinate_frame = CoordinateFrame.SENSOR
    zone_set = ZoneSet()
    s2b = np.eye(4)
    s2b[2, 3] = 1.0
    zone_set.sensor_to_body_transform = s2b
    zone_set.zones = {0: zone}
    zone_set.render(sensor_info)
    zrb = zone_set.zones[0].zrb
    assert zrb is not None
    assert zrb.stl_hash == zone.stl.hash
    assert zrb.near_range_mm.shape == (sensor_info.h, sensor_info.w)
    assert zrb.serial_number == sensor_info.sn


def test_emulated_zone_mon_init():
    """Full initial-state surface incl. the reference's pinned
    max_counts (ref: test_zone_monitor.py:227-246)."""
    zsc = create_test_zone_set()
    ezm = EmulatedZoneMon(zsc)
    assert ezm.zone_set == zsc
    assert ezm.zone_counts == {}
    assert ezm.occlusion_counts == {}
    assert ezm.invalid_counts == {}
    assert ezm.max_counts == {0: 12096, 1: 3098}
    assert ezm.zone_mins == {}
    assert ezm.zone_maxes == {}
    assert ezm.zone_avgs == {}
    assert ezm.zone_triggers == [0] * 128
    assert ezm.zone_alerts == [0] * 128
    assert ezm.triggered_zone_ids == []
    assert ezm.update_count == 0
    assert set(ezm.rendered_zones.keys()) == set(range(2))
    assert ezm.live_zones == list(range(2))
    assert not ezm.debug


def test_max_count():
    """max_count = pixels with near < far
    (ref: test_zone_monitor.py:248-265)."""
    zone_set = ZoneSet()
    zone_set.sensor_to_body_transform = np.eye(4)
    zone = Zone()
    zone.point_count = 1
    zone.frame_count = 1
    zone.mode = ZoneMode.OCCUPANCY
    zone.zrb = Zrb()
    zone.zrb.near_range_mm = np.ones((4, 4), dtype=np.uint32)
    zone.zrb.far_range_mm = np.ones((4, 4), dtype=np.uint32) * 5
    zone_set.zones = {0: zone}
    ezm = EmulatedZoneMon(zone_set)
    assert ezm.max_counts[0] == 16
    zone.zrb.near_range_mm = np.ones((4, 4), dtype=np.uint32) * 5
    zone.zrb.far_range_mm = np.ones((4, 4), dtype=np.uint32)
    zone_set.zones = {0: zone}
    ezm = EmulatedZoneMon(zone_set)
    assert ezm.max_counts[0] == 0


def test_emulated_zone_mon_every_zone_must_have_a_zrb():
    """(ref: test_zone_monitor.py:268-277)"""
    sensor_info = SensorInfo(open(PCAP_JSON).read())
    zone_set = create_test_zone_set()
    zone_set.zones[0].zrb = None
    with pytest.raises(ValueError, match="EmulatedZoneMon: all zones in "
                                         "ZoneSet must have a valid ZRB"):
        EmulatedZoneMon(zone_set)
    zone_set.render(sensor_info)
    assert zone_set.zones[0].zrb is not None
    EmulatedZoneMon(zone_set)


def test_blob_renders_zrb_zones():
    """An unrendered STL zone set round-trips with zrb=None
    (ref: test_zone_monitor.py:376-390)."""
    zone_set = ZoneSet()
    zone_set.sensor_to_body_transform = np.eye(4)
    zone = Zone()
    zone.point_count = 1
    zone.frame_count = 1
    zone.mode = ZoneMode.OCCUPANCY
    zone.stl = Stl(os.path.join(DATA_DIR, "0.stl"))
    zone.stl.coordinate_frame = CoordinateFrame.BODY
    zone_set.zones = {0: zone}
    zone_set_bytes = zone_set.to_zip_blob(ZoneSetOutputFilter.STL_AND_ZRB)
    zone_set_2 = ZoneSet(zone_set_bytes)
    assert zone_set_2.zones[0].zrb is None


def test_emulated_zone_mon_get_packet():
    """Pinned packet stats on a uniform 1000 mm range image
    (ref: test_zone_monitor.py:392-421)."""
    sensor_info = SensorInfo(open(PCAP_JSON).read())
    zone_set = ZoneSet()
    zone_set.sensor_to_body_transform = np.eye(4)
    zone = Zone()
    zone.point_count = 1
    zone.frame_count = 1
    zone.mode = ZoneMode.OCCUPANCY
    zone.stl = Stl(os.path.join(DATA_DIR, "0.stl"))
    zone.stl.coordinate_frame = CoordinateFrame.BODY
    zone_set.zones = {0: zone}
    zone_set.render(sensor_info)
    zone_set.power_on_live_ids = [0]
    ezm = EmulatedZoneMon(zone_set)

    fixed_range = 1000  # mm
    range_field = np.full((sensor_info.h, sensor_info.w), fixed_range,
                          dtype=np.uint32)
    bitmask_field = np.zeros((sensor_info.h, sensor_info.w),
                             dtype=np.uint32)
    ezm.calc_triggers(range_field, bitmask_field)
    packet = ezm.get_packet()
    assert packet[0]["id"] == 0
    assert packet[0]["live"] == 1
    assert packet[0]["count"] == 1218
    assert packet[0]["min_range"] == fixed_range
    assert packet[0]["max_range"] == fixed_range
    assert packet[0]["mean_range"] == fixed_range
    assert packet[0]["trigger_status"] == 1
    assert packet[0]["triggered_frames"] == 1


def test_point_count_sanity_check():
    """(ref: test_zone_monitor.py:424-440)"""
    sensor_info = SensorInfo(open(PCAP_JSON).read())
    zone_set = ZoneSet()
    zone_set.sensor_to_body_transform = np.eye(4)
    zone1 = Zone()
    zone1.point_count = 1
    zone1.frame_count = 1
    zone1.mode = ZoneMode.OCCUPANCY
    zone1.zrb = Zrb()
    zone1.zrb.serial_number = sensor_info.sn
    zone1.zrb.near_range_mm = np.zeros(
        (sensor_info.h, sensor_info.w), dtype=np.uint32)
    zone1.zrb.far_range_mm = np.zeros(
        (sensor_info.h, sensor_info.w), dtype=np.uint32)
    zone_set.zones = {1: zone1}
    with pytest.raises(RuntimeError,
                       match="ZoneSet: Zone 1 failed invariant check: "
                             "Zone: ZRB far range image has fewer nonzero "
                             "pixels than point_count"):
        zone_set.to_json(ZoneSetOutputFilter.STL_AND_ZRB)


def test_fail_no_stl_and_no_zrb():
    """(ref: test_zone_monitor.py:443-453)"""
    zone_set = ZoneSet()
    zone_set.sensor_to_body_transform = np.eye(4)
    zone = Zone()
    zone.point_count = 1
    zone.frame_count = 1
    zone.mode = ZoneMode.OCCUPANCY
    zone_set.zones = {0: zone}
    with pytest.raises(RuntimeError,
                       match="ZoneSet: Zone 0 failed invariant check: "
                             "Zone: must have either STL or ZRB"):
        zone_set.to_zip_blob(ZoneSetOutputFilter.STL_AND_ZRB)


def test_it_should_fail_with_invalid_zone_id():
    """(ref: test_zone_monitor.py:456-468)"""
    zone_set = ZoneSet()
    zone_set.sensor_to_body_transform = np.eye(4)
    zone = Zone()
    zone.point_count = 1
    zone.frame_count = 1
    zone.mode = ZoneMode.OCCUPANCY
    zone.stl = Stl(os.path.join(DATA_DIR, "0.stl"))
    zone.stl.coordinate_frame = CoordinateFrame.BODY
    with pytest.raises(RuntimeError,
                       match='Additional property "128" found but was '
                             "invalid."):
        zone_set.zones = {128: zone}
        zone_set.to_zip_blob(ZoneSetOutputFilter.STL_AND_ZRB)


def test_it_should_fail_with_invalid_power_on_live_ids():
    """(ref: test_zone_monitor.py:471-484)"""
    zone_set = ZoneSet()
    zone_set.sensor_to_body_transform = np.eye(4)
    zone = Zone()
    zone.point_count = 1
    zone.frame_count = 1
    zone.mode = ZoneMode.OCCUPANCY
    zone.stl = Stl(os.path.join(DATA_DIR, "0.stl"))
    zone.stl.coordinate_frame = CoordinateFrame.BODY
    zone_set.zones = {0: zone}
    with pytest.raises(RuntimeError, match="128 exceeds maximum of 127"):
        zone_set.power_on_live_ids = [128]
        zone_set.to_zip_blob(ZoneSetOutputFilter.STL_AND_ZRB)


def test_zone_set_eq():
    """Empty sets compare equal; comparing to None raises TypeError
    (ref: test_zone_monitor.py:487-497)."""
    zm1 = ZoneSet()
    zm2 = ZoneSet()
    assert zm1 == zm2
    with pytest.raises(TypeError):
        assert zm1 != None  # noqa: E711
    assert zm1 is not None


def test_zrb_zone_set_save_without_render():
    """(ref: test_zone_monitor.py:499-523)"""
    zone_set = ZoneSet()
    zone_set.sensor_to_body_transform = np.eye(4)
    zone_0 = Zone()
    zone_0.point_count = 1
    zone_0.frame_count = 1
    zone_0.mode = ZoneMode.OCCUPANCY
    zone_0.stl = Stl(os.path.join(DATA_DIR, "0.stl"))
    zone_0.stl.coordinate_frame = CoordinateFrame.BODY
    zone_set.zones = {0: zone_0}
    assert not any(
        zone.zrb
        for zone in ZoneSet(
            zone_set.to_zip_blob(ZoneSetOutputFilter.STL_AND_ZRB)
        ).zones.values()
    )
    zone_set.render(SensorInfo(open(PCAP_JSON).read()))
    assert all(zone.zrb for zone in zone_set.zones.values())


def test_saving_preserves_stl_filename():
    """(ref: test_zone_monitor.py:526-543)"""
    zone_set = ZoneSet()
    zone_set.sensor_to_body_transform = np.eye(4)
    zone = Zone()
    zone.point_count = 1
    zone.frame_count = 1
    zone.mode = ZoneMode.OCCUPANCY
    zone.stl = Stl(os.path.join(DATA_DIR, "ascii.stl"))
    zone.stl.coordinate_frame = CoordinateFrame.BODY
    zone_set.zones = {0: zone}
    metadata = json.loads(zone_set.to_json(ZoneSetOutputFilter.STL))
    assert metadata["zones"]["0"]["stl"] == {
        "file_name": "ascii.stl",
        "coordinate_frame": "BODY",
        "hash": zone.stl.hash,
    }
    zone_set_2 = ZoneSet(zone_set.to_zip_blob(ZoneSetOutputFilter.STL))
    assert zone_set_2.zones[0].stl.filename == "ascii.stl"


def test_labels():
    """(ref: test_zone_monitor.py:546-560)"""
    zone_set = ZoneSet()
    zone_set.label = "abc"
    zone_set.sensor_to_body_transform = np.eye(4)
    zone = Zone()
    zone.point_count = 1
    zone.frame_count = 1
    zone.mode = ZoneMode.OCCUPANCY
    zone.label = "def"
    stl = Stl(os.path.join(DATA_DIR, "0.stl"))
    stl.coordinate_frame = CoordinateFrame.BODY
    zone.stl = stl
    zone_set.zones = {0: zone}
    zone_set_json = json.loads(zone_set.to_json(ZoneSetOutputFilter.STL))
    assert zone_set_json["label"] == zone_set.label
    assert zone_set_json["zones"]["0"]["label"] == "def"


def test_filename_case(tmp_path):
    """Archive entry '0.STL' satisfies metadata name '0.stl'
    (ref: test_zone_monitor.py:563-593)."""
    zip_filename = tmp_path / "test_case_zip.zip"
    stl_path = os.path.join(DATA_DIR, "0.stl")
    with zipfile.ZipFile(zip_filename, "w") as zf:
        zf.write(stl_path, "0.STL")
        metadata = {
            "power_on_live_ids": [0],
            "sensor_to_body_transform": np.eye(4).flatten().tolist(),
            "version": {"file_naming": 1, "metadata": 1},
            "label": "",
            "zones": {
                "0": {
                    "label": "",
                    "frame_count": 1,
                    "mode": "OCCUPANCY",
                    "point_count": 1,
                    "stl": {
                        "file_name": "0.stl",
                        "coordinate_frame": "BODY",
                        "hash": Stl(stl_path).hash,
                    },
                }
            },
        }
        zf.writestr("metadata.json", json.dumps(metadata))
    ZoneSet(str(zip_filename))  # must not throw


def test_zone_states_dtype():
    """ZONE_STATES decodes as the reference's exact record dtype
    (ref: test_zone_monitor.py:595-632)."""
    source = open_source(os.path.join(DATA_DIR, "single_frame_zm.osf"))
    scan, = next(iter(source))
    expected_dtype = np.dtype((np.record, [
        ("live", "u1"),
        ("id", "u1"),
        ("error_flags", "u1"),
        ("trigger_type", "u1"),
        ("trigger_status", "u1"),
        ("triggered_frames", "<u4"),
        ("count", "<u4"),
        ("occlusion_count", "<u4"),
        ("invalid_count", "<u4"),
        ("max_count", "<u4"),
        ("min_range", "<u4"),
        ("max_range", "<u4"),
        ("mean_range", "<u4"),
    ]))
    zone_states = scan.field("ZONE_STATES")
    assert zone_states.dtype == expected_dtype
    zone_states.view(np.recarray)[0].live  # recarray attribute access

    emulated_zm = EmulatedZoneMon(source.sensor_info[0].zone_set)
    emulated_zm.calc_triggers(
        scan.field("RANGE"),
        np.zeros(scan.field("RANGE").shape, dtype=np.uint32))
    packet = emulated_zm.get_packet()
    assert packet.dtype == expected_dtype or \
        np.dtype(packet.dtype.fields) == np.dtype(expected_dtype.fields)
    packet[0].live  # recarray attribute access works


# ----------------------------------------------------- test_zrb.py ports

def test_client_rendered_zone_write_checks():
    """(ref: python/tests/test_zrb.py:8-18)"""
    with pytest.raises(RuntimeError,
                       match="Zrb::save: serial number not set"):
        zrb = Zrb()
        zrb.near_range_mm = np.zeros((4, 4), dtype=np.uint16)
        zrb.far_range_mm = np.zeros((4, 4), dtype=np.uint16)
        zrb.blob()
    with pytest.raises(RuntimeError,
                       match="Zrb::save: near image data missing"):
        zrb = Zrb()
        zrb.serial_number = 122247000785
        zrb.far_range_mm = np.zeros((4, 4), dtype=np.uint16)
        zrb.blob()


def test_client_rendered_zone_write_valid(tmp_path):
    """(ref: python/tests/test_zrb.py:21-59)"""
    sensor_info = SensorInfo(
        open(os.path.join(DATA_DIR, "785.json")).read())
    max_error = 4  # mm
    zrb = Zrb()
    zrb.serial_number = 122247000785
    zrb.near_range_mm = np.zeros((4, 4), dtype=np.uint32)
    zrb.near_range_mm[1, 1] = 1000
    zrb.near_range_mm[2, 2] = 2000
    zrb.far_range_mm = np.zeros((4, 4), dtype=np.uint32)
    zrb.far_range_mm[1, 1] = 3000
    zrb.far_range_mm[2, 2] = 3000
    zrb.beam_to_lidar_transform = sensor_info.beam_to_lidar_transform
    zrb.lidar_to_sensor_transform = sensor_info.lidar_to_sensor_transform
    zrb.sensor_to_body_transform = np.eye(4)
    blob = zrb.blob()
    zrb2 = Zrb(blob)
    assert np.allclose(zrb2.near_range_mm, zrb.near_range_mm,
                       atol=max_error)
    assert np.allclose(zrb2.far_range_mm, zrb.far_range_mm,
                       atol=max_error)
    assert zrb.stl_hash is None
    assert zrb2.stl_hash is None
    assert zrb.stl_hash == zrb2.stl_hash
    assert zrb.serial_number == zrb2.serial_number
    assert zrb.hash == zrb2.hash
    assert zrb.blob() == zrb2.blob()
    path = str(tmp_path / "z.zrb")
    zrb.save(path)
    zrb3 = Zrb(path)
    assert zrb3.blob() == zrb.blob()


def test_fail_zrb_zoneset_zrb_has_no_data():
    """(ref: python/tests/test_zrb.py:62-69)"""
    sensor_info = SensorInfo(open(PCAP_JSON).read())
    zrb = Zrb()
    zrb.serial_number = sensor_info.sn
    with pytest.raises(RuntimeError,
                       match="Zrb::save: near image data missing"):
        zrb.blob()
