"""The importable examples package runs end-to-end on reference fixtures
(ref: python/src/ouster/sdk/examples/*)."""

import glob
import os

import numpy as np
import pytest

PCAP = "/root/reference/tests/pcaps/OS-2-128-U1_v2.3.0_1024x10.pcap"
OSFS = sorted(glob.glob("/root/reference/tests/osfs/*.osf"))


@pytest.fixture(scope="module")
def pcap():
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    return PCAP


def test_pcap_examples(pcap, tmp_path):
    from ouster_sdk_tpu.examples.pcap import (pcap_3d_one_scan,
                                              pcap_query_scan,
                                              pcap_to_csv, pcap_to_ply)
    from ouster_sdk_tpu.io.cloud_io import read_pointcloud

    pts = pcap_3d_one_scan(pcap)
    assert pts.shape[1] == 3 and len(pts) > 100_000
    ply = pcap_to_ply(pcap, 0, str(tmp_path))
    back, attrs = read_pointcloud(ply)
    np.testing.assert_allclose(back, pts, atol=1e-4)
    assert "reflectivity" in attrs
    csv = pcap_to_csv(pcap, 0, str(tmp_path))
    assert os.path.getsize(csv) > 1000
    pcap_query_scan(pcap)


def test_osf_examples(tmp_path):
    if not OSFS:
        pytest.skip("fixture missing")
    from ouster_sdk_tpu.examples.osf import (osf_get_sensors_info,
                                             osf_read_scans,
                                             osf_slice_scans)
    from ouster_sdk_tpu.io.osf import Reader

    osf_get_sensors_info(OSFS[0])
    out = osf_slice_scans(OSFS[0], str(tmp_path / "sliced.osf"))
    r = Reader(out)
    scans = [m.decode() for m in r.messages() if m.is_lidar_scan()]
    assert scans and set(scans[0].fields) == {"RANGE", "REFLECTIVITY"}
    r.close()
    osf_read_scans(out)


def test_viz_and_colormap_examples(pcap, tmp_path):
    from ouster_sdk_tpu.examples.colormaps import colormap_strip
    from ouster_sdk_tpu.examples.viz import viz_scene

    p1 = viz_scene(str(tmp_path / "scene.png"))
    p2 = colormap_strip(pcap, str(tmp_path / "cms.png"))
    assert os.path.getsize(p1) > 1000 and os.path.getsize(p2) > 1000


def test_zone_monitor_example(pcap, capsys):
    from ouster_sdk_tpu.examples.zone_monitor_example import \
        zone_monitor_example

    zone_monitor_example(pcap)
    outp = capsys.readouterr().out
    assert "points inside zone" in outp


def test_lidar_scan_example_and_add_field_overloads(pcap):
    from ouster_sdk_tpu.core.metadata import sensor_info_from_metadata
    from ouster_sdk_tpu.examples.lidar_scan import lidar_scan_example

    info = sensor_info_from_metadata(
        open(pcap.replace(".pcap", ".json")).read())
    scan = lidar_scan_example(info)
    assert float(scan.field("MY_CUSTOM")[0, 0]) == 42.0
    # reference overloads (ref: client.pyi add_field)
    scan.add_field("F2", dtype=np.float64)
    assert scan.field("F2").shape == (scan.h, scan.w)
    from ouster_sdk_tpu.core.field import FieldClass

    scan.add_field("PER_COL", np.zeros((scan.w, 2)),
                   FieldClass.COLUMN_FIELD)
    assert scan.field("PER_COL").shape == (scan.w, 2)


def test_single_source_indexing(pcap):
    """Singler random access on an indexed parent
    (ref: scan_source.cpp Singler)."""
    from ouster_sdk_tpu import open_source

    src = open_source(pcap, sensor_idx=0, index=True)
    assert src.is_indexed
    scan = src[0]
    assert scan.complete()
    with pytest.raises(IndexError):
        src[len(src) + 5]


def test_event_and_zone_states_examples(pcap, capsys):
    from ouster_sdk_tpu.examples.viz_image_events import viz_image_events
    from ouster_sdk_tpu.examples.zone_monitor_zone_states_example import \
        zone_states_example

    clicks = viz_image_events("/tmp/ev_example.png")
    assert clicks and clicks[0][2]   # center click lands inside
    zone_states_example(pcap, 2)
    assert "zone 1" in capsys.readouterr().out


def test_reference_projection_matches_xyzlut(pcap):
    """The from-the-manual example math agrees with the production
    XYZLut path (ref: examples/reference.py's role as the auditable
    ground truth)."""
    from ouster_sdk_tpu import XYZLut, destagger, open_source
    from ouster_sdk_tpu.examples import reference as ref

    src = open_source(pcap, sensor_idx=0)
    info = src.sensor_info[0]
    scan = next(iter(src))

    xyz = XYZLut(info)(scan.field("RANGE"))
    manual = ref.xyz_proj_beam_to_sensor_transform(info, scan)
    assert np.allclose(manual, xyz, atol=1e-8)

    legacy = ref.xyz_proj_origin_to_origin_mm(info, scan)
    # legacy scalar-offset manual formula: same geometry to ~cm wherever
    # a return exists (beam_to_lidar differs from the scalar by design)
    valid = scan.field("RANGE") > 0
    assert np.linalg.norm((legacy - xyz)[valid], axis=-1).max() < 0.05

    f = scan.field("REFLECTIVITY").astype(np.float64)
    assert np.array_equal(
        ref.destagger(info.format.pixel_shift_by_row, f),
        destagger(info, f))


def test_zone_emulation_example(pcap, tmp_path):
    """The importable zone-emulation example runs end-to-end from a
    ZoneSet zip and writes the emulated fields back into each scan."""
    from ouster_sdk_tpu.examples.zone_monitor_emulation_example import \
        emulate
    from ouster_sdk_tpu.zone import Zone, ZoneSet

    import numpy as np

    zs = ZoneSet([Zone.box(1, (5, 0, 0), (4, 4, 4))],
                 sensor_to_body_transform=np.eye(4))
    zip_path = tmp_path / "zones.zip"
    zip_path.write_bytes(zs.to_zip_blob())

    out = list(emulate(pcap, str(zip_path), max_scans=1))
    assert out
    scan, triggers = out[0]
    assert scan.has_field("ZONE_OCCUPANCY")
    assert scan.field("ZONE_STATES").shape == (16,)
    assert scan.field("ZONE_PACKET_TIMESTAMP")[0] > 0
    assert triggers and triggers[0][0] == 1


def test_open3d_example_import_gated():
    """The module imports without open3d; the gate raises with install
    guidance only when open3d-specific work is requested."""
    import importlib

    mod = importlib.import_module(
        "ouster_sdk_tpu.examples.open3d_example")
    try:
        import open3d  # type: ignore  # noqa: F401
    except ModuleNotFoundError:
        with pytest.raises(ModuleNotFoundError, match="open3d"):
            mod.require_open3d()
