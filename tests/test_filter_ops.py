"""filter_field / filter_uv / filter_xyz scan ops + CLI `source ... filter`
(ref: python/src/ouster/sdk/core/scan_ops.py:47-190,
plugins/source.py:587-695 source_filter)."""

import os

import numpy as np
import pytest

from ouster_sdk_tpu import ChanField, LidarScan, ScanBatcher
from ouster_sdk_tpu.io.derived import filter_field, filter_uv, filter_xyz
from ouster_sdk_tpu.io.pcap_source import PcapPacketSource
from ouster_sdk_tpu.ops.destagger import destagger
from ouster_sdk_tpu.ops.xyzlut import make_xyz_lut

PCAP = "/root/reference/tests/pcaps/OS-2-128-U1_v2.3.0_1024x10.pcap"


@pytest.fixture(scope="module")
def scan():
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    src = PcapPacketSource(PCAP)
    info = src.sensor_info[0]
    b, s = ScanBatcher(info), LidarScan(info)
    for _, p in src:
        if p.type().value == "Lidar" and b(p, s):
            break
    src.close()
    return s


def _clone(scan):
    import copy

    return copy.deepcopy(scan)


def test_filter_field_band(scan):
    s = _clone(scan)
    refl = s.field(ChanField.REFLECTIVITY).copy()
    rng = s.field(ChanField.RANGE).copy()
    hit = (refl >= 10) & (refl <= 100)
    filter_field(s, ChanField.REFLECTIVITY, 10, 100,
                 filtered_fields=[ChanField.RANGE])
    assert (s.field(ChanField.RANGE)[hit] == 0).all()
    np.testing.assert_array_equal(s.field(ChanField.RANGE)[~hit],
                                  rng[~hit])
    # untargeted field untouched
    np.testing.assert_array_equal(s.field(ChanField.SIGNAL),
                                  scan.field(ChanField.SIGNAL))


def test_filter_field_default_targets_all_pixel_fields(scan):
    s = _clone(scan)
    hit = (s.field(ChanField.NEAR_IR) >= 0) & \
        (s.field(ChanField.NEAR_IR) <= 2**30)
    filter_field(s, ChanField.NEAR_IR, 0, 2**30)
    for name in (ChanField.RANGE, ChanField.SIGNAL,
                 ChanField.REFLECTIVITY):
        assert (s.field(name)[hit] == 0).all()


def test_filter_uv_u_rows(scan):
    s = _clone(scan)
    filter_uv(s, "u", 0, 8, filtered_fields=[ChanField.RANGE])
    assert (s.field(ChanField.RANGE)[0:8] == 0).all()
    np.testing.assert_array_equal(s.field(ChanField.RANGE)[8:],
                                  scan.field(ChanField.RANGE)[8:])


def test_filter_uv_v_destaggered(scan):
    """'v' filters the DESTAGGERED image (ref: scan_ops.py:120-128)."""
    s = _clone(scan)
    filter_uv(s, "v", 100, 200, filtered_fields=[ChanField.RANGE])
    img = destagger(s.sensor_info, s.field(ChanField.RANGE))
    assert (img[:, 100:200] == 0).all()
    ref_img = destagger(scan.sensor_info, scan.field(ChanField.RANGE))
    np.testing.assert_array_equal(img[:, 200:], ref_img[:, 200:])


def test_filter_uv_fractional(scan):
    s = _clone(scan)
    filter_uv(s, "u", 0.0, 0.5, filtered_fields=[ChanField.RANGE])
    assert (s.field(ChanField.RANGE)[: scan.h // 2] == 0).all()
    assert s.field(ChanField.RANGE)[scan.h // 2:].any()


def test_filter_xyz_z_band(scan):
    s = _clone(scan)
    lut = make_xyz_lut(s.sensor_info)
    pts = lut(scan.field(ChanField.RANGE))
    hit = (pts[:, :, 2] >= -1.0) & (pts[:, :, 2] <= 1.0)
    filter_xyz(s, lut, 2, -1.0, 1.0)
    assert (s.field(ChanField.RANGE)[hit] == 0).all()
    keep = ~hit & (scan.field(ChanField.RANGE) != 0)
    np.testing.assert_array_equal(s.field(ChanField.RANGE)[keep],
                                  scan.field(ChanField.RANGE)[keep])


def test_filter_xyz_invalid_value(scan):
    s = _clone(scan)
    lut = make_xyz_lut(s.sensor_info)
    filter_xyz(s, lut, 0, -5.0, 5.0, invalid=7,
               filtered_fields=[ChanField.REFLECTIVITY])
    pts = lut(scan.field(ChanField.RANGE))
    hit = (pts[:, :, 0] >= -5.0) & (pts[:, :, 0] <= 5.0)
    assert (s.field(ChanField.REFLECTIVITY)[hit] == 7).all()


def test_cli_filter_chain(tmp_path):
    """CLI: filter REFLECTIVITY band + filter U rows compose."""
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    from click.testing import CliRunner

    from ouster_sdk_tpu.cli import cli

    r = CliRunner().invoke(cli, [
        "source", PCAP, "slice", ":1",
        "filter", "REFLECTIVITY", "0:50",
        "filter", "U", ":8",
        "stats"])
    assert r.exit_code == 0, r.output
    assert "frame_id" in r.output


def test_cli_filter_xyz_units(tmp_path):
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    from click.testing import CliRunner

    from ouster_sdk_tpu.cli import cli

    r = CliRunner().invoke(cli, [
        "source", PCAP, "slice", ":1",
        "filter", "--coord-frame", "SENSOR", "Z", "-1m:1m",
        "stats"])
    assert r.exit_code == 0, r.output


def test_cli_pcap_info():
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    from click.testing import CliRunner

    from ouster_sdk_tpu.cli import cli

    r = CliRunner().invoke(cli, ["source", PCAP, "pcap_info"])
    assert r.exit_code == 0, r.output
    assert "UDP Streams:" in r.output
    assert "24832" in r.output  # the 1024x10 lidar packet size


def test_cli_bag_info():
    bag = "/root/reference/tests/bags/512x10_raw.bag"
    if not os.path.exists(bag):
        pytest.skip("fixture missing")
    from click.testing import CliRunner

    from ouster_sdk_tpu.cli import cli

    r = CliRunner().invoke(cli, ["source", bag, "bag_info"])
    assert r.exit_code == 0, r.output
    assert "lidar_packets" in r.output
    assert "Message Count:" in r.output


def test_cli_osf_dump():
    osf = "/root/reference/tests/osfs/single_scan_016.osf"
    if not os.path.exists(osf):
        pytest.skip("fixture missing")
    import json as _json

    from click.testing import CliRunner

    from ouster_sdk_tpu.cli import cli

    r = CliRunner().invoke(cli, ["osf", "dump", osf])
    assert r.exit_code == 0, r.output
    out = _json.loads(r.output)
    types = [e["type"] for e in out["entries"].values()]
    assert "ouster/v1/os_sensor/LidarSensor" in types
    sensor = [e for e in out["entries"].values()
              if e["type"].endswith("LidarSensor")][0]
    assert "beam_intrinsics" in sensor["metadata"]
    r2 = CliRunner().invoke(cli, ["osf", "dump", "-s", osf])
    assert r2.exit_code == 0 and "beam_intrinsics" not in r2.output


def test_cli_save_cloud_options(tmp_path):
    """save .ply with key field, z band, decimation, pts-per-file split
    (ref: source_save.py:371-460)."""
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    from click.testing import CliRunner

    from ouster_sdk_tpu.cli import cli
    from ouster_sdk_tpu.io.cloud_io import read_pointcloud

    out = str(tmp_path / "c.ply")
    r = CliRunner().invoke(cli, [
        "source", PCAP, "slice", ":1",
        "save", "--field", "REFLECTIVITY", "--min-z", "-2", "--max-z", "2",
        out])
    assert r.exit_code == 0, r.output
    pts, attrs = read_pointcloud(out)
    assert len(pts) > 1000
    assert (pts[:, 2] >= -2 - 1e-6).all() and (pts[:, 2] <= 2 + 1e-6).all()
    assert "reflectivity" in attrs

    out2 = str(tmp_path / "d.ply")
    r = CliRunner().invoke(cli, [
        "source", PCAP, "slice", ":1",
        "save", "--decimate", "--voxel-size", "2.0", "--field", "NONE",
        out2])
    assert r.exit_code == 0, r.output
    pts2, attrs2 = read_pointcloud(out2)
    assert 0 < len(pts2) < len(pts) and not attrs2

    # pts-per-file split rolls files (fixture has one frame; feed it
    # twice through the API)
    import glob

    from ouster_sdk_tpu.io.save import save_scans
    from ouster_sdk_tpu.io.sources import open_source

    src = open_source(PCAP)
    ls_set = next(iter(src))
    out3 = str(tmp_path / "e.ply")
    save_scans(out3, src.sensor_info, [ls_set, ls_set],
               cloud_opts=dict(pts_per_file=10000))
    files = sorted(glob.glob(str(tmp_path / "e-*.ply")))
    assert len(files) >= 2


def test_cli_slam_dump_map(tmp_path):
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    from click.testing import CliRunner

    from ouster_sdk_tpu.cli import cli
    from ouster_sdk_tpu.io.cloud_io import read_pointcloud

    out = str(tmp_path / "map.ply")
    r = CliRunner().invoke(cli, [
        "source", PCAP, "slam", "--deskew-method", "none",
        "--dump-map", out])
    assert r.exit_code == 0, r.output
    pts, _ = read_pointcloud(out)
    assert len(pts) > 100


def test_cli_multi_consumer_lockstep(tmp_path):
    """Two chained consumers (save + stats) share one stream
    (CoupledTee semantics, ref: source_util.py:85)."""
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    from click.testing import CliRunner

    from ouster_sdk_tpu.cli import cli

    out = str(tmp_path / "t.osf")
    r = CliRunner().invoke(cli, [
        "source", PCAP, "slice", ":1", "save", out, "stats"])
    assert r.exit_code == 0, r.output
    assert "frame_id" in r.output and "wrote" in r.output
    assert os.path.getsize(out) > 10000
