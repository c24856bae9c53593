"""CLI, viz, save and point-cloud IO tests
(ref: python/tests/test_cli*.py, test_viz_*.py)."""

import os

import numpy as np
import pytest
from click.testing import CliRunner

from ouster_sdk_tpu.cli.core import cli

PCAP = "/root/reference/tests/pcaps/OS-2-128-U1_v2.3.0_1024x10.pcap"
OSF = "/root/reference/tests/osfs/single_scan_016.osf"


def _runner():
    return CliRunner()


@pytest.mark.skipif(not os.path.exists(PCAP), reason="fixture missing")
def test_cli_source_info():
    res = _runner().invoke(cli, ["source", PCAP, "info"])
    assert res.exit_code == 0, res.output
    assert "OS-2-128" in res.output
    assert "RNG19_RFL8_SIG16_NIR16" in res.output


@pytest.mark.skipif(not os.path.exists(PCAP), reason="fixture missing")
def test_cli_source_stats_slice():
    res = _runner().invoke(cli, ["source", PCAP, "slice", "0:1", "stats"])
    assert res.exit_code == 0, res.output
    assert "total scan sets: 1" in res.output
    assert "complete=True" in res.output


@pytest.mark.skipif(not os.path.exists(OSF), reason="fixture missing")
def test_cli_save_roundtrip(tmp_path):
    out = str(tmp_path / "out.osf")
    res = _runner().invoke(cli, ["source", OSF, "save", out])
    assert res.exit_code == 0, res.output
    from ouster_sdk_tpu.io.osf import Reader

    r = Reader(out)
    assert sum(1 for m in r.messages() if m.is_lidar_scan()) == 1


@pytest.mark.skipif(not os.path.exists(OSF), reason="fixture missing")
def test_cli_clip_and_save_csv(tmp_path):
    out = str(tmp_path / "pts.csv")
    res = _runner().invoke(
        cli, ["source", OSF, "clip", "--min-range", "2",
              "--max-range", "50", "save", out])
    assert res.exit_code == 0, res.output
    files = [f for f in os.listdir(tmp_path) if f.endswith(".csv")]
    assert files
    data = np.loadtxt(tmp_path / files[0], delimiter=",", skiprows=1)
    d = np.linalg.norm(data[:, :3], axis=1)
    assert d.max() <= 50.5


@pytest.mark.skipif(not os.path.exists(OSF), reason="fixture missing")
def test_cli_viz_snapshot(tmp_path):
    out = str(tmp_path / "snap.png")
    res = _runner().invoke(cli, ["source", OSF, "viz", "--out", out,
                                 "--every", "1"])
    assert res.exit_code == 0, res.output
    pngs = [f for f in os.listdir(tmp_path) if f.endswith(".png")]
    assert pngs
    from ouster_sdk_tpu.utils import png as P

    img, ctype, depth = P.decode(open(tmp_path / pngs[0], "rb").read())
    assert img.shape[2] == 3
    assert img.any(), "rendered frame is all black"


@pytest.mark.skipif(not os.path.exists(PCAP), reason="fixture missing")
def test_cli_benchmark():
    res = _runner().invoke(cli, ["util", "benchmark", PCAP,
                                 "--frames", "1"])
    assert res.exit_code == 0, res.output
    assert '"cartesian"' in res.output and '"per_frame"' in res.output


def test_cloud_io_roundtrips(tmp_path):
    from ouster_sdk_tpu.io.cloud_io import read_pointcloud, write_pointcloud

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    refl = rng.integers(0, 255, 100).astype(np.uint8)

    for kind in ("ply", "pcd", "csv", "las"):
        p = str(tmp_path / f"cloud.{kind}")
        write_pointcloud(p, pts, attributes={"reflectivity": refl})
        back, attrs = read_pointcloud(p)
        assert back.shape == (100, 3)
        np.testing.assert_allclose(back, pts, atol=2e-3), kind

    # ascii PLY as well
    p = str(tmp_path / "cloud_ascii.ply")
    write_pointcloud(p, pts, binary=False)
    back, _ = read_pointcloud(p)
    np.testing.assert_allclose(back, pts, atol=1e-4)


def test_derived_transforms():
    from ouster_sdk_tpu import ChanField, LidarMode, SensorInfo
    from ouster_sdk_tpu.core.lidar_scan import LidarScan
    from ouster_sdk_tpu.io.derived import clip_scan, mask_scan, reduce_scan

    info = SensorInfo.from_default(LidarMode.from_string("512x10"))
    scan = LidarScan(info)
    rng = scan.field(ChanField.RANGE)
    rng[:] = 30_000  # 30 m
    rng[0, 0] = 1_000  # 1 m

    clip_scan(scan, 5.0, 100.0)
    assert rng[0, 0] == 0 and rng[1, 1] == 30_000

    mask = np.ones((scan.h, scan.w), bool)
    mask[:, :10] = False
    mask_scan(scan, mask)
    assert not rng[:, :10].any() and rng[:, 10:].any()

    small = reduce_scan(scan, 16)
    assert small.h == 16
    assert small.field(ChanField.RANGE).shape == (16, scan.w)
    assert small.sensor_info.format.pixels_per_column == 16
    with pytest.raises(ValueError):
        reduce_scan(scan, 7)


@pytest.mark.skipif(not os.path.exists(PCAP), reason="fixture missing")
def test_cli_testing_group(tmp_path):
    """testing synthesize -> stats -> digest save/check
    (ref: plugins/testing.py)."""
    from ouster_sdk_tpu.cli import extra  # noqa: F401  (registers groups)

    r = _runner()
    synth = str(tmp_path / "synth.pcap")
    res = r.invoke(cli, ["testing", "synthesize", synth,
                         "--profile", "RNG15_RFL8_NIR8",
                         "--mode", "512x10", "--frames", "1"])
    assert res.exit_code == 0, res.output
    assert os.path.exists(synth)
    assert os.path.exists(str(tmp_path / "synth.json"))

    res = r.invoke(cli, ["source", synth, "stats"])
    assert res.exit_code == 0, res.output
    assert "complete=True" in res.output

    res = r.invoke(cli, ["testing", "digest", synth, "-s"])
    assert res.exit_code == 0, res.output
    digest = str(tmp_path / "synth_digest.json")
    assert os.path.exists(digest)
    res = r.invoke(cli, ["testing", "digest", synth, "-c", digest])
    assert res.exit_code == 0, res.output
    assert "digest OK" in res.output

    res = r.invoke(cli, ["testing", "time", PCAP])
    assert res.exit_code == 0, res.output
    assert "projected" in res.output


@pytest.mark.skipif(not os.path.exists(PCAP), reason="fixture missing")
def test_cli_pose_optimize_requires_osf():
    from ouster_sdk_tpu.cli import extra  # noqa: F401

    res = _runner().invoke(cli, ["source", PCAP, "pose_optimize",
                                 "/tmp/never.osf"])
    assert res.exit_code != 0
    assert "requires an OSF source" in res.output


def test_cli_slice_time_units():
    """slice accepts time-unit specs (ref: plugins/source.py
    extract_slice_indices: 10s:20s:2 style)."""
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    res = _runner().invoke(cli, ["source", PCAP, "slice", "0s:100s",
                                 "stats"])
    assert res.exit_code == 0, res.output
    assert "total scan sets: 1" in res.output
    res = _runner().invoke(cli, ["source", PCAP, "slice", "99s:100s",
                                 "stats"])
    assert res.exit_code == 0, res.output
    assert "total scan sets: 0" in res.output
    res = _runner().invoke(cli, ["source", PCAP, "slice", "bogus", "stats"])
    assert res.exit_code != 0
    res = _runner().invoke(cli, ["source", PCAP, "slice", "5:2", "stats"])
    assert res.exit_code != 0  # stop must exceed start


def test_cli_save_raw_roundtrip(tmp_path):
    """save_raw preserves original packets (incl. imu) and writes the
    metadata json beside the pcap (ref: source_save.py source_save_raw)."""
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    out = str(tmp_path / "raw.pcap")
    res = _runner().invoke(cli, ["source", PCAP, "save_raw", out])
    assert res.exit_code == 0, res.output
    assert os.path.exists(out)
    assert os.path.exists(str(tmp_path / "raw.json"))

    from ouster_sdk_tpu.io.sources import open_packet_source

    orig = [(p.type().value, bytes(p.buf))
            for _, p in open_packet_source(PCAP)]
    back = [(p.type().value, bytes(p.buf))
            for _, p in open_packet_source(out)]
    assert back == orig  # byte-for-byte, lidar AND imu packets

    out_bag = str(tmp_path / "raw.db3")
    res = _runner().invoke(cli, ["source", PCAP, "save_raw", out_bag])
    assert res.exit_code == 0, res.output
    back2 = [(p.type().value, bytes(p.buf))
             for _, p in open_packet_source(out_bag)]
    assert back2 == orig
