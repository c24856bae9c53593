"""model_viz / model_save CLI commands
(ref: plugins/source.py:1039 model_viz, :1082 model_save)."""

import os

import numpy as np
import pytest
from click.testing import CliRunner

from ouster_sdk_tpu.cli import cli
from ouster_sdk_tpu.io.cloud_io import read_pointcloud, write_pointcloud


@pytest.fixture()
def ply(tmp_path):
    pts = np.random.default_rng(0).normal(0, 3, (2000, 3)).astype(np.float32)
    p = str(tmp_path / "m.ply")
    write_pointcloud(p, pts)
    return p


def test_model_save_downsample(ply, tmp_path):
    out = str(tmp_path / "ds.ply")
    r = CliRunner().invoke(cli, [
        "source", ply, "model_save", "--downsample", "1.0", out])
    assert r.exit_code == 0, r.output
    pts, _ = read_pointcloud(out)
    src, _ = read_pointcloud(ply)
    assert 0 < len(pts) < len(src)


def test_model_save_refuses_overwrite(ply, tmp_path):
    out = str(tmp_path / "ds.ply")
    open(out, "w").write("x")
    r = CliRunner().invoke(cli, ["source", ply, "model_save", out])
    assert r.exit_code != 0
    r = CliRunner().invoke(cli, [
        "source", ply, "model_save", "--overwrite", out])
    assert r.exit_code == 0, r.output


def test_model_viz_snapshot(ply, tmp_path):
    out = str(tmp_path / "m.png")
    r = CliRunner().invoke(cli, [
        "source", ply, "model_viz", "--axes", "-o", out])
    assert r.exit_code == 0, r.output
    assert os.path.getsize(out) > 1000


def test_model_viz_stl(tmp_path):
    from ouster_sdk_tpu.zone.zone import save_stl

    tri = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                    [[0, 0, 1], [1, 0, 1], [0, 1, 1]]], np.float32)
    p = str(tmp_path / "m.stl")
    save_stl(p, tri)
    out = str(tmp_path / "m.png")
    r = CliRunner().invoke(cli, ["source", p, "model_viz", "-o", out])
    assert r.exit_code == 0, r.output
    assert os.path.getsize(out) > 500


def test_html_export(ply, tmp_path):
    """Self-contained interactive WebGL viewer (viz/html.py)."""
    out = str(tmp_path / "v.html")
    r = CliRunner().invoke(cli, ["source", ply, "model_viz", "-o", out])
    assert r.exit_code == 0, r.output
    html = open(out).read()
    # structural checks: embedded data decodes to the right sizes and the
    # template left no unfilled placeholders
    import base64
    import re

    assert not re.search(r"\{[a-z_]+\}", html.split("<script>")[0])
    pos_b64 = re.search(r'POS_B64 = "([^"]*)"', html).group(1)
    col_b64 = re.search(r'COL_B64 = "([^"]*)"', html).group(1)
    n = int(re.search(r"const N = (\d+)", html).group(1))
    pos = np.frombuffer(base64.b64decode(pos_b64), np.float32)
    col = np.frombuffer(base64.b64decode(col_b64), np.uint8)
    assert pos.size == n * 3 and col.size == n * 3 and n == 2000
    src, _ = read_pointcloud(ply)
    np.testing.assert_allclose(pos.reshape(-1, 3), src, atol=1e-6)


def test_viz_html_from_pcap(tmp_path):
    pcap = "/root/reference/tests/pcaps/OS-2-128-U1_v2.3.0_1024x10.pcap"
    if not os.path.exists(pcap):
        import pytest

        pytest.skip("fixture missing")
    out = str(tmp_path / "scan.html")
    r = CliRunner().invoke(cli, ["source", pcap, "viz", "--html", out])
    assert r.exit_code == 0, r.output
    assert os.path.getsize(out) > 100_000


def test_util_system_info():
    runner = CliRunner()
    from ouster_sdk_tpu.cli.core import cli

    res = runner.invoke(cli, ["util", "system-info"])
    assert res.exit_code == 0, res.output
    import json as _json

    blob = _json.loads(res.output)
    assert set(blob) >= {"platform", "cpuinfo", "packages"}
    assert len(blob["platform"]["node"]) == 7  # md5-hashed host id
    assert "ouster-sdk-tpu" in blob["packages"]


def test_util_validate_metadata():
    runner = CliRunner()
    from ouster_sdk_tpu.cli.core import cli

    good = "/root/reference/tests/metadata/3_0_1_os-122246000293-128.json"
    res = runner.invoke(cli, ["util", "validate-metadata", good])
    assert res.exit_code == 0, res.output

    bad = ("/root/reference/tests/metadata/malformed/"
           "complete_but_all_zeros_legacy.json")
    res = runner.invoke(cli, ["util", "validate-metadata", bad])
    assert res.exit_code == 0, res.output
    assert "ISSUES:" in res.output
