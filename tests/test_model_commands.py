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
