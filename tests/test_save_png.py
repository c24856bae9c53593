"""`save x.png` per-field image series
(ref: plugins/source_save.py:454-520 source_save_png): one destaggered,
min-max-normalized 8-bit PNG per scan per field, named
{stem}_{sn}_{frame_id}_{field}.png."""

import glob
import os

import numpy as np
import pytest

from ouster_sdk_tpu import ChanField, open_source
from ouster_sdk_tpu.ops.destagger import destagger
from ouster_sdk_tpu.utils.png import decode as png_decode

PCAP = "/root/reference/tests/pcaps/OS-2-128-U1_v2.3.0_1024x10.pcap"


def _fixture_or_skip():
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    return PCAP


def test_cli_save_png_series(tmp_path):
    from click.testing import CliRunner

    from ouster_sdk_tpu.cli.core import cli

    out = str(tmp_path / "imgs.png")
    res = CliRunner().invoke(
        cli, ["source", _fixture_or_skip(), "save", out])
    assert res.exit_code == 0, res.output

    src = open_source(PCAP)
    info = src.sensor_info[0]
    scan = next(iter(src)).valid()[0]
    files = sorted(glob.glob(str(tmp_path / "imgs_*.png")))
    # one image per pixel field of the one complete scan
    pixel_fields = [f for f in scan.fields
                    if np.asarray(scan.field(f)).shape[:2]
                    == (info.h, info.w)]
    assert len(files) == len(pixel_fields), (files, pixel_fields)
    for f in files:
        base = os.path.basename(f)
        assert base.startswith(f"imgs_{info.sn}_{scan.frame_id}_")

    # spot-check RANGE: decoded PNG == destaggered min-max 8-bit image
    fr = [f for f in files if f.endswith("_RANGE.png")]
    assert len(fr) == 1
    img = png_decode(open(fr[0], "rb").read())[0]
    ref = destagger(info, scan.field(ChanField.RANGE))
    lo, hi = ref.min(), ref.max()
    want = ((ref.astype(np.float64) - lo) / float(hi - lo)
            * 255).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(img).reshape(want.shape),
                                  want)


def test_save_png_overwrite_guard(tmp_path):
    from ouster_sdk_tpu.io.save import save_scans

    src = open_source(_fixture_or_skip())
    sets = list(src)
    out = str(tmp_path / "x.png")
    n = save_scans(out, src.sensor_info, sets, overwrite=False)
    assert n >= 1
    with pytest.raises(FileExistsError, match="--overwrite"):
        save_scans(out, src.sensor_info, sets, overwrite=False)
    # overwrite allowed by default
    assert save_scans(out, src.sensor_info, sets) == n


def test_save_png_field_subset_and_constant_field(tmp_path):
    from ouster_sdk_tpu.io.save import save_scans

    src = open_source(_fixture_or_skip())
    sets = list(src)
    s = sets[0].valid()[0]
    s.field(ChanField.REFLECTIVITY)[:] = 7  # constant: normalize -> 0
    out = str(tmp_path / "sub.png")
    save_scans(out, src.sensor_info, sets,
               fields=["RANGE", "REFLECTIVITY"])
    files = sorted(glob.glob(str(tmp_path / "sub_*.png")))
    assert len(files) == 2
    refl = [f for f in files if f.endswith("_REFLECTIVITY.png")][0]
    img = np.asarray(png_decode(open(refl, "rb").read())[0])
    assert (img == 0).all()  # max == min -> zeros, like the reference
