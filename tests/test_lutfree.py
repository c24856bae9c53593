"""LUT-free Pallas projection vs the f64 LUT reference
(interpret mode on CPU)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ouster_sdk_tpu import ChanField
from ouster_sdk_tpu.io.frames import FrameReader
from ouster_sdk_tpu.ops.pallas_lutfree import FactorTables, \
    unpack_project_lutfree
from ouster_sdk_tpu.ops.unpack import decode_frame
from ouster_sdk_tpu.ops.xyzlut import make_xyz_lut

PCAP = "/root/reference/tests/pcaps/OS-2-128-U1_v2.3.0_1024x10.pcap"


def test_lutfree_matches_f64_lut():
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    fr = FrameReader(PCAP)
    fid, words, ts = next(iter(fr))
    tables = FactorTables(fr.info)
    xyz = np.asarray(unpack_project_lutfree(
        jnp.asarray(words), tables, fr.plan, tile_w=128, interpret=True))
    xyz = np.moveaxis(xyz, 0, -1)

    rng = np.asarray(decode_frame(jnp.asarray(words),
                                  fr.plan)[ChanField.RANGE])
    ref = make_xyz_lut(fr.info)(rng)
    err = np.abs(xyz - ref)
    # f32 budget: ~r * 3e-7 (in-kernel trig-free synthesis)
    r_m = rng.astype(np.float64)[..., None] * 1e-3
    bound = np.maximum(3e-7 * np.maximum(r_m, 1.0) * 2, 2e-6)
    assert (err <= bound).all(), \
        f"max {err.max()}, worst rel {(err / np.maximum(r_m, 1e-9)).max()}"


def test_lutfree_rejects_df_sensors():
    from ouster_sdk_tpu import LidarMode, SensorInfo

    info = SensorInfo.from_default(LidarMode.from_string("512x10"))
    # simulate per-pixel angle tables (DF sensor)
    info.beam_azimuth_angles = [0.0] * (info.h * info.w)
    info.beam_altitude_angles = [0.0] * (info.h * info.w)
    with pytest.raises(ValueError):
        FactorTables(info)
