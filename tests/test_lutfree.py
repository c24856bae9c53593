"""LUT-free Pallas projection vs the f64 LUT reference
(interpret mode on CPU)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ouster_sdk_tpu import ChanField
from ouster_sdk_tpu.io.frames import FrameReader
from ouster_sdk_tpu.ops.pallas_lutfree import FactorTables, \
    unpack_project_lutfree, unpack_project_lutfree_dd
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


def test_lutfree_dd_within_one_ulp_of_f64():
    """The dd variant must land within 1 f32 ulp of the f64 projection —
    the same contract as the LUT dd path (ref: cartesian.h:36-69)."""
    if not os.path.exists(PCAP):
        pytest.skip("fixture missing")
    fr = FrameReader(PCAP)
    fid, words, ts = next(iter(fr))
    tables = FactorTables(fr.info)
    xyz = np.asarray(unpack_project_lutfree_dd(
        jnp.asarray(words), tables, fr.plan, tile_w=128, interpret=True))
    xyz = np.moveaxis(xyz, 0, -1)

    rng = np.asarray(decode_frame(jnp.asarray(words),
                                  fr.plan)[ChanField.RANGE])
    ref = make_xyz_lut(fr.info)(rng)                        # f64 host path
    ulp = np.spacing(np.abs(ref).astype(np.float32)).astype(np.float64)
    err = np.abs(xyz.astype(np.float64) - ref)
    assert (err <= ulp + 1e-12).all(), \
        f"max ulp excess {(err / np.maximum(ulp, 1e-12)).max()}"
    # and it must be strictly tighter than the f32 variant on this frame
    xyz_f32 = np.asarray(unpack_project_lutfree(
        jnp.asarray(words), tables, fr.plan, tile_w=128, interpret=True))
    xyz_f32 = np.moveaxis(xyz_f32, 0, -1)
    assert err.max() < np.abs(xyz_f32.astype(np.float64) - ref).max()


def test_lutfree_dd_dual_both_returns_exact():
    """dual=True: one pixel-region fetch projects both returns; each must
    meet the 1-ulp contract against the f64 path."""
    from __graft_entry__ import _make_info, _synth_frame
    from ouster_sdk_tpu.ops.unpack import decode_frame as _decode, \
        make_decode_plan
    from ouster_sdk_tpu.ops.pallas_lutfree import unpack_project_lutfree_dd

    info = _make_info(w=512, h=128, dual=True)
    plan = make_decode_plan(info)
    frame = _synth_frame(info)
    tables = FactorTables(info)
    xyz, xyz2 = unpack_project_lutfree_dd(
        jnp.asarray(frame), tables, plan, tile_w=128, interpret=True,
        dual=True)
    dec = _decode(jnp.asarray(frame), plan)
    lut = make_xyz_lut(info)
    for name, got in (("RANGE", xyz), ("RANGE2", xyz2)):
        rng = np.asarray(dec[name])
        ref = lut(rng)
        got_np = np.moveaxis(np.asarray(got), 0, -1)
        ulp = np.spacing(np.abs(ref).astype(np.float32)).astype(np.float64)
        err = np.abs(got_np.astype(np.float64) - ref)
        assert (err <= ulp + 1e-12).all(), \
            f"{name}: max ulp excess {(err / np.maximum(ulp, 1e-12)).max()}"


def test_lutfree_rejects_df_sensors():
    from ouster_sdk_tpu import LidarMode, SensorInfo

    info = SensorInfo.from_default(LidarMode.from_string("512x10"))
    # simulate per-pixel angle tables (DF sensor)
    info.beam_azimuth_angles = [0.0] * (info.h * info.w)
    info.beam_altitude_angles = [0.0] * (info.h * info.w)
    with pytest.raises(ValueError):
        FactorTables(info)
