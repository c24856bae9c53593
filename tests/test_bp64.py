"""BP64 wire codec (ops/bp64.py, native onat_bp64_encode,
FrameReader.iter_bp64_chunks): lossless roundtrip on every input class,
native == numpy encoder bytes, and XYZ bit-equality with the packed and
planar stagings through the full pcap -> device pipeline."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from ouster_sdk_tpu.ops.bp64 import (  # noqa: E402
    BLOCK,
    bp64_decode_jnp,
    bp64_decode_numpy,
    bp64_encode_numpy,
)


def _cases():
    rng = np.random.default_rng(0)
    random = rng.integers(0, 1 << 19, size=(2, 16, 256), dtype=np.uint32)
    base = (5000 + 3000 * np.sin(np.linspace(0, 6, 256)))[None, None, :] \
        + np.linspace(0, 200, 16)[None, :, None]
    realistic = (base + rng.normal(0, 4, size=(2, 16, 256))).astype(
        np.uint32)
    realistic[rng.random((2, 16, 256)) < 0.1] = 0
    edge = realistic.copy()
    edge[0, 0, :BLOCK] = 0                      # all-dropout block
    edge[0, 1, :] = 777                          # constant row
    sparse = np.zeros((1, 1, 64), np.uint32)
    sparse[0, 0, ::7] = rng.integers(1, 1 << 19, 10).astype(np.uint32)
    return {
        "random": (random, 256),
        "realistic": (realistic, 256),
        "edge": (edge, 256),
        "constant": (np.full((1, 4, 128), 9, np.uint32), 128),
        "all_zero": (np.zeros((1, 4, 128), np.uint32), 128),
        "sparse": (sparse, 64),
        "max_vals": (np.full((1, 2, 64), (1 << 19) - 1, np.uint32), 64),
    }


@pytest.mark.parametrize("name", sorted(_cases()))
def test_roundtrip_numpy_and_jax(name):
    v, w = _cases()[name]
    pay, wid, anc = bp64_encode_numpy(v, 19)
    assert (bp64_decode_numpy(pay, wid, anc, w) == v).all()
    payj = jnp.asarray(np.concatenate([pay, np.zeros(2, np.uint32)]))
    out = np.asarray(bp64_decode_jnp(payj, jnp.asarray(wid),
                                     jnp.asarray(anc), w))
    assert (out == v).all()


def test_compression_beats_packed_on_realistic():
    v, w = _cases()["realistic"]
    pay, wid, anc = bp64_encode_numpy(v, 19)
    bits_px = (pay.nbytes + wid.nbytes + anc.nbytes) * 8 / v.size
    assert bits_px < 12.0, bits_px   # vs 19 for the packed staging
    # dropouts cost ~1 bit, not a width blow-up
    assert (wid & 0x1F).max() <= 12


def test_native_encoder_matches_numpy():
    from ouster_sdk_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(3)
    F, h, W = 2, 32, 512
    vals = rng.integers(0, 1 << 19, size=(F, h, W), dtype=np.uint32)
    vals[rng.random((F, h, W)) < 0.15] = 0
    smooth = (4000 + 1000 * np.sin(np.linspace(0, 9, W)))[None, None, :]
    vals[1] = np.where(vals[1] == 0, 0,
                       smooth.astype(np.uint32) + (vals[1] & 31))
    # bury the 19-bit value at bit 4 amid garbage, like a real pixel word
    planes = ((vals << 4)
              | rng.integers(0, 16, size=(F, h, W), dtype=np.uint32)
              | (rng.integers(0, 1 << 8, size=(F, h, W),
                              dtype=np.uint32) << 24)).astype(np.uint32)
    ref_pay, ref_wid, ref_anc = bp64_encode_numpy(vals, 19)
    nb = W // BLOCK
    payload = np.zeros(ref_pay.size + 16, np.uint32)
    widths = np.zeros(F * h * nb, np.uint8)
    anchors = np.zeros(F * h * nb, np.uint32)
    used = native.bp64_encode(np.ascontiguousarray(planes),
                              np.array([4, 4]), 19, payload, widths,
                              anchors)
    assert used == ref_pay.size
    assert (payload[:used] == ref_pay).all()
    assert (widths == ref_wid.reshape(-1)).all()
    assert (anchors == ref_anc.reshape(-1)).all()
    # overflow reports, never writes past capacity
    assert native.bp64_encode(np.ascontiguousarray(planes),
                              np.array([4, 4]), 19,
                              np.zeros(10, np.uint32), widths,
                              anchors) == -1


def _synth_capture(tmp_path, dual, w=256, h=32, frames=6):
    import bench as bench_mod
    from __graft_entry__ import _make_info

    info = _make_info(w=w, h=h, dual=dual)
    path = str(tmp_path / f"bp64_{dual}.pcap")
    bench_mod._synth_pcap(path, info, frames)
    return info, path


@pytest.mark.parametrize("dual", [False, True])
def test_bp64_staging_matches_packed_xyz(tmp_path, dual):
    """pcap -> iter_bp64_chunks -> project_bp64_batched is bit-identical
    to the packed staging's XYZ on the same capture (which is itself
    bit-identical to planar/Pallas — tests/test_packed.py)."""
    from ouster_sdk_tpu.io.frames import FrameReader
    from ouster_sdk_tpu.ops.bp64 import project_bp64_batched
    from ouster_sdk_tpu.ops.packed import (packed_range_fields,
                                           project_packed_batched)
    from ouster_sdk_tpu.ops.pallas_kernels import PlanarLut
    from ouster_sdk_tpu.ops.unpack import make_decode_plan
    from ouster_sdk_tpu.ops.xyzlut import make_xyz_lut
    from ouster_sdk_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    info, path = _synth_capture(tmp_path, dual)
    plan = make_decode_plan(info)
    fields, nbits, upshifts = packed_range_fields(plan, dual)
    lut = PlanarLut(make_xyz_lut(info))

    r1 = FrameReader(path, info=info)
    packed_out = {}
    for fids, pks, hds, _ in r1.iter_packed_chunks(4, fields=fields,
                                                   nbits=nbits):
        out = project_packed_batched(jnp.asarray(pks.copy()),
                                     jnp.asarray(hds.copy()), lut.stack,
                                     plan, nbits, upshifts=upshifts,
                                     dual=dual)
        arr = np.asarray(out[0]) if dual else np.asarray(out)
        arr2 = np.asarray(out[1]) if dual else None
        for i, f in enumerate(fids):
            packed_out[int(f)] = (arr[i], None if arr2 is None
                                  else arr2[i])

    r2 = FrameReader(path, info=info)
    n = 0
    for fids, pay, wid, anc, hds, _ in r2.iter_bp64_chunks(
            4, fields=fields, nbits=nbits):
        out = project_bp64_batched(jnp.asarray(pay.copy()),
                                   jnp.asarray(wid.copy()),
                                   jnp.asarray(anc.copy()),
                                   jnp.asarray(hds.copy()), lut.stack,
                                   plan, nbits, upshifts=upshifts,
                                   dual=dual)
        arr = np.asarray(out[0]) if dual else np.asarray(out)
        arr2 = np.asarray(out[1]) if dual else None
        for i, f in enumerate(fids):
            ref = packed_out[int(f)]
            np.testing.assert_array_equal(arr[i], ref[0])
            if dual:
                np.testing.assert_array_equal(arr2[i], ref[1])
            n += 1
    assert n == len(packed_out) == 6


def test_bp64_ship_width_is_stable_and_padded_tail_unread(tmp_path):
    """The shipped payload width locks after the first chunk (stable jit
    shapes) and random pool garbage past each frame's used words never
    affects the decode."""
    from ouster_sdk_tpu.io.frames import FrameReader
    from ouster_sdk_tpu.ops.packed import packed_range_fields
    from ouster_sdk_tpu.ops.unpack import make_decode_plan
    from ouster_sdk_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    info, path = _synth_capture(tmp_path, False)
    plan = make_decode_plan(info)
    fields, nbits, _ = packed_range_fields(plan, False)
    r = FrameReader(path, info=info)
    shapes = set()
    decoded = []
    for fids, pay, wid, anc, hds, _ in r.iter_bp64_chunks(
            4, fields=fields, nbits=nbits):
        shapes.add(pay.shape[1])
        pay = pay.copy()
        pay[:, -8:] = 0xDEADBEEF  # poison the tail padding
        for i in range(fids.size):
            decoded.append(bp64_decode_numpy(
                np.concatenate([pay[i], np.zeros(2, np.uint32)]),
                wid[i], anc[i], plan.w))
    assert len(shapes) == 1  # one stable shape across the capture
    # cross-check against the per-frame numpy encoder roundtrip
    r2 = FrameReader(path, info=info)
    k = 0
    vmask = np.uint32((1 << nbits) - 1)
    for fids, planes, hds, _ in r2.iter_planar_chunks(
            4, words=tuple(f[0] for f in fields)):
        for i in range(fids.size):
            vals = (planes[i] >> np.uint32(fields[0][1])) & vmask
            np.testing.assert_array_equal(decoded[k][0], vals[0])
            k += 1
