"""Wire-rate bit-packed staging (native onat_group_frames_packed +
ops/packed.py): the packed stream must decode to exactly the planar
staging's values, and the packed projection must be bit-identical to the
planar Pallas kernel family."""

import os

import numpy as np
import pytest

from ouster_sdk_tpu.io.frames import FrameReader
from ouster_sdk_tpu.ops.packed import (
    packed_range_fields,
    project_packed_batched,
    unpack_bits,
)
from ouster_sdk_tpu.utils import native

PCAP_DIR = "/root/reference/tests/pcaps"

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="no native toolchain")


def _fixture(name):
    p = os.path.join(PCAP_DIR, name)
    if not os.path.exists(p) or os.path.getsize(p) < 1000:
        pytest.skip("fixture missing")
    return p


def _np_unpack(packed_row, nbits, w):
    """Pure-numpy bitstream reference decoder (independent of both the
    native packer and the XLA unpacker)."""
    bits = np.unpackbits(packed_row.view(np.uint8), bitorder="little")
    weights = (1 << np.arange(nbits, dtype=np.uint64))
    return bits[: w * nbits].reshape(w, nbits).astype(np.uint64) \
        .dot(weights).astype(np.uint32)


def test_packed_stream_matches_planar():
    """Native packed staging must carry exactly the planar staging's
    field bits for every pixel (decoded by an independent numpy
    bit-reader), on a real dual-return fixture."""
    from ouster_sdk_tpu.ops.unpack import make_decode_plan

    p = _fixture("OS-1-128_767798045_1024x10_20230712_120049.pcap")
    fr_a, fr_b = FrameReader(p), FrameReader(p)
    plan = fr_a.plan
    dual = any(f.name == "RANGE2" for f in plan.fields)
    fields, nbits, upshifts = packed_range_fields(plan, dual)
    words = tuple(w for w, _ in fields)

    got = list(fr_a.iter_packed_chunks(2, fields=fields, nbits=nbits))
    ref = list(fr_b.iter_planar_chunks(2, words=words))
    assert len(got) == len(ref) >= 1
    for (fids_p, packed, hdrs_p, ts_p), (fids, planes, hdrs, ts) in \
            zip(got, ref):
        np.testing.assert_array_equal(fids_p, fids)
        np.testing.assert_array_equal(hdrs_p, hdrs)
        np.testing.assert_array_equal(ts_p, ts)
        mask = (1 << nbits) - 1
        for k, (word, bit) in enumerate(fields):
            want = (planes[:, k] >> bit) & mask  # planar word -> field
            for m in range(packed.shape[0]):
                for row in (0, plan.h // 2, plan.h - 1):
                    dec = _np_unpack(packed[m, k, row], nbits, plan.w)
                    np.testing.assert_array_equal(dec, want[m, row])


def test_unpack_bits_device_matches_numpy():
    rng = np.random.default_rng(3)
    for nbits in (15, 19):
        w = 128
        vals = rng.integers(0, 1 << nbits, size=w, dtype=np.uint64)
        bits = np.zeros(w * nbits, np.uint8)
        for k in range(w):
            for b in range(nbits):
                bits[k * nbits + b] = (vals[k] >> b) & 1
        stream = np.packbits(bits, bitorder="little").view("<u4").copy()
        import jax.numpy as jnp

        out = np.asarray(unpack_bits(jnp.asarray(stream), nbits, w))
        np.testing.assert_array_equal(out, vals.astype(np.uint32))


def test_packed_projection_bit_equals_planar_kernel():
    """project_packed_batched must be bit-identical to the planar Pallas
    kernel (interpret mode) — same inputs, same fused math, 19/32 of the
    transferred bytes."""
    import jax.numpy as jnp

    from ouster_sdk_tpu.ops.pallas_kernels import (
        PlanarLut,
        unpack_project_planar_batched,
    )
    from ouster_sdk_tpu.ops.xyzlut import make_xyz_lut

    p = _fixture("OS-1-128_767798045_1024x10_20230712_120049.pcap")
    fr_a, fr_b = FrameReader(p), FrameReader(p)
    plan = fr_a.plan
    dual = any(f.name == "RANGE2" for f in plan.fields)
    fields, nbits, upshifts = packed_range_fields(plan, dual)
    words = tuple(w for w, _ in fields)
    lut = PlanarLut(make_xyz_lut(fr_a.info))

    fids_p, packed, hdrs_p, _ = next(
        fr_a.iter_packed_chunks(2, fields=fields, nbits=nbits))
    fids, planes, hdrs, _ = next(fr_b.iter_planar_chunks(2, words=words))
    np.testing.assert_array_equal(fids_p, fids)

    a = project_packed_batched(
        jnp.asarray(packed.copy()), jnp.asarray(hdrs_p.copy()), lut.stack,
        plan, nbits, upshifts=upshifts, dual=dual)
    b = unpack_project_planar_batched(
        jnp.asarray(planes.copy()), jnp.asarray(hdrs.copy()), lut.stack,
        plan, dual=dual, words=words, interpret=True)
    if dual:
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_rejects_misaligned(tmp_path):
    """Unaligned captures must raise so callers fall back to planar."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_batcher_semantics import _info, _packets

    from ouster_sdk_tpu.io.pcap import PcapWriter

    info = _info()
    info.config.udp_port_lidar = 7502
    pkts = _packets(info, 3)
    # corrupt one packet's first column measurement id to be unaligned
    buf = np.frombuffer(pkts[1].buf.tobytes(), np.uint8).copy()
    fr = FrameReader.__new__(FrameReader)  # just for plan access
    from ouster_sdk_tpu.ops.packet_format import PacketFormat
    from ouster_sdk_tpu.ops.unpack import make_decode_plan

    pf = PacketFormat.from_info(info)
    plan = make_decode_plan(info)
    off = pf.packet_header_size + plan.mid_word * 4
    buf[off] = 3  # mid0 = 3, not a multiple of cpp
    path = str(tmp_path / "misaligned.pcap")
    with PcapWriter(path) as w:
        ts = 10 ** 9
        for k, p in enumerate(pkts):
            data = buf.tobytes() if k == 1 else p.buf.tobytes()
            w.write(data, "10.0.0.1", "10.0.0.2", 7502, 7502, ts)
            ts += 10 ** 5
    with open(str(tmp_path / "misaligned.json"), "w") as f:
        f.write(info.to_json_string())
    reader = FrameReader(path, info=info)
    fields, nbits, _ = packed_range_fields(plan, dual=False)
    with pytest.raises(RuntimeError, match="non-aligned"):
        list(reader.iter_packed_chunks(2, fields=fields, nbits=nbits))
