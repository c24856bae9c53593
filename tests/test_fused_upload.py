"""Fused single-upload staging: io.frames.ChunkFuser (host pack) +
ops.packed.unfuse_words (device unpack) — the worst-pass replay fix.

Measured motivation (bench.py e2e_run docstring): multi-array device_put
through tunneled TPU attachments exhibits rare 100-700 ms stalls and
strided pool views serialize at ~40 MB/s; one contiguous u32 buffer per
chunk rides ~GB/s with no observed stalls. These tests pin the exact
roundtrip and the bit-equality of the fused projection path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ouster_sdk_tpu.io.frames import ChunkFuser, fused_pipelined
from ouster_sdk_tpu.ops.packed import unfuse_words


def test_pack_unfuse_roundtrip_exact():
    rng = np.random.default_rng(0)
    arrs = [
        rng.integers(0, 2**32, (3, 5), dtype=np.uint32),
        rng.integers(0, 255, (7, 3), dtype=np.uint8),    # pads to words
        rng.integers(0, 2**16, (5,), dtype=np.uint16),   # odd count
        rng.normal(size=(2, 3)).astype(np.float32),
    ]
    f = ChunkFuser()
    fused, layout = f.pack(arrs)
    back = unfuse_words(jnp.asarray(np.asarray(fused)), layout)
    for a, b in zip(arrs, back):
        np.testing.assert_array_equal(a, np.asarray(b),
                                      err_msg=str(a.dtype))
    # layout is hashable (jit-static) and stable across packs
    fused2, layout2 = f.pack(arrs)
    assert layout2 == layout
    hash(layout)


def test_pack_accepts_strided_views():
    """The fuser must copy strided pool views correctly (the BP64
    payload ships as pay[:m, :ship] — a strided slice)."""
    pool = np.arange(8 * 16, dtype=np.uint32).reshape(8, 16)
    view = pool[:4, :10]                      # strided both dims
    f = ChunkFuser()
    fused, layout = f.pack([view])
    back = unfuse_words(jnp.asarray(np.asarray(fused)), layout)
    np.testing.assert_array_equal(view, np.asarray(back[0]))


def test_pool_ring_validity():
    """A packed buffer stays valid for pool_depth-1 further packs."""
    f = ChunkFuser(pool_depth=3)
    outs = []
    for i in range(3):
        a = np.full((4,), i, np.uint32)
        fused, _ = f.pack([a])
        outs.append(np.asarray(fused).copy())
    # ring of 3: the three packs landed in distinct buffers
    for i, o in enumerate(outs):
        assert (o == i).all()


def test_unfuse_rejects_unsupported_dtype():
    f = ChunkFuser()
    fused, layout = f.pack([np.zeros(2, np.uint64)])
    with pytest.raises(ValueError, match="unsupported dtype"):
        unfuse_words(jnp.asarray(np.asarray(fused)), layout)


def test_fused_pipelined_order_and_layout():
    def make_iter():
        for i in range(5):
            yield i, np.full((3,), i, np.uint32)

    def select(item):
        i, arr = item
        return i, [arr, np.uint8([i, i + 1, i + 2])]

    # consume INLINE: a yielded buffer is a pooled view, valid until
    # pool_depth-1 further packs (the consumer contract is to upload
    # each chunk before iterating on — exactly what the bench does)
    seen = []
    for i, fused, layout in fused_pipelined(make_iter, select, depth=2):
        seen.append(i)
        back = unfuse_words(jnp.asarray(np.asarray(fused)), layout)
        assert (np.asarray(back[0]) == i).all()
        np.testing.assert_array_equal(np.asarray(back[1]),
                                      [i, i + 1, i + 2])
    assert seen == list(range(5))


def test_fused_bp64_projection_bit_equal(tmp_path):
    """pack -> unfuse_words -> project_bp64_batched is BIT-IDENTICAL to
    feeding the staged arrays directly (the bench's fused e2e path vs
    the reference staging path)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _make_info, _synth_frame

    from ouster_sdk_tpu.io.frames import FrameReader
    from ouster_sdk_tpu.io.pcap import PcapWriter
    from ouster_sdk_tpu.ops.bp64 import project_bp64_batched
    from ouster_sdk_tpu.ops.packed import packed_range_fields
    from ouster_sdk_tpu.ops.pallas_kernels import PlanarLut
    from ouster_sdk_tpu.ops.unpack import make_decode_plan
    from ouster_sdk_tpu.ops.xyzlut import make_xyz_lut
    from ouster_sdk_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    info = _make_info(w=512, h=32, dual=True)
    path = str(tmp_path / "f.pcap")
    with PcapWriter(path) as w:
        ts = 10**9
        for fid in range(1, 5):
            frame = _synth_frame(info)
            bufs = np.ascontiguousarray(frame).view(np.uint8)
            from ouster_sdk_tpu.ops.packet_format import (PacketFormat,
                                                          write_bits)

            pf = PacketFormat.from_info(info)
            for p in range(bufs.shape[0]):
                words = bufs[p].view("<u4")
                write_bits(words.reshape(1, -1), pf.geom.frame_id,
                           np.array([[fid]], dtype=np.uint64))
                w.write(bufs[p].tobytes(), "10.0.0.1", "10.0.0.2",
                        7502, 7502, ts)
                ts += 10**5
            ts += 10**7

    reader = FrameReader(path, info=info)
    plan = make_decode_plan(info)
    lut = PlanarLut(make_xyz_lut(info))
    fields, nbits, upshifts = packed_range_fields(plan, True)

    chunks = list(reader.iter_bp64_chunks(4, fields=fields, nbits=nbits))
    assert chunks
    fuser = ChunkFuser()
    for fids, pay, wid, anc, hds, _ts in chunks:
        direct = project_bp64_batched(
            jnp.asarray(pay.copy()), jnp.asarray(wid.copy()),
            jnp.asarray(anc.copy()), jnp.asarray(hds.copy()),
            lut.stack, plan, nbits, upshifts=upshifts, dual=True)
        fused, layout = fuser.pack([pay, wid, anc, hds])
        p2, w2, a2, h2 = unfuse_words(jnp.asarray(np.asarray(fused)),
                                      layout)
        via_fused = project_bp64_batched(
            p2, w2, a2, h2, lut.stack, plan, nbits,
            upshifts=upshifts, dual=True)
        for d, v in zip(direct, via_fused):
            np.testing.assert_array_equal(np.asarray(d), np.asarray(v))
