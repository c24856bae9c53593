"""FrameReader (native ingest path) vs ScanBatcher across every readable
pcap fixture — validates frame staging + device decode on every profile
shipped in the reference corpus."""

import glob
import os

import numpy as np
import pytest

import jax.numpy as jnp

from ouster_sdk_tpu import ChanField, LidarScan, ScanBatcher
from ouster_sdk_tpu.io.frames import FrameReader
from ouster_sdk_tpu.io.pcap_source import PcapPacketSource, \
    resolve_metadata_paths
from ouster_sdk_tpu.ops.unpack import decode_frame

PCAP_DIR = "/root/reference/tests/pcaps"

_SKIP = {
    "VLI-16-one-packet.pcap",   # non-ouster
    "empty_pcap.pcap",
    "imu_zm_no_lidar.pcap",     # no lidar packets
    "same_ports.pcap", "same_ports_legacy.pcap",
    "same_ports_nonlegacy.pcap",  # multi-sensor: FrameReader is per-sensor
}


def _cases():
    if not os.path.isdir(PCAP_DIR):
        return []
    out = []
    for p in sorted(glob.glob(os.path.join(PCAP_DIR, "*.pcap"))):
        if os.path.basename(p) in _SKIP or os.path.getsize(p) < 24:
            continue
        if resolve_metadata_paths(p):
            out.append(p)
    return out


CASES = _cases()


@pytest.mark.parametrize("pcap", CASES,
                         ids=[os.path.basename(p) for p in CASES])
def test_frame_reader_matches_batcher(pcap):
    try:
        src = PcapPacketSource(pcap)
    except Exception as e:  # unreadable metadata combos
        pytest.skip(str(e))
    info = src.sensor_info[0]

    batcher = ScanBatcher(info)
    scan = LidarScan(info)
    got_scan = False
    for idx, p in src:
        if idx != 0 or p.type().value != "Lidar":
            continue
        if batcher(p, scan):
            got_scan = True
            break
    if not got_scan:
        # VERIFIED (r2): the three fixtures that hit this are genuinely
        # partial captures, not a FrameReader frame-boundary bug —
        # OS-0-32-U1_..._single-packet.pcap (1 of 64 pkts),
        # OS-1-128_767798045_... (8 of 64), duplicate_id.pcap (1 of 64,
        # sensor-0 stream).
        pytest.skip("no complete frame in fixture")

    fr = FrameReader(pcap, info=info)
    frames = {fid: words for fid, words, ts in fr}
    assert scan.frame_id in frames, \
        f"frame {scan.frame_id} not staged (got {list(frames)[:5]})"
    out = decode_frame(jnp.asarray(frames[scan.frame_id]), fr.plan)

    for name in out:
        if not scan.has_field(name) or "#" in name:
            continue
        np.testing.assert_array_equal(
            np.asarray(out[name]), scan.field(name), err_msg=name)
    np.testing.assert_array_equal(np.asarray(out["status"]), scan.status)


def test_read_all_batch():
    pcap = os.path.join(PCAP_DIR, "OS-0-128-U1_v2.3.0_1024x10.pcap")
    if not os.path.exists(pcap):
        pytest.skip("fixture missing")
    fr = FrameReader(pcap)
    batch, fids = fr.read_all()
    assert batch.ndim == 3 and batch.shape[1:] == (fr.plan.n_pkts,
                                                   fr.plan.pkt_words)
    assert len(fids) == batch.shape[0] >= 1


def test_planar_staging_matches_packet_staging():
    """Word-planar staging (native onat_group_frames_planar) must carry
    exactly the same pixel words and column headers as the packet-layout
    path, and the planar kernel must produce bit-identical XYZ."""
    import jax.numpy as jnp

    from ouster_sdk_tpu.ops.pallas_kernels import (
        PlanarLut, unpack_project_pallas_batched,
        unpack_project_planar_batched)
    from ouster_sdk_tpu.ops.xyzlut import make_xyz_lut
    from ouster_sdk_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    pcap = os.path.join(PCAP_DIR, "OS-2-128-U1_v2.3.0_1024x10.pcap")
    if not os.path.exists(pcap):
        pytest.skip("fixture missing")
    fr = FrameReader(pcap)
    plan = fr.plan
    fids_a, frames, _ = next(fr.iter_chunks(2))
    fids_b, planes, hdrs, _ = next(fr.iter_planar_chunks(2))
    np.testing.assert_array_equal(fids_a, fids_b)

    # cross-check plane words against the packet layout per frame
    B = frames.shape[0]
    for b in range(B):
        words = frames[b]
        cols = words[:, plan.hw:plan.hw + plan.cpp * plan.cw].reshape(
            plan.w, plan.cw)
        pix = cols[:, plan.chw:plan.chw + plan.h * plan.pw].reshape(
            plan.w, plan.h, plan.pw)
        expected = np.transpose(pix, (2, 1, 0))        # (pw, h, w)
        np.testing.assert_array_equal(planes[b], expected)
        np.testing.assert_array_equal(hdrs[b],
                                      cols[:, :plan.chw].T)

    lut = PlanarLut(make_xyz_lut(fr.info))
    a = unpack_project_pallas_batched(
        jnp.asarray(frames), lut.dir_hi, lut.dir_lo, lut.off_hi,
        lut.off_lo, plan, interpret=True)
    b = unpack_project_planar_batched(
        jnp.asarray(planes.copy()), jnp.asarray(hdrs.copy()), lut.stack,
        plan, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_decode_frame_planar_matches_packet_decode():
    """Full-field planar decode == packet-layout decode_frame on a real
    fixture (all channel fields + headers)."""
    import jax.numpy as jnp

    from ouster_sdk_tpu.ops.unpack import decode_frame, decode_frame_planar
    from ouster_sdk_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    pcap = os.path.join(PCAP_DIR, "OS-2-128-U1_v2.3.0_1024x10.pcap")
    if not os.path.exists(pcap):
        pytest.skip("fixture missing")
    fr = FrameReader(pcap)
    fids_a, frames, _ = next(fr.iter_chunks(1))
    fids_b, planes, hdrs, _ = next(fr.iter_planar_chunks(1))
    a = decode_frame(jnp.asarray(frames[0]), fr.plan)
    b = decode_frame_planar(jnp.asarray(planes[0].copy()),
                            jnp.asarray(hdrs[0].copy()), fr.plan)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


def test_planar_stream_assembler_matches_offline():
    """Live-path planar assembly (packet-by-packet) equals the offline
    planar staging for the same capture."""
    from ouster_sdk_tpu.io.frames import PlanarStreamAssembler
    from ouster_sdk_tpu.io.pcap_source import PcapPacketSource
    from ouster_sdk_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    pcap = os.path.join(PCAP_DIR, "OS-2-128-U1_v2.3.0_1024x10.pcap")
    if not os.path.exists(pcap):
        pytest.skip("fixture missing")

    fr = FrameReader(pcap)
    fids_off, planes_off, hdrs_off, _ = next(fr.iter_planar_chunks(4))

    asm = PlanarStreamAssembler(fr.info)
    out = []
    for _, p in PcapPacketSource(pcap):
        if p.type().value != "Lidar":
            continue
        rel = asm.push(p)
        if rel is not None:
            out.append((rel[0], rel[1].copy(), rel[2].copy()))
    tail = asm.flush()
    if tail is not None:
        out.append((tail[0], tail[1].copy(), tail[2].copy()))

    assert [o[0] for o in out] == list(fids_off)
    for (fid, planes, hdrs), k in zip(out, range(len(out))):
        np.testing.assert_array_equal(planes, planes_off[k])
        np.testing.assert_array_equal(hdrs, hdrs_off[k])


def test_xla_engine_matches_pallas_interpret():
    """unpack_project_planar_batched_xla (stock-XLA twin) must be
    bit-identical to the Pallas planar kernel — same _extract_bits/
    _proj_lean math, different lowering — on single, dual, word-subset,
    and fused-dewarp variants."""
    import jax.numpy as jnp

    from ouster_sdk_tpu.ops.pallas_kernels import (
        PlanarLut, unpack_project_planar_batched,
        unpack_project_planar_batched_xla)
    from ouster_sdk_tpu.ops.pallas_lutfree import _field_plan
    from ouster_sdk_tpu.ops.xyzlut import make_xyz_lut
    from ouster_sdk_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    pcap = os.path.join(
        PCAP_DIR, "OS-1-128_767798045_1024x10_20230712_120049.pcap")
    if not os.path.exists(pcap) or os.path.getsize(pcap) == 0:
        pytest.skip("fixture missing")
    fr = FrameReader(pcap)
    plan = fr.plan
    lut = PlanarLut(make_xyz_lut(fr.info))
    dual = any(f.name == ChanField.RANGE2 for f in plan.fields)
    fids, planes, hdrs, _ = next(fr.iter_planar_chunks(2))
    pl, hd = jnp.asarray(planes.copy()), jnp.asarray(hdrs.copy())

    a = unpack_project_planar_batched(pl, hd, lut.stack, plan,
                                      dual=dual, interpret=True)
    b = unpack_project_planar_batched_xla(pl, hd, lut.stack, plan,
                                          dual=dual)
    if dual:
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # word-subset staging through both engines
    ws = (_field_plan(plan, "RANGE").word,)
    if dual:
        ws = ws + (_field_plan(plan, "RANGE2").word,)
    fr2 = FrameReader(fr._path, info=fr.info)
    fids_s, planes_s, hdrs_s, _ = next(fr2.iter_planar_chunks(2, words=ws))
    np.testing.assert_array_equal(fids, fids_s)
    # native word_sel staging must equal a python subset of full planes
    np.testing.assert_array_equal(planes_s, planes[:, list(ws)])
    a = unpack_project_planar_batched(
        jnp.asarray(planes_s.copy()), jnp.asarray(hdrs_s.copy()),
        lut.stack, plan, dual=dual, words=ws, interpret=True)
    b = unpack_project_planar_batched_xla(
        jnp.asarray(planes_s.copy()), jnp.asarray(hdrs_s.copy()),
        lut.stack, plan, dual=dual, words=ws)
    if dual:
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # fused dewarp (single-return only)
    B = planes.shape[0]
    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4, dtype=np.float32), (B, plan.w, 1, 1))
    ang = rng.uniform(-0.1, 0.1, size=plan.w).astype(np.float32)
    poses[:, :, 0, 0] = np.cos(ang)
    poses[:, :, 0, 1] = -np.sin(ang)
    poses[:, :, 1, 0] = np.sin(ang)
    poses[:, :, 1, 1] = np.cos(ang)
    poses[:, :, :3, 3] = rng.uniform(-1, 1, (B, plan.w, 3))
    a = unpack_project_planar_batched(pl, hd, lut.stack, plan,
                                      poses=jnp.asarray(poses),
                                      interpret=True)
    b = unpack_project_planar_batched_xla(pl, hd, lut.stack, plan,
                                          poses=jnp.asarray(poses))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=0)


def test_pipelined_planar_iter_matches_serial():
    """iter_planar_chunks_pipelined (background staging thread) must
    yield exactly the serial iterator's chunks, in order."""
    from ouster_sdk_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    pcap = os.path.join(PCAP_DIR, "OS-2-128-U1_v2.3.0_1024x10.pcap")
    if not os.path.exists(pcap):
        pytest.skip("fixture missing")
    fr_a = FrameReader(pcap)
    fr_b = FrameReader(pcap)
    serial = [(f.copy(), p.copy(), h.copy(), t.copy())
              for f, p, h, t in fr_a.iter_planar_chunks(2)]
    piped = [(f.copy(), p.copy(), h.copy(), t.copy())
             for f, p, h, t in fr_b.iter_planar_chunks_pipelined(2)]
    assert len(serial) == len(piped) >= 1
    for (fa, pa, ha, ta), (fb, pb, hb, tb) in zip(serial, piped):
        np.testing.assert_array_equal(fa, fb)
        np.testing.assert_array_equal(pa, pb)
        np.testing.assert_array_equal(ha, hb)
        np.testing.assert_array_equal(ta, tb)
    # early abandonment must not deadlock or leak the producer
    fr_c = FrameReader(pcap)
    it = fr_c.iter_planar_chunks_pipelined(1, depth=1)
    next(it)
    it.close()


def test_iter_chunks_released_state_survives_chunk_boundary(tmp_path):
    """Boundary drop rules must persist across resumed grouper calls:
    a straggler/duplicate of the just-released frame arriving exactly
    at a chunk break must NOT reopen a spurious frame — iter_chunks and
    iter_planar_chunks must return the same frame-id sequence for the
    same capture (native io_released carry-over)."""
    from _live_helpers import live_test_info, synth_frame_packets

    from ouster_sdk_tpu.io.frames import FrameReader
    from ouster_sdk_tpu.io.pcap import PcapWriter
    from ouster_sdk_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    info = live_test_info(7502, 7503)
    f1 = synth_frame_packets(info, 1)
    f2 = synth_frame_packets(info, 2)
    f3 = synth_frame_packets(info, 3)
    # stream: frame1 | first pkt of frame2 (releases 1 -> chunk=1
    # resumes HERE) | straggler of frame1 | rest of frame2 | frame3
    stream = f1 + [f2[0], f1[3]] + f2[1:] + f3
    path = str(tmp_path / "straggler.pcap")
    with PcapWriter(path) as w:
        for i, p in enumerate(stream):
            w.write(p, "127.0.0.1", "127.0.0.1", 7502, 7502,
                    1_000_000 * (i + 1))

    fr = FrameReader(path, info=info)
    fids_chunked = [int(f) for fids, _, _ in fr.iter_chunks(chunk=1)
                    for f in fids]
    fr2 = FrameReader(path, info=info)
    fids_planar = [int(f) for fids, _, _, _ in
                   fr2.iter_planar_chunks(chunk=1) for f in fids]
    assert fids_chunked == fids_planar
    assert 1 not in fids_chunked[1:], \
        "straggler of released frame 1 reopened a spurious frame"
