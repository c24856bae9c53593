"""FrameReader: pcap -> staged frame word arrays with no per-packet Python.

The production TPU ingest path (ref: SURVEY.md §7 phase 4 — host thread ->
pinned staging -> HBM double buffer): the native library scans the whole
pcap in one pass (UDP parse + IPv4 reassembly), then frames are assembled
by grouping packets on frame_id with numpy and scattered into
(n_pkts, pkt_words) upload buffers ready for jnp.asarray + decode_frame /
the Pallas kernel. Falls back to the pure-Python reader when the native
library is unavailable.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..core.types import SensorInfo
from ..ops.packet_format import PacketFormat
from ..ops.unpack import DecodePlan, make_decode_plan
from ..utils import native
from .pcap import _PCAP_MAGICS, PcapReader
from .pcap_source import resolve_metadata_paths


@dataclass
class PlanarBatch:
    """One chunk of word-planar staged frames plus every scan header the
    batcher materializes (ref: lidar_scan.cpp:1324-1372 per-packet
    headers, :1546-1552 frame status) — everything DeviceScanSource needs
    to build LidarScans bit-equal to the numpy ScanBatcher."""

    frame_ids: np.ndarray   # (m,) i64
    planes: np.ndarray      # (m, pw | n_sel, h, w) u32
    col_hdrs: np.ndarray    # (m, chw, w) u32
    host_ts: np.ndarray     # (m,) u64 — first packet's host timestamp
    pkt_ts: np.ndarray      # (m, n_pkts) u64 — host ts by packet slot
    pkt_hdrs: np.ndarray    # (m, n_pkts, hw) u32 — packet header words
    first_hdr: np.ndarray   # (m, hw) u32 — opening packet's header


def _pipelined(make_iter, depth: int, on_close=None) -> Iterator:
    """Run `make_iter()` on a background staging thread, queueing up to
    `depth` items ahead of the consumer. The producer's native pack is a
    ctypes call that drops the GIL, so staging genuinely overlaps the
    consumer's h2d transfer + device dispatch — the replay ingest topology
    of the reference's thread-per-role design
    (ref: sensor_packet_source.cpp:550, async_writer.cpp). Exceptions
    surface on the consumer side; closing the generator joins the
    producer. `on_close` runs in the CONSUMER's finally, after the join —
    resource check-in (pool freelists) must happen there, not in the
    producer's finally: when the producer exhausts, up to `depth` yielded
    items whose arrays view those pools are still queued unread."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    done = object()
    err: List[BaseException] = []

    def produce():
        it = None
        try:
            it = make_iter()
            for item in it:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            if it is not None:
                # deterministic close so the producer's finally blocks
                # (pool check-in, etc.) run now, not at GC
                getattr(it, "close", lambda: None)()
            while not stop.is_set():
                try:
                    q.put(done, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def consume():
        t = threading.Thread(target=produce, daemon=True,
                             name="frame-staging")
        t.start()
        try:
            while True:
                item = q.get()
                if item is done:
                    break
                yield item
        finally:
            stop.set()
            t.join()
            if on_close is not None:
                on_close()
        if err:
            raise err[0]

    return consume()


class ChunkFuser:
    """Pack one staged chunk's arrays into ONE pooled contiguous u32
    upload buffer, so the consumer issues a single `device_put` per
    chunk.

    Why (measured on this tunneled TPU attachment): (a) multi-array h2d
    exhibits rare 100-700 ms per-call stalls that a single contiguous
    transfer never hits, and (b) strided pool views (e.g. the BP64
    payload's `pay[:m, :ship]` slice) serialize at ~40 MB/s where a
    contiguous buffer rides ~GB/s. Worst-pass replay throughput — the
    number that matters for "sustained" (BASELINE.md) — is set by those
    tails, not the medians. The pack itself is a few host memcpys that
    run on the STAGING thread (overlapped with the consumer's upload +
    dispatch). Device-side twin: ops.packed.unfuse_words.

    Layouts are (offset_words, shape, dtype) tuples, hashable so jit can
    treat them as static. u8 arrays pad to a word multiple; u64 split in
    words. Pool ring semantics match the other stagings: a yielded
    buffer stays valid for pool_depth-1 further packs."""

    _DT = {"uint8": np.uint8, "uint16": np.uint16, "uint32": np.uint32,
           "uint64": np.uint64, "int64": np.int64, "float32": np.float32}

    def __init__(self, pool_depth: int = 4):
        self._pools: List[np.ndarray] = []
        self._depth = max(2, pool_depth)
        self._flip = 0
        self._words = 0

    @staticmethod
    def layout_of(arrays) -> Tuple[Tuple[int, Tuple[int, ...], str], ...]:
        out = []
        off = 0
        for a in arrays:
            nbytes = int(np.prod(a.shape)) * a.dtype.itemsize
            words = (nbytes + 3) // 4
            out.append((off, tuple(a.shape), a.dtype.name))
            off += words
        return tuple(out)

    def pack(self, arrays) -> Tuple[np.ndarray,
                                    Tuple[Tuple[int, Tuple[int, ...], str],
                                          ...]]:
        layout = self.layout_of(arrays)
        total = layout[-1][0] + (
            int(np.prod(layout[-1][1]))
            * np.dtype(layout[-1][2]).itemsize + 3) // 4
        if total > self._words or not self._pools:
            self._words = total
            self._pools = [np.zeros(total, np.uint32)
                           for _ in range(self._depth)]
            self._flip = 0
        buf = self._pools[self._flip]
        self._flip = (self._flip + 1) % len(self._pools)
        for (off, shape, dt), a in zip(layout, arrays):
            flat = np.ascontiguousarray(a).reshape(-1).view(np.uint8)
            dst = buf[off:off + (flat.size + 3) // 4].view(np.uint8)
            dst[:flat.size] = flat
            if flat.size % 4:
                dst[flat.size:] = 0
        return buf[:total], layout


def fused_pipelined(make_iter, select, depth: int = 2) -> Iterator:
    """Pipelined staging with a PRODUCER-side ChunkFuser: `select(item)
    -> (meta, arrays)`; yields (meta, fused_u32, layout). The pack runs
    on the staging thread, so its memcpys overlap the consumer's single
    device_put + dispatch."""
    fuser = ChunkFuser(pool_depth=depth + 2)

    def gen():
        for item in make_iter():
            meta, arrays = select(item)
            fused, layout = fuser.pack(arrays)
            yield meta, fused, layout

    return _pipelined(gen, depth)


class FrameReader:
    """Iterate (frame_id, (n_pkts, pkt_words) u32, host_ts) frames for one
    sensor from a pcap."""

    def __init__(self, pcap_path: str,
                 info: Optional[SensorInfo] = None,
                 metadata_path: Optional[str] = None,
                 strict_ports: bool = False):
        if info is None:
            from ..core.metadata import sensor_info_from_metadata

            paths = [metadata_path] if metadata_path else \
                resolve_metadata_paths(pcap_path)
            if not paths:
                raise FileNotFoundError(
                    f"no metadata json found for {pcap_path}")
            with open(paths[0]) as f:
                info = sensor_info_from_metadata(f.read())
        self.info = info
        self.pf = PacketFormat.from_info(info)
        self.plan: DecodePlan = make_decode_plan(info)
        self._path = pcap_path
        # strict: a configured udp_port_lidar filters unconditionally —
        # the numpy route's classification rule (pcap_source._classify),
        # required when staging must match that oracle (device ScanSource
        # route). Non-strict (default, direct FrameReader/bench use)
        # keeps the relocated-capture leniency: the port filter only
        # applies when the capture actually carries that dst port.
        self._strict_ports = strict_ports
        self.id_error_count = 0
        # staging pools reused across iter_chunks calls (first-touch page
        # faults are expensive on virtualized hosts; reuse keeps the steady
        # state fault-free)
        self._pools = {}
        self._bp64_ship = {}  # locked ship widths (see iter_bp64_chunks)

    def _native_scan(self):
        import os

        st = os.stat(self._path)
        cached = self._pools.get("scan_cache")
        if cached is not None and cached[0] == (st.st_size, st.st_mtime_ns):
            # replaying the same capture (bench passes, indexed re-reads):
            # the scan+reassembly output is immutable, skip the whole
            # host pass
            return cached[1]
        size = st.st_size
        # map the file instead of copying it: the native scan reads it
        # once sequentially (OS readahead), and the resident cost of the
        # capture bytes stays file-backed/evictable — the payload
        # workspace (reassembled datagrams) is the only anonymous
        # file-sized buffer a long-lived indexed source keeps
        data = np.memmap(self._path, np.uint8, mode="r") if size else \
            np.zeros(0, np.uint8)
        if size < 24:
            return (np.zeros(0, np.uint8), np.zeros(0, np.int64),
                    np.zeros(0, np.int64), np.zeros(0, np.uint64),
                    np.zeros(0, np.uint32), np.zeros(0, np.uint32))
        head = data[:24].tobytes()
        magic = struct.unpack("<I", head[:4])[0]
        if magic not in _PCAP_MAGICS:
            raise ValueError("unknown pcap magic")
        # the table maps the value READ LITTLE-ENDIAN to the file's
        # actual byte order — a big-endian capture reads as the
        # byte-swapped magic, which is also a table key
        swap = _PCAP_MAGICS[magic][0] == ">"
        ts_nano = _PCAP_MAGICS[magic][1] == 1
        linktype = struct.unpack(
            ("<" if not swap else ">") + "I", head[20:24])[0] & 0x0FFFFFFF
        ws = self._pools.setdefault("scan_ws", {})
        res = native.pcap_scan(data, swap, ts_nano, linktype, workspace=ws)
        self._pools["scan_cache"] = ((st.st_size, st.st_mtime_ns), res)
        return res


    def _stream_mask(self, sizes: np.ndarray, ports: np.ndarray,
                     size: int, port: int, strict: bool) -> np.ndarray:
        """Datagrams of one of this sensor's streams: packet size plus the
        metadata's destination port (ports pack src<<16 | dst). `strict`
        applies a configured port unconditionally — the numpy route's
        classification rule (pcap_source.py _classify: port in
        (0, dst_port)); non-strict keeps the lidar stream's leniency for
        relocated captures whose metadata port never appears."""
        m = sizes == size
        if port:
            pm = (ports & np.uint32(0xFFFF)) == np.uint32(port)
            if strict or (m & pm).any():
                m = m & pm
        return m

    def _lidar_mask(self, sizes: np.ndarray, ports: np.ndarray) -> np.ndarray:
        """Datagrams belonging to THIS sensor's lidar stream: packet size
        plus the metadata's udp_port_lidar (multi-sensor captures share
        packet sizes). Strictness per the ctor's `strict_ports`."""
        return self._stream_mask(sizes, ports, self.pf.lidar_packet_size,
                                 self.info.config.udp_port_lidar or 0,
                                 strict=self._strict_ports)

    def _aux_streams(self) -> List[Tuple[str, int, int]]:
        """(kind, packet_size, port) for the aux streams this sensor's
        profile carries (hybrid device route)."""
        from ..core.types import UDPProfileIMU

        pf, fmt = self.pf, self.info.format
        wanted = []
        if fmt.udp_profile_imu == UDPProfileIMU.ACCEL32_GYRO32_NMEA and \
                pf.imu_packet_size:
            wanted.append(("imu", pf.imu_packet_size,
                           self.info.config.udp_port_imu or 0))
        if getattr(fmt, "zone_monitoring_enabled", False) and \
                pf.zone_packet_size:
            wanted.append(("zone", pf.zone_packet_size,
                           self.info.config.udp_port_zm or 0))
        return wanted

    def hybrid_streams(self, soft_id_check: bool = False) -> Tuple[
            Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray],
            List[Tuple[int, str, int, np.ndarray, int]]]:
        """The capture's packet stream reduced to the two halves of the
        hybrid route's admission simulation (device_engine._AuxRouter),
        both in datagram order:

        - lidar: (idx, fid, packet_slot, host_ts) parallel numpy arrays
          for every lidar datagram that survives the same port/id filters
          iter_instance_batches' staging applies — vectorized header
          gathers, no
          per-packet Python work;
        - aux: [(idx, kind, fid, payload, host_ts), ...] for every IMU /
          zone datagram (few per frame), strict port classification like
          the numpy route's (pcap_source.py _classify).

        `idx` is the datagram's position in the native scan output, the
        index iter_instance_batches stages packets by."""
        empty = (np.zeros(0, np.int64), np.zeros(0, np.int64),
                 np.zeros(0, np.int64), np.zeros(0, np.uint64))
        res = self._native_scan() if native.get_lib() is not None else None
        if res is None:
            return empty, []
        payloads, offsets, sizes, ts, ports, ips = res
        pf, plan = self.pf, self.plan

        lidar = self._lidar_mask(sizes, ports)
        lidx = np.nonzero(lidar)[0]
        offs = offsets[lidar]
        if lidx.size:
            idmask = self.id_check_mask(payloads, offs)
            self.id_error_count = int((~idmask).sum())
            if not soft_id_check and self.id_error_count:
                lidx, offs = lidx[idmask], offs[idmask]
        if lidx.size:
            fids = self._vec_header_field(
                payloads, offs, pf.geom.frame_id).astype(np.int64)
            slots = (self._vec_first_mid(payloads, offs).astype(np.int64)
                     // plan.cpp)
            lidar_ev = (lidx, fids, slots, ts[lidx])
        else:
            lidar_ev = empty
        aux_ev: List[Tuple[int, str, int, np.ndarray, int]] = []
        for kind, size, port in self._aux_streams():
            m = self._stream_mask(sizes, ports, size, port, strict=True)
            for idx in np.nonzero(m)[0]:
                buf = payloads[offsets[idx]:offsets[idx] + size].copy()
                aux_ev.append((int(idx), kind, int(pf.frame_id(buf)),
                               buf, int(ts[idx])))
        aux_ev.sort(key=lambda t: t[0])
        return lidar_ev, aux_ev

    def _checkout_inst_pools(self, chunk: int, pool_depth: int):
        """Check out (key, pools) for an instance-batch iteration; check
        back in with `self._pools[key].append(pools)` once no yielded
        view can be read anymore."""
        hw = self.pf.packet_header_size // 4
        plan = self.plan
        key = ("inst", chunk, pool_depth)
        free = self._pools.setdefault(key, [])
        pools = free.pop() if free else [(
            np.zeros((chunk, plan.pw, plan.h, plan.w), np.uint32),
            np.zeros((chunk, plan.schw, plan.w), np.uint32),
            np.zeros((chunk, plan.n_pkts), np.uint64),
            np.zeros((chunk, plan.n_pkts, hw), np.uint32),
            np.zeros((chunk, hw), np.uint32),
        ) for _ in range(pool_depth)]
        return key, pools

    def iter_instance_batches(self, groups: List[np.ndarray],
                              chunk: int = 4,
                              pool_depth: int = 2,
                              _pools=None
                              ) -> Iterator[PlanarBatch]:
        """Stage explicit per-frame packet groups as planar scan batches:
        slot k of each yielded PlanarBatch is the k-th group (a numpy
        array of datagram indices), packed by one single-frame native
        call per group. The hybrid device route uses this so the
        ScanBatcher-admission simulation — which has already decided
        exactly which lidar packets belong to which frame instance —
        drives the staging; re-deriving boundaries from the lidar stream
        alone cannot see aux-induced boundaries or aux-gated completion
        (ref: lidar_scan.cpp:1505-1617). Pool buffers are checked out
        per iterator and returned on close; a yielded batch's arrays
        stay valid for pool_depth-1 further iterations of the SAME
        iterator. When `_pools` is passed, the CALLER owns the pools'
        lifetime (the pipelined wrapper checks them back in from the
        consumer side — this generator exhausts while yielded views are
        still queued)."""
        res = self._native_scan() if native.get_lib() is not None else None
        if res is None:
            raise RuntimeError("scan batches need the native library")
        payloads, offsets, sizes, ts, ports, ips = res

        plan = self.plan
        g = self.pf.geom
        fid_byte, fid_shift = divmod(g.frame_id.bit_start, 8)
        fid_mask = (1 << g.frame_id.bit_size) - 1
        # pools are CHECKED OUT per iterator and returned on close, so
        # concurrent iterations of the same reader (an indexed source
        # iterated twice at once) never write into each other's yielded
        # views; a freelist keeps the steady state fault-free
        owns = _pools is None
        if owns:
            key, pools = self._checkout_inst_pools(chunk, pool_depth)
        else:
            pools = _pools
        try:
            fid_out = np.zeros(chunk, np.int64)
            ts_out = np.zeros(chunk, np.uint64)
            flip = 0
            for base in range(0, len(groups), chunk):
                sel = groups[base:base + chunk]
                planes, hdrs, pkt_ts, pkt_hdrs, first_hdr = pools[flip]
                flip = (flip + 1) % len(pools)
                for k, grp in enumerate(sel):
                    native.group_frames_planar(
                        payloads, offsets[grp], ts[grp],
                        self.pf.lidar_packet_size, fid_byte, fid_shift,
                        fid_mask, self.pf.packet_header_size,
                        self.pf.col_size, self.pf.col_header_size,
                        plan.mid_word * 4, plan.cpp, plan.h, plan.pw,
                        plan.w, planes[k:k + 1], hdrs[k:k + 1],
                        fid_out[k:k + 1], ts_out[k:k + 1],
                        out_pkt_ts=pkt_ts[k:k + 1],
                        out_pkt_hdrs=pkt_hdrs[k:k + 1],
                        out_first_hdr=first_hdr[k:k + 1],
                        ftr_words=plan.schw - plan.chw)
                n = len(sel)
                yield PlanarBatch(fid_out[:n].copy(), planes[:n],
                                  hdrs[:n], ts_out[:n].copy(), pkt_ts[:n],
                                  pkt_hdrs[:n], first_hdr[:n])
        finally:
            if owns:
                self._pools[key].append(pools)

    def iter_instance_batches_pipelined(
            self, groups: List[np.ndarray], chunk: int = 4,
            depth: int = 2) -> Iterator[PlanarBatch]:
        """iter_instance_batches staged on a background thread (same
        overlap contract as iter_planar_chunks_pipelined). The pools
        check back in when the CONSUMER closes — the producer exhausts
        while up to `depth` yielded batches still view them."""
        key, pools = self._checkout_inst_pools(chunk, depth + 2)
        return _pipelined(
            lambda: self.iter_instance_batches(groups, chunk,
                                               pool_depth=depth + 2,
                                               _pools=pools),
            depth,
            on_close=lambda: self._pools[key].append(pools))

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray, int]]:
        for fids, frames, tss in self.iter_chunks():
            for k in range(fids.size):
                # copy: the chunk slab is a reused pool (iter_chunks is the
                # zero-copy hot path; steady-state copies recycle arenas)
                yield int(fids[k]), frames[k].copy(), int(tss[k])

    def iter_planar_chunks_pipelined(
            self, chunk: int = 8,
            words: Optional[Tuple[int, ...]] = None,
            depth: int = 2) -> Iterator[
            Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
        """iter_planar_chunks with the host stage (native pcap scan +
        reassembly + planar packing) running on a background thread,
        overlapped with whatever the consumer does (h2d transfer + device
        dispatch). The staging pool ring is sized depth+2 so a yielded
        view stays valid while up to `depth` staged chunks queue ahead
        (the native pack is a ctypes call, so it drops the GIL and
        genuinely overlaps device work). This is the replay ingest
        topology of the reference's thread-per-role design
        (ref: sensor_packet_source.cpp:550, async_writer.cpp) applied to
        the TPU upload path."""
        return _pipelined(
            lambda: self.iter_planar_chunks(chunk, words,
                                            pool_depth=depth + 2),
            depth)

    def _vec_header_field(self, payloads: np.ndarray, offs: np.ndarray,
                          finfo) -> np.ndarray:
        """Vectorized packet-header bitfield: value of `finfo` for every
        packet at `offs` (u64). The per-packet gather is 8 bytes — id
        checking an entire capture costs one fancy-index, not a Python
        loop over packets."""
        byte, shift = divmod(int(finfo.bit_start), 8)
        idx = offs[:, None] + byte + np.arange(8)
        v = payloads[idx].astype(np.uint64)
        v = (v << (np.arange(8, dtype=np.uint64) * np.uint64(8))).sum(
            axis=1, dtype=np.uint64)
        v >>= np.uint64(shift)
        if finfo.bit_size < 64:
            v &= np.uint64((1 << finfo.bit_size) - 1)
        return v

    def _vec_first_mid(self, payloads: np.ndarray, offs: np.ndarray
                       ) -> np.ndarray:
        """First column's measurement id for every packet at `offs`
        (vectorized 2-byte little-endian gather, u16)."""
        mid_off = self.pf.packet_header_size + self.plan.mid_word * 4
        return (payloads[offs[:, None] + mid_off
                         + np.arange(2)].astype(np.uint16)
                * np.array([1, 256], np.uint16)).sum(axis=1)

    def id_check_mask(self, payloads: np.ndarray, offs: np.ndarray
                      ) -> np.ndarray:
        """Per-packet init_id/serial validation vs the metadata, the
        vectorized twin of LidarPacket.validate (ref: packet.h:205):
        False where a nonzero packet id contradicts a nonzero metadata
        id. LEGACY has no ids in the header: all True."""
        from ..core.types import UDPProfileLidar

        if self.info.format.udp_profile_lidar == UDPProfileLidar.LEGACY:
            return np.ones(offs.size, dtype=bool)
        ok = np.ones(offs.size, dtype=bool)
        if self.info.init_id:
            pkt = self._vec_header_field(payloads, offs,
                                         self.pf.geom.init_id)
            ok &= (pkt == 0) | (pkt == np.uint64(self.info.init_id))
        if self.info.sn:
            pkt = self._vec_header_field(payloads, offs,
                                         self.pf.geom.prod_sn)
            ok &= (pkt == 0) | (pkt == np.uint64(self.info.sn))
        return ok

    def iter_packed_chunks(self, chunk: int = 8,
                           fields: Tuple[Tuple[int, int], ...] = (),
                           nbits: int = 19,
                           pool_depth: int = 2) -> Iterator[
            Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
        """Wire-rate staging: yield (frame_ids, packed (m, n_fields, h,
        w*nbits//32) u32, col_hdrs (m, chw, w) u32, host_ts) where each
        selected field's nbits bits per pixel are packed into a dense
        LSB-first bitstream per row (native onat_group_frames_packed).
        Cuts host->device bytes to nbits/32 of the word-subset planar
        staging — the difference between link-bound and compute-bound
        replay when ingest rides PCIe or a tunnel. `fields` lists
        (pixel_word, bit_offset) pairs; decode on device with
        ops.packed.unpack_bits / ops.packed.project_packed_batched.

        Falls back with RuntimeError when the capture has misaligned
        packets (first column id not a multiple of columns-per-packet),
        W % 32 != 0, or a field crosses a word boundary — callers should
        catch and use iter_planar_chunks."""
        plan = self.plan
        if plan.status_word >= plan.chw:
            raise RuntimeError("packed staging supports eUDP only")
        if not fields:
            raise ValueError(
                "packed staging needs a non-empty `fields` list of "
                "(pixel_word, bit_offset) pairs")
        if plan.w % 32 or (plan.cpp * nbits) % 8:
            raise RuntimeError("packed staging needs w%32==0 and "
                               "cpp*nbits%8==0")
        for _, bit in fields:
            if bit + nbits > 32:
                raise RuntimeError("packed field crosses a word boundary")
        res = self._native_scan() if native.get_lib() is not None else None
        if res is None:
            raise RuntimeError("packed staging needs the native library")
        payloads, offsets, sizes, ts, ports, ips = res
        lidar = self._lidar_mask(sizes, ports)
        if not lidar.any():
            raise RuntimeError("no lidar datagrams for packed staging")
        offs, tss = offsets[lidar], ts[lidar]
        # alignment pre-check, vectorized (like the id check): first
        # column's measurement id per packet
        mids = self._vec_first_mid(payloads, offs)
        if (mids % plan.cpp).any():
            raise RuntimeError("capture has non-aligned packets")

        g = self.pf.geom
        fid_byte, fid_shift = divmod(g.frame_id.bit_start, 8)
        fid_mask = (1 << g.frame_id.bit_size) - 1
        wp = plan.w * nbits // 32
        key = ("packed", chunk, fields, nbits, pool_depth)
        if key not in self._pools:
            self._pools[key] = [
                (np.zeros((chunk, len(fields), plan.h, wp), np.uint32),
                 np.zeros((chunk, plan.chw, plan.w), np.uint32))
                for _ in range(pool_depth)]
        pools = self._pools[key]
        fw = np.asarray([f[0] for f in fields], np.int64)
        fb = np.asarray([f[1] for f in fields], np.int64)
        fid_out = np.zeros(chunk, np.int64)
        ts_out = np.zeros(chunk, np.uint64)
        released = np.full(1, -1, np.int64)
        pos, flip = 0, 0
        while pos < offs.size:
            planes, hdrs = pools[flip]
            flip = (flip + 1) % len(pools)
            consumed, nf = native.group_frames_packed(
                payloads, offs[pos:], tss[pos:],
                self.pf.lidar_packet_size, fid_byte, fid_shift, fid_mask,
                self.pf.packet_header_size, self.pf.col_size,
                self.pf.col_header_size, plan.mid_word * 4, plan.cpp,
                plan.h, plan.pw, plan.w, fw, fb, nbits, planes, hdrs,
                fid_out, ts_out, io_released=released)
            if nf == 0:
                break
            pos += consumed
            yield (fid_out[:nf].copy(), planes[:nf], hdrs[:nf],
                   ts_out[:nf].copy())

    def iter_bp64_chunks(self, chunk: int = 8,
                         fields: Tuple[Tuple[int, int], ...] = (),
                         nbits: int = 19,
                         pool_depth: int = 2) -> Iterator[
            Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray,
                  np.ndarray, np.ndarray]]:
        """Compressed wire staging: yield (frame_ids, payload (m, P) u32,
        widths (m, n_fields, h, w//64) u8, anchors (m, n_fields, h,
        w//64) u32, col_hdrs (m, chw, w) u32, host_ts). Each selected
        field is BP64-encoded (ops/bp64.py: per-64-px-block delta +
        bit-pack with a dropout mask) — real captures ship at 5-10
        bits/px instead of the packed staging's nbits, which is the
        difference between link-bound and staging-bound replay on hosts
        where ingest rides a thin link. Decode fuses into the projection
        (ops.bp64.project_bp64_batched) and reconstructs ranges
        bit-identically.

        P (the shipped payload width) locks to the first chunk's
        requirement plus headroom and only grows when a later frame
        exceeds it, so downstream jit shapes stay stable; padding past
        each frame's used words is never read by the decoder. `fields`
        lists (pixel_word, bit_offset) pairs, like iter_packed_chunks."""
        plan = self.plan
        if plan.w % 64:
            raise RuntimeError("bp64 staging needs w % 64 == 0")
        if not 1 <= nbits <= 30:
            # 5-bit block widths: zigzag deltas need up to nbits+1 bits
            raise ValueError("bp64 staging supports 1 <= nbits <= 30")
        if not fields:
            # an empty selection would hand zero-sized workspaces to the
            # native encoder; fail loudly instead (callers build the
            # list with ops.packed.packed_range_fields)
            raise ValueError(
                "bp64 staging needs a non-empty `fields` list of "
                "(pixel_word, bit_offset) pairs")
        words = tuple(f[0] for f in fields)
        bits = np.asarray([f[1] for f in fields], np.int64)
        F = len(fields)
        nb = plan.w // 64
        blocks = F * plan.h * nb
        # allocation capacity = worst case (white noise), so the encoder
        # can never overflow; the SHIPPED slice is the compressed size
        cap = blocks * (2 * (nbits + 1) + 2) + 2
        key = ("bp64", chunk, fields, nbits, pool_depth)
        if key not in self._pools:
            self._pools[key] = [
                (np.zeros((chunk, cap), np.uint32),
                 np.zeros((chunk, F, plan.h, nb), np.uint8),
                 np.zeros((chunk, F, plan.h, nb), np.uint32))
                for _ in range(pool_depth)]
        pools = self._pools[key]
        vmask = np.uint32((1 << nbits) - 1)
        # the locked ship width survives iterator restarts (replay loops
        # re-iterate the same capture; downstream jit shapes must not
        # shrink between passes)
        ship_key = (fields, nbits)
        ship: int = self._bp64_ship.get(ship_key, 0)
        flip = 0
        for fids, planes, hdrs, ts in self.iter_planar_chunks(
                chunk, words=words, pool_depth=pool_depth):
            pay, wid, anc = pools[flip]
            flip = (flip + 1) % len(pools)
            m = fids.size
            max_used = 0
            for i in range(m):
                used = native.bp64_encode(
                    np.ascontiguousarray(planes[i]), bits, nbits,
                    pay[i], wid[i].reshape(-1), anc[i].reshape(-1))
                if used == -2:  # no native toolchain: numpy encoder
                    from ..ops.bp64 import bp64_encode_numpy

                    vals = (planes[i] >> bits[:, None, None].astype(
                        np.uint32)) & vmask
                    p, w_, a_ = bp64_encode_numpy(vals, nbits)
                    used = p.size
                    pay[i, :used] = p
                    wid[i] = w_
                    anc[i] = a_
                elif used < 0:
                    raise RuntimeError("bp64 encoder overflow (bug: "
                                       "capacity is worst-case sized)")
                pay[i, used:used + 2] = 0  # deterministic decoder slack
                max_used = max(max_used, used)
            if max_used + 2 > ship:  # grow-only: stable jit shapes
                want = (max_used + 2) * 5 // 4
                ship = min((want + 1023) // 1024 * 1024, cap)
                self._bp64_ship[ship_key] = ship
            yield (fids, pay[:m, :ship], wid[:m], anc[:m], hdrs[:m], ts)

    def iter_bp64_chunks_pipelined(
            self, chunk: int = 8,
            fields: Tuple[Tuple[int, int], ...] = (),
            nbits: int = 19, depth: int = 2) -> Iterator[
            Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray,
                  np.ndarray, np.ndarray]]:
        """iter_bp64_chunks staged on a background thread (the native
        encode drops the GIL, so compression genuinely overlaps the
        consumer's h2d + device dispatch)."""
        return _pipelined(
            lambda: self.iter_bp64_chunks(chunk, fields, nbits,
                                          pool_depth=depth + 2),
            depth)

    def iter_packed_chunks_pipelined(
            self, chunk: int = 8,
            fields: Tuple[Tuple[int, int], ...] = (),
            nbits: int = 19, depth: int = 2) -> Iterator[
            Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
        """iter_packed_chunks staged on a background thread."""
        return _pipelined(
            lambda: self.iter_packed_chunks(chunk, fields, nbits,
                                            pool_depth=depth + 2),
            depth)

    def iter_chunks(self, chunk: int = 8) -> Iterator[
            Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Yield (frame_ids, frames (m, n_pkts, pkt_words) u32, host_ts)
        chunks of up to `chunk` frames with NO per-byte Python work: one
        native pass groups packets into pooled slabs (this host is
        page-fault bound, so slabs alternate between two reused pools —
        each yielded view is valid until the next-but-one iteration,
        matching an upload-immediately consumer).
        """
        res = self._native_scan() if native.get_lib() is not None else None
        if res is not None:
            payloads, offsets, sizes, ts, ports, ips = res
            lidar = self._lidar_mask(sizes, ports)
            res = None if not lidar.any() else \
                (payloads, offsets[lidar], ts[lidar])
        if res is None:
            # the native scanner supports a subset of capture variants; if
            # it saw no lidar-size datagrams, defer to the pure-Python
            # reader before concluding the capture is empty
            batch_f, batch_i, batch_t = [], [], []
            for fid, words, t in self._iter_python():
                batch_f.append(words)
                batch_i.append(fid)
                batch_t.append(t)
                if len(batch_f) == chunk:
                    yield (np.asarray(batch_i), np.stack(batch_f),
                           np.asarray(batch_t, np.uint64))
                    batch_f, batch_i, batch_t = [], [], []
            if batch_f:
                yield (np.asarray(batch_i), np.stack(batch_f),
                       np.asarray(batch_t, np.uint64))
            return

        payloads, offs, tss = res
        pkt_size = self.pf.lidar_packet_size
        g = self.pf.geom
        fid_byte, fid_shift = divmod(g.frame_id.bit_start, 8)
        fid_mask = (1 << g.frame_id.bit_size) - 1
        mid_byte = (self.plan.hw + self.plan.mid_word) * 4

        if chunk not in self._pools:
            pools = [np.empty((chunk, self.plan.n_pkts,
                               self.plan.pkt_words), dtype=np.uint32)
                     for _ in range(2)]
            for p in pools:
                p.fill(0)  # pre-fault now, not inside the grouping pass
            self._pools[chunk] = pools
        pools = self._pools[chunk]
        fid_out = np.zeros(chunk, np.int64)
        ts_out = np.zeros(chunk, np.uint64)
        released = np.full(1, -1, np.int64)
        pos, flip = 0, 0
        while pos < offs.size:
            pool = pools[flip]
            flip ^= 1
            consumed, nf = native.group_frames(
                payloads, offs[pos:], tss[pos:], pkt_size, fid_byte,
                fid_shift, fid_mask, mid_byte, self.plan.cpp,
                self.plan.n_pkts, pool, fid_out, ts_out,
                io_released=released)
            if nf == 0:
                break
            pos += consumed
            yield fid_out[:nf].copy(), pool[:nf], ts_out[:nf].copy()

    def iter_planar_chunks(self, chunk: int = 8,
                           words: Optional[Tuple[int, ...]] = None,
                           pool_depth: int = 2
                           ) -> Iterator[
            Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
        """Yield (frame_ids, planes (m, pw, h, W) u32, col_hdrs
        (m, chw, W) u32, host_ts): the word-planar staging the Pallas
        kernels consume with no in-kernel transpose and no XLA strided
        prep. Native-only (raises without the toolchain); same pooled
        double-buffer contract as iter_chunks.

        `words` selects a subset of packet words to stage (planes second
        dim becomes len(words), in the given order): projection-only
        consumers need just the range word(s), cutting host->device bytes
        to 1/pw (single-return) or 2/pw (dual) — pass the same tuple to
        unpack_project_planar_batched(words=...).

        LEGACY captures stage too: the native grouper ships the column
        FOOTER status word as one extra col-header row (col_hdrs is
        (m, plan.schw, W); schw = chw + 1 for LEGACY)."""
        res = self._native_scan() if native.get_lib() is not None else None
        if res is None:
            raise RuntimeError(
                "planar staging needs the native library; use iter_chunks")
        payloads, offsets, sizes, ts, ports, ips = res
        lidar = self._lidar_mask(sizes, ports)
        if not lidar.any():
            # capture variant the native scanner skips (it supports a
            # subset of linktypes/encapsulations): derive the planar
            # staging from the packet-layout path, which falls back to
            # the pure-Python reader — never silently yield nothing for
            # a capture that iter_chunks can read
            yield from self._planar_from_chunks(chunk, words)
            return
        offs, tss = offsets[lidar], ts[lidar]
        pkt_size = self.pf.lidar_packet_size

        plan = self.plan
        g = self.pf.geom
        fid_byte, fid_shift = divmod(g.frame_id.bit_start, 8)
        fid_mask = (1 << g.frame_id.bit_size) - 1
        key = ("planar", chunk, words, pool_depth)
        n_planes = len(words) if words is not None else plan.pw
        if key not in self._pools:
            pools = [(np.empty((chunk, n_planes, plan.h, plan.w),
                               dtype=np.uint32),
                      np.empty((chunk, plan.schw, plan.w),
                               dtype=np.uint32))
                     for _ in range(pool_depth)]
            for planes, hdrs in pools:
                planes.fill(0)
                hdrs.fill(0)
            self._pools[key] = pools
        pools = self._pools[key]
        # word subsetting happens inside the native pack (compacted
        # planes), so subset staging touches n_sel/pw of the bytes
        if words is not None and len(words) == 0:
            # n_sel == 0 means "all planes" to the native grouper, but
            # the pool above was sized for zero planes - heap overflow
            raise ValueError("words must be a non-empty tuple or None")
        word_sel = np.asarray(words, np.int64) if words is not None \
            else None
        fid_out = np.zeros(chunk, np.int64)
        ts_out = np.zeros(chunk, np.uint64)
        pos, flip = 0, 0
        while pos < offs.size:
            planes, hdrs = pools[flip]
            flip = (flip + 1) % len(pools)
            consumed, nf = native.group_frames_planar(
                payloads, offs[pos:], tss[pos:], pkt_size, fid_byte,
                fid_shift, fid_mask, self.pf.packet_header_size,
                self.pf.col_size, self.pf.col_header_size,
                plan.mid_word * 4, plan.cpp, plan.h, plan.pw, plan.w,
                planes, hdrs, fid_out, ts_out, word_sel=word_sel,
                ftr_words=plan.schw - plan.chw)
            if nf == 0:
                break
            pos += consumed
            yield (fid_out[:nf].copy(), planes[:nf], hdrs[:nf],
                   ts_out[:nf].copy())

    def _planar_from_chunks(self, chunk: int,
                            words: Optional[Tuple[int, ...]]
                            ) -> Iterator[Tuple[np.ndarray, np.ndarray,
                                                np.ndarray, np.ndarray]]:
        """Planar staging computed from the packet-layout chunks — the
        fallback when the native scanner can't parse the capture."""
        plan = self.plan
        for fids, frames, tss in self.iter_chunks(chunk):
            B = frames.shape[0]
            cols = frames[:, :, plan.hw:plan.hw + plan.cpp * plan.cw] \
                .reshape(B, plan.w, plan.cw)
            pix = cols[:, :, plan.chw:plan.chw + plan.h * plan.pw] \
                .reshape(B, plan.w, plan.h, plan.pw)
            planes = np.transpose(pix, (0, 3, 2, 1))   # (B, pw, h, w)
            if words is not None:
                planes = planes[:, list(words)]
            hdr_cols = cols[:, :, :plan.chw]
            if plan.schw > plan.chw:
                # LEGACY: append the column-footer status word(s)
                hdr_cols = np.concatenate(
                    [hdr_cols, cols[:, :, plan.cw - (plan.schw - plan.chw):
                                    plan.cw]], axis=2)
            hdrs = np.transpose(hdr_cols, (0, 2, 1))
            yield (fids, np.ascontiguousarray(planes),
                   np.ascontiguousarray(hdrs), tss)

    def _iter_python(self) -> Iterator[Tuple[int, np.ndarray, int]]:
        from ..ops.unpack import frame_words_from_packets

        reader = PcapReader(self._path)
        pkt_size = self.pf.lidar_packet_size
        current: List[bytes] = []
        current_fid: Optional[int] = None
        first_ts = 0
        for pi, payload in reader:
            if len(payload) != pkt_size:
                continue
            buf = np.frombuffer(payload, dtype=np.uint8)
            fid = self.pf.frame_id(buf)
            if current_fid is None:
                current_fid, first_ts = fid, pi.timestamp
            if fid != current_fid:
                yield (current_fid,
                       frame_words_from_packets(
                           [np.frombuffer(p, np.uint8) for p in current],
                           self.plan),
                       first_ts)
                current, current_fid, first_ts = [], fid, pi.timestamp
            current.append(payload)
        if current:
            yield (current_fid,
                   frame_words_from_packets(
                       [np.frombuffer(p, np.uint8) for p in current],
                       self.plan),
                   first_ts)

    def stream_from_packets(self, packets) -> Iterator[
            Tuple[int, np.ndarray, int]]:
        """Stage frames from any (idx, packet) iterable (e.g. a live
        SensorPacketSource): the TPU ingest path for streaming sources."""
        current: List[np.ndarray] = []
        current_fid: Optional[int] = None
        first_ts = 0
        pkt_size = self.pf.lidar_packet_size
        from ..ops.unpack import frame_words_from_packets

        for _, p in packets:
            if p.type().value != "Lidar" or p.buf.size != pkt_size:
                continue
            fid = self.pf.frame_id(p.buf)
            if current_fid is None:
                current_fid, first_ts = fid, p.host_timestamp
            if fid != current_fid:
                yield (current_fid,
                       frame_words_from_packets(current, self.plan),
                       first_ts)
                current, current_fid, first_ts = [], fid, p.host_timestamp
            current.append(p.buf)
        if current:
            yield (current_fid,
                   frame_words_from_packets(current, self.plan), first_ts)

    def read_all(self, max_frames: int = 0) -> Tuple[np.ndarray, np.ndarray]:
        """Stack all frames into a (B, n_pkts, pkt_words) batch ready for
        the batched device kernels; returns (batch, frame_ids)."""
        frames = []
        fids = []
        for fid, words, _ in self:
            frames.append(words)
            fids.append(fid)
            if max_frames and len(frames) >= max_frames:
                break
        if not frames:
            return (np.zeros((0, self.plan.n_pkts, self.plan.pkt_words),
                             np.uint32), np.zeros(0, np.int64))
        return np.stack(frames), np.asarray(fids)


class PlanarStreamAssembler:
    """Live ingest fast path: feed packets as they arrive (e.g. from a
    SensorPacketSource); completed frames come out word-planar, ready for
    the planar Pallas kernels — the streaming equivalent of
    iter_planar_chunks. Frame release follows the batcher's frame-id
    semantics (new id releases the previous frame); buffers are pooled
    (a released frame's views stay valid until the next-but-one release).
    """

    def __init__(self, info: SensorInfo):
        self.info = info
        self.pf = PacketFormat.from_info(info)
        self.plan = make_decode_plan(info)
        if native.get_lib() is None:
            raise RuntimeError("planar staging needs the native library")
        p = self.plan
        self._pools = [(np.zeros((1, p.pw, p.h, p.w), np.uint32),
                        np.zeros((1, p.schw, p.w), np.uint32))
                       for _ in range(2)]
        self._flip = 0
        self._cur_fid: Optional[int] = None
        self._bufs: List[bytes] = []
        self._ts = 0

    def _flush(self):
        p = self.plan
        payloads = np.frombuffer(b"".join(self._bufs), np.uint8)
        n = len(self._bufs)
        offsets = np.arange(n, dtype=np.int64) * self.pf.lidar_packet_size
        planes, hdrs = self._pools[self._flip]
        self._flip ^= 1
        g = self.pf.geom
        fid_byte, fid_shift = divmod(g.frame_id.bit_start, 8)
        fid_out = np.zeros(1, np.int64)
        ts_out = np.zeros(1, np.uint64)
        native.group_frames_planar(
            payloads, offsets, None, self.pf.lidar_packet_size, fid_byte,
            fid_shift, (1 << g.frame_id.bit_size) - 1,
            self.pf.packet_header_size, self.pf.col_size,
            self.pf.col_header_size, p.mid_word * 4, p.cpp, p.h, p.pw,
            p.w, planes, hdrs, fid_out, ts_out,
            ftr_words=p.schw - p.chw)
        out = (int(fid_out[0]), planes[0], hdrs[0], self._ts)
        self._bufs = []
        return out

    def push(self, packet) -> Optional[Tuple[int, np.ndarray, np.ndarray,
                                             int]]:
        """Feed one lidar packet; returns (frame_id, planes (pw, h, w),
        col_hdrs (chw, w), host_ts) when a frame releases, else None."""
        buf = packet.buf if hasattr(packet, "buf") else packet
        if len(buf) != self.pf.lidar_packet_size:
            return None
        fid = self.pf.frame_id(np.frombuffer(bytes(buf), np.uint8))
        out = None
        if self._cur_fid is not None and fid != self._cur_fid and \
                self._bufs:
            out = self._flush()
        if self._cur_fid != fid:
            self._cur_fid = fid
            self._ts = getattr(packet, "host_timestamp", 0)
        self._bufs.append(bytes(buf))
        return out

    def flush(self) -> Optional[Tuple[int, np.ndarray, np.ndarray, int]]:
        """Release the partial frame currently buffered."""
        if not self._bufs:
            return None
        return self._flush()
