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
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..core.types import SensorInfo
from ..ops.packet_format import PacketFormat
from ..ops.unpack import DecodePlan, make_decode_plan
from ..utils import native
from .pcap import _PCAP_MAGICS, PcapReader
from .pcap_source import resolve_metadata_paths


class FrameReader:
    """Iterate (frame_id, (n_pkts, pkt_words) u32, host_ts) frames for one
    sensor from a pcap."""

    def __init__(self, pcap_path: str,
                 info: Optional[SensorInfo] = None,
                 metadata_path: Optional[str] = None):
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

    def _native_scan(self):
        with open(self._path, "rb") as f:
            data = f.read()
        if len(data) < 24:
            return (np.zeros(0, np.uint8), np.zeros(0, np.int64),
                    np.zeros(0, np.int64), np.zeros(0, np.uint64),
                    np.zeros(0, np.uint32), np.zeros(0, np.uint32))
        magic_le = struct.unpack("<I", data[:4])[0]
        magic = magic_le if magic_le in _PCAP_MAGICS else \
            struct.unpack(">I", data[:4])[0]
        if magic not in _PCAP_MAGICS:
            raise ValueError("unknown pcap magic")
        swap = magic_le not in _PCAP_MAGICS
        ts_nano = _PCAP_MAGICS[magic][1] == 1
        linktype = struct.unpack(
            ("<" if not swap else ">") + "I", data[20:24])[0] & 0x0FFFFFFF
        return native.pcap_scan(data, swap, ts_nano, linktype)

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray, int]]:
        res = self._native_scan() if native.get_lib() is not None else None
        if res is None:
            yield from self._iter_python()
            return

        payloads, offsets, sizes, ts, ports, ips = res
        pkt_size = self.pf.lidar_packet_size
        lidar = sizes == pkt_size
        if not lidar.any():
            # the native scanner supports a subset of capture variants; if it
            # saw no lidar-size datagrams, defer to the pure-Python reader
            # before concluding the capture is empty
            yield from self._iter_python()
            return
        offs = offsets[lidar]
        tss = ts[lidar]

        # frame ids of every packet, vectorized from the staged bytes
        n = offs.size
        stride_words = pkt_size // 4
        # gather packets into one dense (n, words) array (single pass copy)
        dense = np.empty((n, pkt_size), dtype=np.uint8)
        for i, o in enumerate(offs):  # memcpy loop; native stage below
            dense[i] = payloads[o:o + pkt_size]
        words = dense.reshape(n, -1).view("<u4")
        g = self.pf.geom
        from ..ops.packet_format import read_bits

        fids = read_bits(words, g.frame_id)

        # group consecutive packets by frame id (arrival order)
        change = np.concatenate([[True], fids[1:] != fids[:-1]])
        starts = np.flatnonzero(change)
        ends = np.concatenate([starts[1:], [n]])
        for s, e in zip(starts, ends):
            frame = np.zeros((self.plan.n_pkts, self.plan.pkt_words),
                             dtype=np.uint32)
            mid = words[s:e, self.plan.hw + self.plan.mid_word] & 0xFFFF
            slots = (mid // self.plan.cpp).astype(np.int64)
            ok = (slots >= 0) & (slots < self.plan.n_pkts)
            frame[slots[ok]] = words[s:e][ok]
            yield int(fids[s]), frame, int(tss[s])

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
