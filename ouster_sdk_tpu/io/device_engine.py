"""Device-decode ScanSource engine: the TPU as the default SDK decoder.

This is the user-facing half of the device pipeline: `open_source()` /
`PcapScanSource` route scan iteration through here whenever the capture is
eligible, so the hot path users actually run IS the device path — exactly
like the reference, whose every ScanSource iteration runs the compiled
block parser (ref: open_source.cpp:205-245, parsing.cpp:653-702). The
numpy ScanBatcher remains the streaming/fallback decoder and the semantic
oracle: scans produced here are bit-equal to it (enforced by
tests/test_device_scan_source.py and the digest conformance suite).

Pipeline per batch: native pcap scan + IPv4 reassembly + word-planar pack
with batcher frame-boundary semantics (FrameReader.iter_scan_batches, on
a background staging thread) -> one h2d upload -> fused XLA bit-decode of
every field (ops/unpack.decode_frame_planar_batch) -> one d2h download ->
LidarScan materialization.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..core.batcher import _frame_status
from ..core.lidar_scan import LidarScan
from ..core.types import SensorInfo, UDPProfileIMU, UDPProfileLidar
from ..ops.packet_format import PacketFormat, read_bits
from ..ops.unpack import make_decode_plan
from ..utils import native

#: Introspection counters (reset freely in tests): proof of which engine
#: actually decoded (the CLI test asserts batches > 0 after `source ...
#: stats` with the device route forced).
stats = {"batches": 0, "scans": 0}


def device_decode_enabled() -> bool:
    """Resolve the routing policy: OUSTER_SDK_TPU_DEVICE_DECODE=1 forces
    the device route anywhere (tests use this on CPU), =0 disables it;
    otherwise the route engages when jax's default backend is an
    accelerator (TPU). On CPU-only hosts the numpy batcher is faster than
    XLA-decode + copies, so auto stays off there."""
    env = os.environ.get("OUSTER_SDK_TPU_DEVICE_DECODE", "").strip()
    if env == "1":
        return True
    if env == "0":
        return False
    try:
        import jax

        return jax.devices()[0].platform in ("tpu",)
    except Exception:
        return False


def supports_device_decode(info: SensorInfo,
                           field_names: Optional[List[str]] = None,
                           raw_headers: bool = False,
                           raw_fields: bool = False) -> bool:
    """Static eligibility: the device route covers eUDP lidar decode;
    NMEA-IMU and zone-monitoring scans run HYBRID (lidar fields decode
    on device, aux packets batch host-side into the matching scan by
    frame id — see _AuxApplier). Only LEGACY footer-status packets and
    RAW_HEADERS/RAW32 side-channels stay on the numpy batcher."""
    if native.get_lib() is None:
        return False
    fmt = info.format
    if fmt.udp_profile_lidar in (UDPProfileLidar.LEGACY,
                                 UDPProfileLidar.OFF):
        return False
    if raw_headers or raw_fields:
        return False
    plan = make_decode_plan(info)
    if plan.status_word >= plan.chw:
        return False
    if field_names is not None:
        decodable = {f.name.split("#")[0] for f in plan.fields}
        if not set(field_names) <= decodable:
            return False
    return True


def materialize_scan(info: SensorInfo, pf: PacketFormat, plan,
                     host: Dict[str, np.ndarray], k: int, frame_id: int,
                     pkt_ts_row: np.ndarray, pkt_hdrs_row: np.ndarray,
                     first_hdr_row: np.ndarray,
                     field_types=None) -> LidarScan:
    """Build a LidarScan from one decoded frame: field arrays from the
    device-decode output dict (slot k) plus headers read from the staged
    packet-header words — the same population the numpy ScanBatcher does
    per packet (ref: lidar_scan.cpp:1324-1372, :1546-1552)."""
    ls = LidarScan(info, field_types=field_types)
    ls.frame_id = int(frame_id)
    ls.sensor_info = info

    combined: Dict[str, np.ndarray] = {}
    multi: Dict[str, List[np.ndarray]] = {}
    for f in plan.fields:
        if "#" in f.name:
            multi.setdefault(f.name.split("#")[0], []).append(
                host[f.name][k])
        else:
            combined[f.name] = host[f.name][k]
    for name, parts in multi.items():
        combined[name] = np.stack(parts, axis=-1)
    for name, arr in combined.items():
        if ls.has_field(name):
            ls.field(name)[:] = arr

    ls.timestamp[:] = (host["timestamp_lo"][k].astype(np.uint64)
                       | host["timestamp_hi"][k].astype(np.uint64)
                       << np.uint64(32))
    ls.measurement_id[:] = host["measurement_id"][k]
    ls.status[:] = host["status"][k]
    ls.packet_timestamp[:] = pkt_ts_row
    ls.alert_flags[:] = read_bits(
        pkt_hdrs_row, pf.geom.alert_flags).astype(np.uint8)

    ls.frame_status = _frame_status(
        int(read_bits(first_hdr_row, pf.geom.thermal_shutdown)),
        int(read_bits(first_hdr_row, pf.geom.shot_limiting)))
    ls.shutdown_countdown = int(
        read_bits(first_hdr_row, pf.geom.countdown_thermal_shutdown))
    ls.shot_limiting_countdown = int(
        read_bits(first_hdr_row, pf.geom.countdown_shot_limiting))
    return ls


class _AuxApplier:
    """Host-side half of the HYBRID device route: applies IMU/zone
    packets to a device-decoded scan with the numpy batcher's own field
    writers, so aux population is definitionally identical to the
    ScanBatcher path (ref: lidar_scan.cpp:1374 batch_imu_packet, :1458
    batch_zone_packet)."""

    def __init__(self, info: SensorInfo):
        from ..core.batcher import ScanBatcher

        self._b = ScanBatcher(info)
        self.expected_imu = self._b._expected_imu_packets
        self.expected_zone = self._b._expected_zone_packets

    @staticmethod
    def wanted(info: SensorInfo) -> bool:
        fmt = info.format
        return (fmt.udp_profile_imu == UDPProfileIMU.ACCEL32_GYRO32_NMEA
                or getattr(fmt, "zone_monitoring_enabled", False))

    def apply(self, kind: str, buf: np.ndarray, host_ts: int,
              ls: LidarScan) -> None:
        from ..core.packets import ImuPacket, ZonePacket

        if kind == "imu":
            self._b._batch_imu_packet(ImuPacket(buf, host_ts), ls)
        else:
            self._b._batch_zone_packet(ZonePacket(buf, host_ts), ls)


class DeviceScanIterator:
    """Iterate LidarScans for ONE sensor from a pcap via device decode.

    Scans are bit-equal to ScanBatcher output for eligible captures: same
    fields, column headers, per-packet timestamps/alert flags, frame
    status/countdowns, boundary drop semantics and trailing-scan validity
    filter (ref: lidar_scan.cpp:1505-1643, pcap_scan_source.cpp flush).
    """

    def __init__(self, path: str, info: SensorInfo,
                 field_names: Optional[List[str]] = None,
                 soft_id_check: bool = False,
                 batch: int = 4,
                 field_types=None,
                 pipelined: bool = True):
        from .frames import FrameReader

        self.info = info
        self.pf = PacketFormat.from_info(info)
        self._reader = FrameReader(path, info=info)
        self._soft = soft_id_check
        self._batch = batch
        self._pipelined = pipelined
        names = tuple(field_names) if field_names is not None else None
        self.plan = make_decode_plan(info, field_names=names)
        self._field_types = field_types
        self._decode = None  # jit, built lazily on first batch
        # hybrid aux route: imu/zone packets keyed by frame id, merged
        # into the device-decoded scan at materialization
        self._aux = _AuxApplier(info)
        self._aux_by_fid: Dict[int, List] = {}
        if _AuxApplier.wanted(info):
            for kind, fid, buf, ts in self._reader.aux_packets():
                self._aux_by_fid.setdefault(fid, []).append(
                    (kind, buf, ts))

    @property
    def id_error_count(self) -> int:
        return self._reader.id_error_count

    def _make_decode(self):
        import functools

        import jax

        from ..ops.unpack import decode_frame_planar_batch

        plan = self.plan

        @functools.partial(jax.jit, static_argnames=())
        def decode(planes, hdrs):
            return decode_frame_planar_batch(planes, hdrs, plan, True)

        return decode

    def _materialize(self, batch, k: int,
                     host: Dict[str, np.ndarray]) -> LidarScan:
        ls = materialize_scan(
            self.info, self.pf, self.plan, host, k,
            int(batch.frame_ids[k]), batch.pkt_ts[k], batch.pkt_hdrs[k],
            batch.first_hdr[k], self._field_types)
        if self._aux_by_fid:
            for kind, buf, ts in self._aux_by_fid.pop(ls.frame_id, ()):
                self._aux.apply(kind, buf, ts, ls)
        return ls

    def __iter__(self) -> Iterator[LidarScan]:
        import jax

        if self._decode is None:
            self._decode = self._make_decode()
        B = self._batch
        if self._pipelined:
            batches = self._reader.iter_scan_batches_pipelined(
                B, soft_id_check=self._soft)
        else:
            batches = self._reader.iter_scan_batches(
                B, soft_id_check=self._soft)

        prev: Optional[Tuple] = None  # (batch-meta, host-dict, k) lookahead
        for batch in batches:
            nf = batch.frame_ids.size
            planes, hdrs = batch.planes, batch.col_hdrs
            if nf < B:
                pad = B - nf
                planes = np.concatenate(
                    [planes,
                     np.broadcast_to(planes[-1:], (pad,) + planes.shape[1:])])
                hdrs = np.concatenate(
                    [hdrs,
                     np.broadcast_to(hdrs[-1:], (pad,) + hdrs.shape[1:])])
            dev = self._decode(jax.device_put(planes), jax.device_put(hdrs))
            host = jax.device_get(dev)
            stats["batches"] += 1
            for k in range(nf):
                if prev is not None:
                    stats["scans"] += 1
                    yield prev
                prev = self._materialize(batch, k, host)
        if prev is not None:
            # trailing-scan validity filter: the batcher only flushes a
            # final partial scan that has at least one valid column
            # (ref: pcap_scan_source flush; PcapScanSource._iter_scans)
            if np.any(prev.status & 1):
                stats["scans"] += 1
                yield prev


class LiveDeviceBatcher:
    """Frame-batch device handoff for the LIVE path: per-packet host work
    collapses to a memcpy into a staging slab (plus an 8-byte frame-id /
    2-byte measurement-id peek); whole frames then decode on the device
    in one fused dispatch — the live twin of DeviceScanIterator, with
    ScanBatcher's boundary semantics replicated at the slab level
    (ref: lidar_scan.cpp:1505-1643 reorder/duplicate/zero-fill,
    :1605-1617 count-based completion; sensor_scan_source.cpp:185
    batcher thread).

    push() returns the scans released by this packet (0 or 1).
    Bit-equality with the numpy ScanBatcher on the same packet stream
    is enforced by tests/test_hil_emulated.py.
    """

    def __init__(self, info: SensorInfo, field_types=None):
        self.info = info
        self.pf = PacketFormat.from_info(info)
        self.plan = make_decode_plan(info)
        g = self.pf.geom
        self._fid_byte, self._fid_shift = divmod(g.frame_id.bit_start, 8)
        self._fid_mask = (1 << g.frame_id.bit_size) - 1
        self._mid_byte = self.pf.packet_header_size + \
            (self.plan.mid_word * 4)
        self._hw = self.pf.packet_header_size // 4
        plan = self.plan
        cap = plan.n_pkts + 8  # one frame + straggler slack
        self._slab = np.zeros((cap, self.pf.lidar_packet_size), np.uint8)
        self._offsets = (np.arange(cap, dtype=np.int64)
                         * self.pf.lidar_packet_size)
        self._ts = np.zeros(cap, np.uint64)
        self._n = 0
        self._cur = -1            # fid of the open frame
        self._released = -1       # fid of the last released frame
        self._slots: set = set()  # distinct packet slots with ts != 0
        # single-frame outputs: the slab only ever holds one frame id
        # (a boundary flush precedes staging a new id)
        self._planes = np.zeros((1, plan.pw, plan.h, plan.w), np.uint32)
        self._colhdr = np.zeros((1, plan.chw, plan.w), np.uint32)
        self._fid_out = np.zeros(1, np.int64)
        self._ts_out = np.zeros(1, np.uint64)
        self._pkt_ts = np.zeros((1, plan.n_pkts), np.uint64)
        self._pkt_hdrs = np.zeros((1, plan.n_pkts, self._hw), np.uint32)
        self._first_hdr = np.zeros((1, self._hw), np.uint32)
        self._field_types = field_types
        self._decode = None
        # hybrid aux route (NMEA imu / zone packets for the open frame)
        self._aux = _AuxApplier(info)
        self._aux_pending: List[Tuple[str, np.ndarray, int]] = []
        self._aux_counts = {"imu": 0, "zone": 0}

    def _make_decode(self):
        import jax

        from ..ops.unpack import decode_frame_planar_batch

        plan = self.plan

        def decode(planes, hdrs):
            return decode_frame_planar_batch(planes, hdrs, plan, True)

        return jax.jit(decode)

    def _admit(self, fid: int) -> Optional[List[LidarScan]]:
        """Shared boundary logic: returns scans released by a frame-id
        change, or None when the packet must be dropped
        (straggler/duplicate rules, ref: lidar_scan.cpp:1526-1565)."""
        out: List[LidarScan] = []
        m = self._fid_mask
        if self._cur >= 0 and fid != self._cur:
            if fid == (self._cur - 1) & m:
                return None
            if self._released >= 0 and (
                    fid == self._released
                    or self._released == (fid + 1) & m):
                return None
            out.extend(self._flush())
        if self._cur < 0:
            if self._released >= 0 and (
                    fid == self._released
                    or self._released == (fid + 1) & m):
                return None
            self._cur = fid
        return out

    def _complete(self) -> bool:
        """Count-based completion incl. aux, mirroring
        _check_scan_complete (lidar_scan.cpp:1605-1617)."""
        return (self._n >= self.plan.n_pkts
                and len(self._slots) >= self.plan.n_pkts
                and self._aux_counts["imu"] >= self._aux.expected_imu
                and self._aux_counts["zone"] >= self._aux.expected_zone)

    def push_aux(self, kind: str, buf: np.ndarray, host_ts: int
                 ) -> List[LidarScan]:
        """Stage one IMU/zone packet for the open frame (hybrid route):
        applied to the device-decoded scan at release with the numpy
        batcher's own writers."""
        fid = self._fid_of(buf)
        out = self._admit(fid)
        if out is None:
            return []
        self._aux_pending.append((kind, buf.copy(), host_ts))
        self._aux_counts[kind] += 1
        if self._complete():
            out.extend(self._flush())
        return out

    def _fid_of(self, buf: np.ndarray) -> int:
        word = int.from_bytes(
            buf[self._fid_byte:self._fid_byte + 8].tobytes(), "little")
        return (word >> self._fid_shift) & self._fid_mask

    def push(self, buf: np.ndarray, host_ts: int) -> List[LidarScan]:
        """Stage one validated lidar packet; returns released scans."""
        fid = self._fid_of(buf)
        out = self._admit(fid)
        if out is None:
            return []
        if self._n >= self._slab.shape[0]:
            # pathological duplicate storm: grow rather than split the
            # frame (the numpy batcher keeps accumulating too)
            cap = self._slab.shape[0] * 2
            slab = np.zeros((cap, self._slab.shape[1]), np.uint8)
            slab[:self._n] = self._slab[:self._n]
            self._slab = slab
            self._offsets = (np.arange(cap, dtype=np.int64)
                             * self.pf.lidar_packet_size)
            self._ts = np.concatenate(
                [self._ts, np.zeros(cap - self._ts.size, np.uint64)])
        self._slab[self._n, :len(buf)] = buf
        self._ts[self._n] = host_ts
        self._n += 1
        if host_ts:
            mid0 = int.from_bytes(
                buf[self._mid_byte:self._mid_byte + 2].tobytes(),
                "little")
            self._slots.add(mid0 // self.plan.cpp)
        # completion mirrors the numpy batcher (lidar_scan.cpp:1605-1617
        # + _check_scan_complete): enough packets batched AND every
        # packet slot stamped (duplicates do not complete a frame early)
        # AND the expected aux (imu/zone) packets arrived
        if self._complete():
            out.extend(self._flush())
        return out

    def _flush(self) -> List[LidarScan]:
        """Group + device-decode the pending packets (one frame run),
        then merge the pending aux packets (hybrid route)."""
        aux = self._aux_pending
        self._aux_pending = []
        self._aux_counts = {"imu": 0, "zone": 0}
        if self._n == 0:
            # aux-only frame released at a boundary: the numpy batcher
            # emits it with zeroed lidar fields; mirror that
            if not aux or self._cur < 0:
                self._cur = -1
                return []
            ls = LidarScan(self.info, field_types=self._field_types)
            ls.frame_id = self._cur
            ls.sensor_info = self.info
            for kind, buf, ts in aux:
                self._aux.apply(kind, buf, ts, ls)
            self._released = self._cur
            self._cur = -1
            stats["scans"] += 1
            return [ls]
        import jax

        if self._decode is None:
            self._decode = self._make_decode()
        plan = self.plan
        res = native.group_frames_planar(
            self._slab, self._offsets[:self._n], self._ts[:self._n],
            self.pf.lidar_packet_size, self._fid_byte, self._fid_shift,
            self._fid_mask, self.pf.packet_header_size, self.pf.col_size,
            self.pf.col_header_size, plan.mid_word * 4, plan.cpp, plan.h,
            plan.pw, plan.w, self._planes, self._colhdr, self._fid_out,
            self._ts_out, out_pkt_ts=self._pkt_ts,
            out_pkt_hdrs=self._pkt_hdrs, out_first_hdr=self._first_hdr)
        self._released = self._cur if self._cur >= 0 else self._released
        self._n = 0
        self._cur = -1
        self._slots.clear()
        if res is None:
            return []
        _, nf = res
        if nf == 0:
            return []
        dev = self._decode(jax.device_put(self._planes[:1]),
                           jax.device_put(self._colhdr[:1]))
        host = jax.device_get(dev)
        stats["batches"] += 1
        scan = materialize_scan(
            self.info, self.pf, plan, host, 0,
            int(self._fid_out[0]), self._pkt_ts[0], self._pkt_hdrs[0],
            self._first_hdr[0], self._field_types)
        for kind, buf, ts in aux:
            self._aux.apply(kind, buf, ts, scan)
        stats["scans"] += 1
        return [scan]
