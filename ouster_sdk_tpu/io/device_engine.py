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

    def counts(self, kind: str, buf: np.ndarray) -> bool:
        """Whether this packet increments the batcher's completion
        counter: _batch_imu_packet rejects malformed measurement ids /
        degenerate metadata WITHOUT counting (batcher.py:321-328), so a
        corrupt packet must not complete a frame early here either.
        Zone packets always count (no early return in the writer)."""
        if kind != "imu":
            return True
        pf, w = self._b.pf, self._b.w
        ippf = pf.imu_packets_per_frame
        mpp = pf.imu_measurements_per_packet
        if ippf <= 0 or mpp <= 0 or w < ippf:
            return False
        _, m_id, _ = pf.imu_measurement_headers(buf)
        return 0 <= int(m_id[0]) // (w // ippf) < ippf

    def apply(self, kind: str, buf: np.ndarray, host_ts: int,
              ls: LidarScan) -> None:
        from ..core.packets import ImuPacket, ZonePacket

        if kind == "imu":
            self._b._batch_imu_packet(ImuPacket(buf, host_ts), ls)
        else:
            self._b._batch_zone_packet(ZonePacket(buf, host_ts), ls)


def _read_opener(pf: PacketFormat, buf: np.ndarray) -> Tuple[int, int, int]:
    """(frame_status, shutdown_countdown, shot_limiting_countdown) from a
    frame-OPENING packet's header — the batcher populates these from
    whichever packet starts the scan, lidar or aux alike
    (ref: lidar_scan.cpp:1546-1552; batcher.py:115-118)."""
    return (_frame_status(pf.thermal_shutdown(buf), pf.shot_limiting(buf)),
            pf.countdown_thermal_shutdown(buf),
            pf.countdown_shot_limiting(buf))


class _FrameInstance:
    """One frame the admission simulation released: which aux packets
    the batcher would have admitted to it, whether any lidar packets
    opened/filled it, the opener header when an AUX packet opened it,
    and whether it was released at a boundary (vs left open at EOF)."""

    __slots__ = ("fid", "has_lidar", "aux", "opener", "boundary",
                 "lidar_n", "slots", "counts")

    def __init__(self, fid: int, opener):
        self.fid = fid
        self.has_lidar = False
        self.aux: List[Tuple[str, np.ndarray, int]] = []
        self.opener = opener          # (fs, sd, sl) or None (lidar opener)
        self.boundary = True
        self.lidar_n = 0
        self.slots: set = set()
        self.counts = {"imu": 0, "zone": 0}


class _AuxRouter:
    """Replays the ScanBatcher admission state machine (batcher.py:97-139,
    ref: lidar_scan.cpp:1505-1591) over the capture's interleaved
    lidar/aux event order, so the pcap hybrid route assigns aux packets
    to frames EXACTLY as the oracle does: reordered stragglers and
    post-release duplicates drop, aux-only frames are emitted in release
    order, the frame-opening packet's header supplies frame_status, and
    count-based completion (incl. the malformed-imu no-count rule)
    releases frames at the same packet the oracle would. Frame-id wraps
    are instance-scoped, not dict-by-fid, so hour-long captures can't
    alias aux across the 16-bit fid period."""

    def __init__(self, aux: _AuxApplier, plan, pf: PacketFormat,
                 events) -> None:
        m = pf.max_frame_id
        exp_l = plan.n_pkts
        instances: List[_FrameInstance] = []
        cur: Optional[_FrameInstance] = None
        finished = -1

        def release(inst: _FrameInstance, boundary: bool) -> int:
            inst.boundary = boundary
            instances.append(inst)
            return inst.fid

        for ev in events:
            kind, fid = ev[0], ev[1]
            if cur is None:
                if finished >= 0 and (finished == fid
                                      or finished == (fid + 1) & m):
                    continue  # duplicate / reorder past a released frame
                cur = _FrameInstance(
                    fid, None if kind == "lidar"
                    else _read_opener(pf, ev[2]))
            elif cur.fid == (fid + 1) & m:
                continue      # reordered packet from the previous frame
            elif cur.fid != fid:
                # boundary: release, then the cached packet opens the new
                # frame (its drop rules vs the just-released id cannot
                # fire: fid != cur and cur != (fid+1)&m were checked)
                finished = release(cur, True)
                cur = _FrameInstance(
                    fid, None if kind == "lidar"
                    else _read_opener(pf, ev[2]))
            if kind == "lidar":
                cur.has_lidar = True
                cur.lidar_n += 1
                slot, ts = ev[2], ev[3]
                if ts and 0 <= slot < exp_l:
                    cur.slots.add(slot)
            else:
                buf, ts = ev[2], ev[3]
                cur.aux.append((kind, buf, ts))
                if aux.counts(kind, buf):
                    cur.counts[kind] += 1
            if (cur.lidar_n >= exp_l and len(cur.slots) >= exp_l
                    and cur.counts["imu"] >= aux.expected_imu
                    and cur.counts["zone"] >= aux.expected_zone):
                finished = release(cur, True)
                cur = None
        if cur is not None:
            release(cur, False)   # left open at EOF (trailing)
        self.instances = instances


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
        # hybrid aux route: replay the batcher's admission over the
        # interleaved lidar/aux capture order once, so aux assignment,
        # straggler drops and aux-only frame emission match the oracle
        self._aux: Optional[_AuxApplier] = None
        self._instances: List[_FrameInstance] = []
        if _AuxApplier.wanted(info):
            self._aux = _AuxApplier(info)
            self._instances = _AuxRouter(
                self._aux, self.plan, self.pf,
                self._reader.hybrid_events(soft_id_check=soft_id_check)
            ).instances

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
        return materialize_scan(
            self.info, self.pf, self.plan, host, k,
            int(batch.frame_ids[k]), batch.pkt_ts[k], batch.pkt_hdrs[k],
            batch.first_hdr[k], self._field_types)

    def _aux_only_scan(self, inst: _FrameInstance) -> LidarScan:
        """A frame the batcher opened on an aux packet and released at a
        boundary with no lidar packets: emitted with zeroed lidar fields,
        like the oracle (a scan opened by ANY packet releases at the next
        frame boundary — batcher.py:123-126)."""
        ls = LidarScan(self.info, field_types=self._field_types)
        ls.frame_id = inst.fid
        ls.sensor_info = self.info
        for kind, buf, ts in inst.aux:
            self._aux.apply(kind, buf, ts, ls)
        ls.frame_status, ls.shutdown_countdown, \
            ls.shot_limiting_countdown = inst.opener
        return ls

    def _attach_aux(self, ls: LidarScan, ptr: int
                    ) -> Tuple[int, Optional[bool]]:
        """Advance the instance pointer past this lidar frame: yields-via-
        side-list any aux-only instances released before it, applies the
        matching instance's aux packets and opener header to `ls`, and
        returns (new ptr, boundary flag of the matched instance or None
        when the simulation and the native grouping disagree)."""
        inst = self._instances
        while ptr < len(inst) and not inst[ptr].has_lidar:
            if inst[ptr].boundary:
                stats["scans"] += 1
                self._aux_ready.append(self._aux_only_scan(inst[ptr]))
            ptr += 1
        if ptr < len(inst) and inst[ptr].fid == ls.frame_id:
            cur = inst[ptr]
            for kind, buf, ts in cur.aux:
                self._aux.apply(kind, buf, ts, ls)
            if cur.opener is not None:
                ls.frame_status, ls.shutdown_countdown, \
                    ls.shot_limiting_countdown = cur.opener
            return ptr + 1, cur.boundary
        return ptr, None

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

        ptr = 0
        self._aux_ready: List[LidarScan] = []
        # one-scan lookahead: only the FINAL scan (left open at EOF) gets
        # the batcher's trailing validity filter
        prev: Optional[Tuple[LidarScan, Optional[bool]]] = None
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
                    yield prev[0]
                ls = self._materialize(batch, k, host)
                boundary: Optional[bool] = None
                if self._aux is not None:
                    ptr, boundary = self._attach_aux(ls, ptr)
                # aux-only frames released before this one come first
                for ready in self._aux_ready:
                    yield ready
                self._aux_ready.clear()
                prev = (ls, boundary)
        if prev is not None:
            ls, boundary = prev
            # trailing-scan validity filter: the batcher only flushes a
            # final partial scan that has at least one valid column
            # (ref: pcap_scan_source flush; PcapScanSource._iter_scans).
            # A frame the simulation saw released at a BOUNDARY (aux-only
            # frames follow it) is not trailing and always emits.
            if boundary or np.any(ls.status & 1):
                stats["scans"] += 1
                yield ls
        # aux-only frames released after the last lidar frame (the one
        # still open at EOF is trailing-invalid and never emits)
        for inst in self._instances[ptr:]:
            if not inst.has_lidar and inst.boundary:
                stats["scans"] += 1
                yield self._aux_only_scan(inst)


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
        # hybrid aux route (NMEA imu / zone packets for the open frame);
        # the applier (a full ScanBatcher) exists only for profiles that
        # carry aux streams
        self._aux = _AuxApplier(info) if _AuxApplier.wanted(info) else None
        self._aux_pending: List[Tuple[str, np.ndarray, int]] = []
        self._aux_counts = {"imu": 0, "zone": 0}
        # frame-opening packet's header feeds frame_status/countdowns
        # (batcher.py:115-118) — an aux packet can open the frame
        self._opener = (0, 0, 0)

    def _make_decode(self):
        import jax

        from ..ops.unpack import decode_frame_planar_batch

        plan = self.plan

        def decode(planes, hdrs):
            return decode_frame_planar_batch(planes, hdrs, plan, True)

        return jax.jit(decode)

    @property
    def expected_imu_packets(self) -> int:
        return self._aux.expected_imu if self._aux is not None else 0

    @property
    def expected_zone_packets(self) -> int:
        return self._aux.expected_zone if self._aux is not None else 0

    def _admit(self, fid: int, buf: np.ndarray
               ) -> Tuple[List[LidarScan], bool]:
        """Shared boundary logic: returns (scans released by a frame-id
        change, whether the packet is admitted). A packet from a NEW
        frame always releases the open one first — the oracle finalizes
        and caches the packet, then re-runs the drop rules against the
        JUST-released id, never a stale one (batcher.py:97-126,
        ref: lidar_scan.cpp:1526-1565)."""
        m = self._fid_mask
        if self._cur >= 0:
            if fid == self._cur:
                return [], True
            if fid == (self._cur - 1) & m:
                return [], False  # reordered from the previous frame
            out = self._flush()
        else:
            out = []
        if self._released >= 0 and (fid == self._released
                                    or self._released == (fid + 1) & m):
            return out, False     # duplicate / reorder past a release
        self._cur = fid
        self._opener = _read_opener(self.pf, buf)
        return out, True

    def _complete(self) -> bool:
        """Count-based completion incl. aux, mirroring
        _check_scan_complete (lidar_scan.cpp:1605-1617)."""
        return (self._n >= self.plan.n_pkts
                and len(self._slots) >= self.plan.n_pkts
                and self._aux_counts["imu"] >= self.expected_imu_packets
                and self._aux_counts["zone"] >= self.expected_zone_packets)

    def push_aux(self, kind: str, buf: np.ndarray, host_ts: int
                 ) -> List[LidarScan]:
        """Stage one IMU/zone packet for the open frame (hybrid route):
        applied to the device-decoded scan at release with the numpy
        batcher's own writers. Malformed packets the oracle's writer
        rejects are staged (the writer will no-op on them identically)
        but do NOT count toward completion (batcher.py:321-328)."""
        if self._aux is None:
            return []
        fid = self._fid_of(buf)
        out, ok = self._admit(fid, buf)
        if not ok:
            return out
        self._aux_pending.append((kind, buf.copy(), host_ts))
        if self._aux.counts(kind, buf):
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
        out, ok = self._admit(fid, buf)
        if not ok:
            return out
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
            slot = mid0 // self.plan.cpp
            if 0 <= slot < self.plan.n_pkts:
                # out-of-range slots never stamp packet_timestamp in the
                # oracle (batcher.py:177) so they must not complete here
                self._slots.add(slot)
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
                if self._cur >= 0:
                    self._released = self._cur
                self._cur = -1
                return []
            ls = LidarScan(self.info, field_types=self._field_types)
            ls.frame_id = self._cur
            ls.sensor_info = self.info
            for kind, buf, ts in aux:
                self._aux.apply(kind, buf, ts, ls)
            ls.frame_status, ls.shutdown_countdown, \
                ls.shot_limiting_countdown = self._opener
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
        # frame_status/countdowns come from the frame-OPENING packet —
        # which may be an aux packet, not the first lidar packet the
        # staged first_hdr carries (batcher.py:115-118)
        scan.frame_status, scan.shutdown_countdown, \
            scan.shot_limiting_countdown = self._opener
        for kind, buf, ts in aux:
            self._aux.apply(kind, buf, ts, scan)
        stats["scans"] += 1
        return [scan]
