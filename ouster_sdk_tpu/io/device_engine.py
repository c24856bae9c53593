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
    """Static eligibility: the device route covers the lidar-only eUDP
    decode the planar staging understands. Everything else (LEGACY
    footer-status packets, NMEA-IMU / zone-monitoring scans that need
    non-lidar packets batched in, RAW_HEADERS/RAW32 side-channels) stays
    on the numpy batcher."""
    if native.get_lib() is None:
        return False
    fmt = info.format
    if fmt.udp_profile_lidar in (UDPProfileLidar.LEGACY,
                                 UDPProfileLidar.OFF):
        return False
    if fmt.udp_profile_imu == UDPProfileIMU.ACCEL32_GYRO32_NMEA:
        return False
    if getattr(fmt, "zone_monitoring_enabled", False):
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
        info, pf = self.info, self.pf
        ls = LidarScan(info, field_types=self._field_types)
        ls.frame_id = int(batch.frame_ids[k])
        ls.sensor_info = info

        combined: Dict[str, np.ndarray] = {}
        multi: Dict[str, List[np.ndarray]] = {}
        for f in self.plan.fields:
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
        ls.packet_timestamp[:] = batch.pkt_ts[k]
        ls.alert_flags[:] = read_bits(
            batch.pkt_hdrs[k], pf.geom.alert_flags).astype(np.uint8)

        first = batch.first_hdr[k]
        ls.frame_status = _frame_status(
            int(read_bits(first, pf.geom.thermal_shutdown)),
            int(read_bits(first, pf.geom.shot_limiting)))
        ls.shutdown_countdown = int(
            read_bits(first, pf.geom.countdown_thermal_shutdown))
        ls.shot_limiting_countdown = int(
            read_bits(first, pf.geom.countdown_shot_limiting))
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
