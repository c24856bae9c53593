"""Active time correction: reconcile multi-sensor clocks before SLAM.

Rebuild of the reference ActiveTimeCorrection (ref: ouster_mapping/src/
active_time_correction.{h,cpp}:290): checks inter-sensor synchronization
and column-timestamp monotonicity; when sensor clocks disagree (no PTP),
falls back to packet-receive-time offsets so all scans share one timeline.
Offsets are applied to scan timestamps in update() and removed in reset().
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..core.lidar_scan import LidarScan
from ..core.logging import logger
from ..core.types import SensorInfo

# sensors whose frame windows differ by more than this are unsynchronized
SYNC_TOLERANCE_NS = 500_000_000


def is_monotonically_increasing(ts: np.ndarray) -> bool:
    """Non-zero timestamps must be strictly increasing
    (ref: slam_test.cpp:73-88 expectations)."""
    nz = np.asarray(ts)[np.asarray(ts) != 0]
    if nz.size <= 1:
        return True
    return bool(np.all(np.diff(nz.astype(np.int64)) > 0))


class ActiveTimeCorrection:
    def __init__(self, infos: Sequence[SensorInfo]):
        self._infos = list(infos)
        self._frame_durations = [
            1e9 / max(i.format.fps, 1) for i in infos]
        self._use_packet_offset = False
        self._applied_offsets: List[int] = [0] * len(infos)

    @staticmethod
    def _frame_ts_range(scans: Sequence[Optional[LidarScan]]
                        ) -> List[Tuple[int, int]]:
        out = []
        for s in scans:
            if s is None:
                out.append((-1, -1))
            else:
                out.append((s.first_valid_column_timestamp(),
                            s.last_valid_column_timestamp()))
        return out

    def _check_sync(self, ranges: List[Tuple[int, int]]) -> bool:
        starts = [r[0] for r in ranges if r[0] > 0]
        if len(starts) <= 1:
            return True
        return (max(starts) - min(starts)) <= SYNC_TOLERANCE_NS

    def update(self, scans: Sequence[Optional[LidarScan]]) -> List[int]:
        """Validate clocks and apply per-sensor offsets in place; returns
        the offsets (ns) applied to each sensor's column timestamps."""
        ranges = self._frame_ts_range(scans)

        for i, s in enumerate(scans):
            if s is not None and not is_monotonically_increasing(s.timestamp):
                logger().warning(
                    "sensor %d: non-monotonic column timestamps in frame %d",
                    i, s.frame_id)

        if not self._check_sync(ranges) and not self._use_packet_offset:
            self._use_packet_offset = True
            logger().warning(
                "Sensors appear unsynchronized. Using estimated clock "
                "offsets, results may be affected")

        offsets = [0] * len(self._infos)
        if self._use_packet_offset:
            # align each sensor's column clock to its host receive clock
            # (ref: active_time_correction.cpp fallback offsets)
            for i, s in enumerate(scans):
                if s is None:
                    continue
                col_ts = s.first_valid_column_timestamp()
                pkt_ts = s.first_valid_packet_timestamp()
                if col_ts and pkt_ts:
                    offsets[i] = int(pkt_ts) - int(col_ts)
            for i, s in enumerate(scans):
                if s is not None and offsets[i]:
                    nz = s.timestamp != 0
                    s.timestamp[nz] = (
                        s.timestamp[nz].astype(np.int64)
                        + offsets[i]).astype(np.uint64)
        self._applied_offsets = offsets
        return offsets

    def reset(self, scans: Sequence[Optional[LidarScan]]) -> None:
        """Remove applied offsets post-registration
        (ref: active_time_correction.h reset)."""
        for i, s in enumerate(scans):
            off = self._applied_offsets[i] if i < len(
                self._applied_offsets) else 0
            if s is not None and off:
                nz = s.timestamp != 0
                s.timestamp[nz] = (
                    s.timestamp[nz].astype(np.int64) - off).astype(np.uint64)
        self._applied_offsets = [0] * len(self._infos)
