"""Scan/packet helper utilities from the reference's core namespace.

Small, host-side helpers that the reference exports at
``ouster.sdk.core`` (ref: python/src/ouster/sdk/core/core.py:51-103,
data.py:18,69,195). Kept separate from the containers so the hot path
stays free of convenience-layer imports.
"""

from __future__ import annotations

from enum import Enum
from typing import Callable, Union

import numpy as np

from .lidar_scan import LidarScan
from .packets import LidarPacket, Packet
from .types import SensorInfo

#: Buffer-like types accepted by packet APIs (ref: core/data.py:18).
BufferT = Union[bytes, bytearray, memoryview, np.ndarray]


class ColHeader(Enum):
    """Column headers available in lidar data (deprecated in the
    reference but still exported; ref: core/data.py:69-81)."""
    TIMESTAMP = 0
    ENCODER_COUNT = 1
    MEASUREMENT_ID = 2
    STATUS = 3
    FRAME_ID = 4

    def __int__(self) -> int:
        return self.value


class FrameBorder:
    """Callable that flags packets crossing a frame boundary
    (ref: core/core.py:51-72). ``pred`` gates whether a detected border
    is reported."""

    def __init__(self, meta: SensorInfo,
                 pred: Callable[[Packet], bool] = lambda _: True):
        from ..ops.packet_format import PacketFormat

        self._last_f_id = -1
        self._last_packet_ts = None
        self._last_packet_res = False
        self._pred = pred
        self._pf = PacketFormat(meta)

    def __call__(self, packet: Packet) -> bool:
        if isinstance(packet, LidarPacket):
            # don't examine the same packet twice (host ts match)
            if (self._last_packet_ts and packet.host_timestamp != 0
                    and self._last_packet_ts == packet.host_timestamp):
                return self._last_packet_res
            self._last_packet_ts = packet.host_timestamp
            f_id = self._pf.frame_id(packet.buf)
            changed = self._last_f_id != -1 and f_id != self._last_f_id
            self._last_packet_res = changed and self._pred(packet)
            self._last_f_id = f_id
            return self._last_packet_res
        return False


def first_valid_column_pose(scan: LidarScan) -> np.ndarray:
    """First valid column pose of a LidarScan (ref: core/core.py:75)."""
    return scan.pose[scan.get_first_valid_column()]


def last_valid_column_pose(scan: LidarScan) -> np.ndarray:
    """Last valid column pose of a LidarScan (ref: core/core.py:80)."""
    return scan.pose[scan.get_last_valid_column()]


def valid_packet_idxs(scan: LidarScan) -> np.ndarray:
    """Indices of packets that contributed to the scan: any valid column
    status OR a nonzero packet receive timestamp (ref: core/core.py:85-98)."""
    valid_cols = scan.status & 0x1
    valid_packet_ts = scan.packet_timestamp != 0
    sp = np.split(valid_cols, scan.packet_timestamp.shape[0])
    valid_packets = np.logical_or(np.any(sp, axis=1), valid_packet_ts)
    return np.nonzero(valid_packets)[0]


def poses_present(scan: LidarScan) -> bool:
    """True when any column pose differs from identity
    (ref: core/core.py:100-102)."""
    return not np.allclose(np.eye(4), scan.pose)


def packet_ts(packet: Packet) -> int:
    """Packet host receive timestamp in nanoseconds
    (ref: core/data.py:195)."""
    return packet.host_timestamp
