"""Derived scan transforms: clip, mask, reduce (beam decimation).

Rebuild of the reference derived sources (ref: python/src/ouster/sdk/core/
{clipped,masked,reduced}_scan_source.py with kernels in
sdk/core/scan_ops.py:33,192,242).
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, Optional, Sequence

import numpy as np

from ..core.constants import ChanField
from ..core.lidar_scan import LidarScan
from ..core.types import SensorInfo
from .sources import LidarScanSet, ScanSource


def clip_scan(scan: LidarScan, min_range_m: float, max_range_m: float,
              fields: Sequence[str] = (ChanField.RANGE, ChanField.RANGE2)
              ) -> LidarScan:
    """Zero returns outside [min, max] meters, in place
    (ref: scan_ops.py:33 clip)."""
    lo = int(min_range_m * 1000)
    hi = int(max_range_m * 1000) if np.isfinite(max_range_m) else None
    for name in fields:
        if not scan.has_field(name):
            continue
        rng = scan.field(name)
        bad = rng < lo
        if hi is not None:
            bad |= rng > hi
        rng[bad] = 0
    return scan


def mask_scan(scan: LidarScan, mask: np.ndarray,
              fields: Optional[Sequence[str]] = None) -> LidarScan:
    """Zero all pixel fields where mask (H, W) is falsy, in place
    (ref: scan_ops.py:192 mask)."""
    mask = np.asarray(mask).astype(bool)
    names = fields if fields is not None else list(scan.fields)
    for name in names:
        if not scan.has_field(name):
            continue
        f = scan.field(name)
        if f.ndim >= 2 and f.shape[:2] == (scan.h, scan.w):
            f[~mask] = 0
    return scan


def reduce_scan(scan: LidarScan, beams: int) -> LidarScan:
    """Decimate beams to `beams` rows (ref: scan_ops.py:242 reduce_by_factor;
    beams must divide the current count evenly)."""
    h = scan.h
    if beams <= 0 or h % beams != 0:
        raise ValueError(
            f"beam count {beams} must evenly divide {h}")
    factor = h // beams
    if factor == 1:
        return scan

    info = scan.sensor_info
    new_info = None
    if info is not None:
        import copy

        new_info = copy.deepcopy(info)
        new_info.format.pixels_per_column = beams
        new_info.format.pixel_shift_by_row = \
            list(info.format.pixel_shift_by_row[::factor])
        new_info.beam_azimuth_angles = info.beam_azimuth_angles[::factor]
        new_info.beam_altitude_angles = info.beam_altitude_angles[::factor]

    out = LidarScan(w=scan.w, h=beams,
                    field_types=[],
                    columns_per_packet=scan.columns_per_packet)
    out.sensor_info = new_info
    out.frame_id = scan.frame_id
    out.frame_status = scan.frame_status
    out.timestamp[:] = scan.timestamp
    out.measurement_id[:] = scan.measurement_id
    out.status[:] = scan.status
    out.packet_timestamp[:] = scan.packet_timestamp
    out.alert_flags[:] = scan.alert_flags
    out.pose[:] = scan.pose

    from ..core.field import FieldClass

    for ft in scan.field_types:
        data = scan.field(ft.name)
        if ft.field_class == FieldClass.PIXEL_FIELD and \
                data.ndim >= 2 and data.shape[0] == h:
            out.add_field(ft, data[::factor])
        else:
            out.add_field(ft, data)
    return out


class ClippedScanSource(ScanSource):
    """(ref: sdk/core/clipped_scan_source.py)"""

    def __init__(self, parent: ScanSource, fields: Sequence[str],
                 lower: float, upper: float):
        super().__init__(parent.sensor_info)
        self._parent = parent
        self._fields = list(fields)
        self._lower, self._upper = lower, upper

    def _iter_sets(self):
        for ls_set in self._parent:
            for s in ls_set.valid():
                clip_scan(s, self._lower, self._upper, self._fields)
            yield ls_set


class MaskedScanSource(ScanSource):
    """(ref: sdk/core/masked_scan_source.py)"""

    def __init__(self, parent: ScanSource, masks: List[Optional[np.ndarray]],
                 fields: Optional[Sequence[str]] = None):
        super().__init__(parent.sensor_info)
        self._parent = parent
        self._masks = masks
        self._fields = fields

    def _iter_sets(self):
        for ls_set in self._parent:
            for idx, s in enumerate(ls_set):
                if s is not None and idx < len(self._masks) and \
                        self._masks[idx] is not None:
                    mask_scan(s, self._masks[idx], self._fields)
            yield ls_set


class ReducedScanSource(ScanSource):
    """(ref: sdk/core/reduced_scan_source.py)"""

    def __init__(self, parent: ScanSource, beams: List[int]):
        import copy

        infos = []
        for info, b in zip(parent.sensor_info, beams):
            h = info.format.pixels_per_column
            if h % b != 0:
                raise ValueError(
                    f"beam count {b} must evenly divide {h}")
            ni = copy.deepcopy(info)
            factor = h // b
            ni.format.pixels_per_column = b
            ni.format.pixel_shift_by_row = \
                list(info.format.pixel_shift_by_row[::factor])
            ni.beam_azimuth_angles = info.beam_azimuth_angles[::factor]
            ni.beam_altitude_angles = info.beam_altitude_angles[::factor]
            infos.append(ni)
        super().__init__(infos)
        self._parent = parent
        self._beams = beams

    def _iter_sets(self):
        for ls_set in self._parent:
            yield LidarScanSet([
                reduce_scan(s, self._beams[i]) if s is not None else None
                for i, s in enumerate(ls_set)])
