"""Per-field view modes for the offscreen viz.

Rebuild of the reference view-mode machinery (ref: python/src/ouster/sdk/
viz/view_mode.py — SimpleMode with AutoExposure/BeamUniformityCorrector,
ReflMode with calibrated-reflectivity scaling, RingMode) for the headless
rasterizer: each mode turns a scan field into a [0, 1] key for cloud
coloring and image panels, and reports availability per scan/return.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..core.constants import ChanField
from ..ops.image_processing import AutoExposure, BeamUniformityCorrector


def _second_chan_field(field: str) -> Optional[str]:
    pairs = {ChanField.RANGE: ChanField.RANGE2,
             ChanField.SIGNAL: ChanField.SIGNAL2,
             ChanField.REFLECTIVITY: ChanField.REFLECTIVITY2,
             ChanField.FLAGS: ChanField.FLAGS2}
    return pairs.get(field)


class FieldViewMode:
    """Base protocol: a mode exposes name/names, enabled(scan, return_num)
    and prepare(scan, return_num) -> [0, 1] key
    (ref: view_mode.py:12-44 FieldViewMode)."""

    name = ""
    names: List[str] = []

    def enabled(self, scan, return_num: int = 0) -> bool:
        raise NotImplementedError

    def prepare(self, scan, return_num: int = 0):
        raise NotImplementedError


class ImageMode(FieldViewMode):
    """Mode usable for 2D image panels (ref: view_mode.py:44)."""


class CloudMode(FieldViewMode):
    """Mode usable for 3D cloud coloring (ref: view_mode.py:56)."""


class ImageCloudMode(ImageMode, CloudMode):
    """Mode usable for both (ref: view_mode.py:68)."""


class SimpleMode(ImageCloudMode):
    """AutoExposure(+ optional BeamUniformityCorrector) over one field
    (ref: view_mode.py SimpleMode)."""

    def __init__(self, field: str, *, prefix: str = "", suffix: str = "",
                 use_ae: bool = True, use_buc: bool = False):
        self._fields = [field]
        second = _second_chan_field(field)
        if second:
            self._fields.append(second)
        self._ae = [AutoExposure() if use_ae else None for _ in range(2)]
        self._buc = [BeamUniformityCorrector() if use_buc else None
                     for _ in range(2)]
        parts = [p for p in (prefix, field, suffix) if p]
        self.name = " ".join(parts)
        self.names = [self.name, " ".join(
            [p for p in (prefix, second or field, suffix) if p])]

    def enabled(self, scan, return_num: int = 0) -> bool:
        return return_num < len(self._fields) and \
            scan.has_field(self._fields[return_num])

    def prepare(self, scan, return_num: int = 0) -> Optional[np.ndarray]:
        if not self.enabled(scan, return_num):
            return None
        key = scan.field(self._fields[return_num]).astype(np.float64)
        if self._buc[return_num] is not None:
            self._buc[return_num](key)
        if self._ae[return_num] is not None:
            self._ae[return_num](key)
        return np.clip(key, 0.0, 1.0)


class ReflMode(ImageCloudMode):
    """Calibrated-reflectivity mode (ref: view_mode.py ReflMode): values
    0-255 map linearly (diffuse 0-100 -> [0, 0.5), retro 101-255 ->
    [0.5, 1]); uncalibrated sensors fall back to AutoExposure."""

    name = "REFLECTIVITY"

    def __init__(self, info=None):
        self._fields = [ChanField.REFLECTIVITY, ChanField.REFLECTIVITY2]
        self.names = list(self._fields)
        cal = getattr(info, "cal", None) if info is not None else None
        self._calibrated = bool(
            getattr(cal, "reflectivity_status", "") == "OK") if cal else \
            _fw_ge_2_1(info)
        self._ae = [AutoExposure() for _ in range(2)]

    def enabled(self, scan, return_num: int = 0) -> bool:
        return return_num < len(self._fields) and \
            scan.has_field(self._fields[return_num])

    def prepare(self, scan, return_num: int = 0) -> Optional[np.ndarray]:
        if not self.enabled(scan, return_num):
            return None
        refl = scan.field(self._fields[return_num]).astype(np.float64)
        if self._calibrated:
            key = np.where(refl < 101, refl * (0.5 / 100.0),
                           0.5 + (refl - 101) * (0.5 / 154.0))
            return np.clip(key, 0.0, 1.0)
        key = refl.copy()
        self._ae[return_num](key)
        return np.clip(key, 0.0, 1.0)


class RingMode(CloudMode):
    """Color by beam row ring (ref: view_mode.py RingMode)."""

    name = "RING"
    names = ["RING", "RING"]

    def __init__(self, info):
        self._h = info.format.pixels_per_column

    def enabled(self, scan, return_num: int = 0) -> bool:
        return True

    def prepare(self, scan, return_num: int = 0) -> np.ndarray:
        rows = np.arange(scan.h, dtype=np.float64)[:, None]
        return np.broadcast_to((rows % 16) / 15.0,
                               (scan.h, scan.w)).copy()


def default_cloud_modes(info) -> List:
    """Mode cycle order mirrors the reference (REFL, RANGE, SIGNAL,
    NEAR_IR w/ BUC, FLAGS, RING)."""
    return [ReflMode(info),
            SimpleMode(ChanField.RANGE),
            SimpleMode(ChanField.SIGNAL),
            SimpleMode(ChanField.NEAR_IR, use_buc=True),
            RingMode(info)]


def default_image_modes(info) -> List:
    return [ReflMode(info),
            SimpleMode(ChanField.RANGE),
            SimpleMode(ChanField.SIGNAL),
            SimpleMode(ChanField.NEAR_IR, use_buc=True)]


def _fw_ge_2_1(info) -> bool:
    fw = getattr(info, "fw_rev", "") or ""
    import re

    m = re.search(r"v?(\d+)\.(\d+)", fw)
    if not m:
        return False
    return (int(m.group(1)), int(m.group(2))) >= (2, 1)


# -- reference extra modes (ref: view_mode.py:215+, 353+, 457+;
#    model.py:57 VizExtraMode) -------------------------------------------

class RGBMode(ImageCloudMode):
    """Direct RGB channel display, normalized by dtype range
    (ref: view_mode.py:215 RGBMode)."""

    def __init__(self, field: str, *, info=None):
        self._info = info
        self._field = field
        self.name = field
        self.names = [field]

    def enabled(self, scan, return_num: int = 0) -> bool:
        return return_num == 0 and scan.has_field(self._field)

    def prepare(self, scan, return_num: int = 0):
        if not self.enabled(scan, return_num):
            return None
        rgb = scan.field(self._field).astype(np.float64)
        if rgb.max() > 1.0:
            rgb = rgb / (255.0 if rgb.max() <= 255 else rgb.max())
        return np.clip(rgb, 0.0, 1.0)


class NormalsMode(ImageCloudMode):
    """Surface-normal display: [-1, 1] components remapped to [0, 1]
    (ref: view_mode.py:353 NormalsMode)."""

    def __init__(self, field: str, *, info=None):
        self._info = info
        self._fields = [field]
        second = _second_chan_field(field)
        if second:
            self._fields.append(second)
        self.name = field
        self.names = list(self._fields)

    def enabled(self, scan, return_num: int = 0) -> bool:
        return return_num < len(self._fields) and \
            scan.has_field(self._fields[return_num])

    def prepare(self, scan, return_num: int = 0):
        if not self.enabled(scan, return_num):
            return None
        n = scan.field(self._fields[return_num]).astype(np.float64)
        return np.clip((n + 1.0) / 2.0, 0.0, 1.0)


def is_norm_reflectivity_mode(mode) -> bool:
    """True for calibrated-reflectivity modes
    (ref: view_mode.py:457-462)."""
    return isinstance(mode, ReflMode) and mode._calibrated


from dataclasses import dataclass as _dataclass  # noqa: E402
from typing import Callable  # noqa: E402


@_dataclass
class CloudPaletteItem:
    """Named palette (ref: view_mode.py:470)."""

    name: str
    palette: np.ndarray


@_dataclass
class VizExtraMode:
    """Factory for externally-plugged viz modes
    (ref: model.py:57-71 VizExtraMode)."""

    func: Callable[[], FieldViewMode]

    def create(self, info=None) -> FieldViewMode:
        extra_mode = self.func()
        if info is not None and hasattr(extra_mode, "_info") and \
                getattr(extra_mode, "_info", None) is None:
            extra_mode._info = info
        return extra_mode

