"""Minimal NMEA RMC parsing for POSITION_LAT_LONG
(ref: ouster_client/src/parsing.cpp:954-974 + thirdparty/nmea)."""

from __future__ import annotations

import math
from typing import Tuple, Union


def _coord(value: str, hemi: str) -> float:
    """NMEA ddmm.mmmm -> decimal degrees."""
    if not value:
        raise ValueError("empty coordinate")
    v = float(value)
    degrees = int(v / 100)
    minutes = v - degrees * 100
    dec = degrees + minutes / 60.0
    if hemi in ("S", "W"):
        dec = -dec
    return dec


def parse_lat_long(sentence: Union[bytes, str]) -> Tuple[float, float]:
    """Parse an $G?RMC sentence to (lat, lon); NaNs when absent/invalid."""
    if isinstance(sentence, bytes):
        sentence = sentence.split(b"\x00", 1)[0].decode(
            "ascii", errors="replace")
    sentence = sentence.strip()
    nan = (math.nan, math.nan)
    if not sentence.startswith("$"):
        return nan
    body = sentence[1:].split("*", 1)[0]
    parts = body.split(",")
    if len(parts) < 7 or not parts[0].endswith("RMC"):
        return nan
    # RMC: [0] talker+RMC, [1] time, [2] status, [3] lat, [4] N/S,
    #      [5] lon, [6] E/W, ...
    if parts[2] != "A":
        return nan
    try:
        lat = _coord(parts[3], parts[4])
        lon = _coord(parts[5], parts[6])
    except (ValueError, IndexError):
        return nan
    return lat, lon
