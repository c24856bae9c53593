"""Extrinsics file resolution.

Rebuild of the reference's extrinsics utilities
(ref: python/src/ouster/sdk/util/extrinsics.py): supports a per-sensor
json file mapping serial numbers to 4x4 transforms, or a directory of
`<sn>.json` files.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

from ..core.types import SensorInfo


def _parse_single(obj) -> Optional[np.ndarray]:
    arr = np.asarray(obj, dtype=np.float64)
    if arr.size == 16:
        return arr.reshape(4, 4)
    return None


def resolve_extrinsics(path: str, infos: List[SensorInfo]
                       ) -> List[Optional[np.ndarray]]:
    """Resolve an extrinsics source for each sensor; None when absent."""
    out: List[Optional[np.ndarray]] = [None] * len(infos)

    if os.path.isdir(path):
        for i, info in enumerate(infos):
            p = os.path.join(path, f"{info.sn}.json")
            if os.path.exists(p):
                with open(p) as f:
                    out[i] = _parse_single(json.load(f))
        return out

    if not os.path.exists(path):
        return out

    with open(path) as f:
        data = json.load(f)

    # layout 1: {"transforms": [{"source_frame": sn, "p_x": ..,
    #            "q_w": ..}, ...]} (reference multi-sensor calibration dump)
    if isinstance(data, dict) and "transforms" in data:
        by_sn = {}
        for t in data["transforms"]:
            sn = str(t.get("source_frame", ""))
            q = np.array([t.get("q_w", 1), t.get("q_x", 0),
                          t.get("q_y", 0), t.get("q_z", 0)], dtype=np.float64)
            p = np.array([t.get("p_x", 0), t.get("p_y", 0),
                          t.get("p_z", 0)], dtype=np.float64)
            w, x, y, z = q / np.linalg.norm(q)
            R = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x),
                 1 - 2 * (x * x + y * y)],
            ])
            m = np.eye(4)
            m[:3, :3] = R
            m[:3, 3] = p
            by_sn[sn] = m
        for i, info in enumerate(infos):
            out[i] = by_sn.get(str(info.sn))
        return out

    # layout 2: {"<sn>": [16 floats], ...}
    if isinstance(data, dict):
        for i, info in enumerate(infos):
            if str(info.sn) in data:
                out[i] = _parse_single(data[str(info.sn)])
        return out

    # layout 3: a bare 16-element list applied to every sensor
    if isinstance(data, list):
        m = _parse_single(data)
        return [None if m is None else m.copy() for _ in infos]

    return out
