"""OSF file-level operations: inspect, slice, update metadata.

Rebuild of the reference OSF operations (ref: ouster_osf/src/
operations.cpp:295 — get/set metadata, file slicing, index backup).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional

from ..core.metadata import sensor_info_from_metadata
from .osf import Reader, Writer, _METADATA_ENTRY_LIDAR_SENSOR


def osf_info(path: str) -> Dict[str, Any]:
    """File summary (ref: operations.cpp dump_metadata)."""
    r = Reader(path)
    streams = {}
    for sid in r.scan_streams:
        streams[sid] = sum(1 for m in r.messages() if m.id == sid)
    return {
        "version": r.version,
        "metadata_id": r.metadata_id,
        "start_ts": r.start_ts,
        "end_ts": r.end_ts,
        "chunk_count": len(r.chunk_offsets),
        "sensors": [
            {"sn": i.sn, "prod_line": i.prod_line,
             "profile": i.format.udp_profile_lidar.value,
             "mode": f"{i.format.pixels_per_column}x"
                     f"{i.format.columns_per_frame}"}
            for i in r.sensor_info],
        "scan_messages": streams,
    }


def osf_slice(src_path: str, dst_path: str, *,
              start_ts: int = 0, end_ts: int = 2**64 - 1,
              start_index: Optional[int] = None,
              end_index: Optional[int] = None) -> int:
    """Copy a time/index range of scans into a new OSF
    (ref: operations.cpp file slicing; CLI `osf slice`)."""
    r = Reader(src_path)
    with Writer(dst_path) as w:
        ids = [w.add_sensor(info) for info in r.sensor_info]
        n = 0
        scan_i = 0
        for msg in r.messages(start_ts, end_ts):
            if not msg.is_lidar_scan():
                continue
            if start_index is not None and scan_i < start_index:
                scan_i += 1
                continue
            if end_index is not None and scan_i >= end_index:
                break
            scan = msg.decode()
            if scan is not None:
                w.save(ids[msg.sensor_idx], scan, ts=msg.ts)
                n += 1
            scan_i += 1
    return n


def osf_get_sensor_metadata(path: str) -> List[str]:
    """Raw sensor metadata json strings stored in the file."""
    r = Reader(path)
    out = []
    from ..utils import flatbuf as fb

    for ent in sorted(r.entries.values(), key=lambda e: e.id):
        if ent.type == _METADATA_ENTRY_LIDAR_SENSOR:
            out.append(fb.root_auto(ent.buffer).string(0))
    return out


def osf_update_sensor_metadata(src_path: str, dst_path: str,
                               new_metadata: List[str]) -> None:
    """Rewrite the file with replacement sensor metadata
    (ref: operations.cpp metadata update ops)."""
    r = Reader(src_path)
    infos = [sensor_info_from_metadata(m) for m in new_metadata]
    if len(infos) != len(r.sensor_info):
        raise ValueError("sensor count mismatch")
    with Writer(dst_path) as w:
        ids = [w.add_sensor(info) for info in infos]
        for msg in r.messages():
            if msg.is_lidar_scan():
                scan = msg.decode()
                if scan is not None:
                    w.save(ids[msg.sensor_idx], scan, ts=msg.ts)
