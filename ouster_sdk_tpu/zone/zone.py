"""Zone / ZoneSet configuration model + STL mesh loading.

Rebuild of the reference zone config (ref: ouster_client/include/ouster/
zone.h:24, zone_monitor.h:42, stl.h, mesh.h): a Zone is a triangle-mesh
volume with a mode and filter parameters; a ZoneSet is pushed to the sensor
as a zip of config json + STL meshes (ref: sensor_http.h:401-461).
"""

from __future__ import annotations

import hashlib
import io
import json
import struct
import zipfile
from dataclasses import dataclass, field as dc_field
from enum import Enum
from typing import Dict, List, Optional, Tuple

import numpy as np


class ZoneMode(Enum):
    """(ref: zone.h:36-42: NONE=0, OCCUPANCY=1, VACANCY=2)"""

    NONE = 0
    OCCUPANCY = 1
    VACANCY = 2


def load_stl(data_or_path) -> np.ndarray:
    """Load a binary (or ASCII) STL into (n_tris, 3, 3) float64 vertices
    (ref: ouster_client stl.h/stl.cpp)."""
    if isinstance(data_or_path, (bytes, bytearray)):
        data = bytes(data_or_path)
    else:
        with open(data_or_path, "rb") as f:
            data = f.read()

    if data[:5].lower() == b"solid" and b"facet" in data[:500]:
        return _load_stl_ascii(data)

    if len(data) < 84:
        raise ValueError("not an STL file")
    n = struct.unpack_from("<I", data, 80)[0]
    if len(data) < 84 + n * 50:
        raise ValueError("truncated binary STL")
    rec = np.frombuffer(data, dtype=np.dtype([
        ("normal", "<f4", (3,)), ("v", "<f4", (3, 3)),
        ("attr", "<u2")]), count=n, offset=84)
    return rec["v"].astype(np.float64)


def _load_stl_ascii(data: bytes) -> np.ndarray:
    verts: List[List[float]] = []
    for line in data.decode(errors="replace").splitlines():
        tok = line.strip().split()
        if tok[:1] == ["vertex"]:
            verts.append([float(x) for x in tok[1:4]])
    arr = np.asarray(verts, dtype=np.float64)
    if arr.size % 9:
        raise ValueError("malformed ASCII STL")
    return arr.reshape(-1, 3, 3)


def save_stl(path_or_buf, triangles: np.ndarray) -> Optional[bytes]:
    """Write binary STL."""
    tris = np.asarray(triangles, dtype=np.float32).reshape(-1, 3, 3)
    rec = np.zeros(len(tris), dtype=np.dtype([
        ("normal", "<f4", (3,)), ("v", "<f4", (3, 3)), ("attr", "<u2")]))
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    n = np.cross(e1, e2)
    mag = np.linalg.norm(n, axis=1, keepdims=True)
    rec["normal"] = np.where(mag > 0, n / np.maximum(mag, 1e-30), 0)
    rec["v"] = tris
    blob = b"\x00" * 80 + struct.pack("<I", len(tris)) + rec.tobytes()
    if isinstance(path_or_buf, str):
        with open(path_or_buf, "wb") as f:
            f.write(blob)
        return None
    return blob


@dataclass
class Zone:
    """(ref: zone.h:24)"""

    id: int
    name: str = ""
    mode: ZoneMode = ZoneMode.OCCUPANCY
    triangles: np.ndarray = dc_field(
        default_factory=lambda: np.zeros((0, 3, 3)))
    min_points: int = 1
    frame_count: int = 1   # consecutive triggered frames before alerting
    min_range_m: float = 0.0
    max_range_m: float = 200.0

    def mesh_hash(self) -> bytes:
        return hashlib.sha256(
            np.ascontiguousarray(self.triangles,
                                 dtype=np.float32).tobytes()).digest()

    @classmethod
    def box(cls, zone_id: int, center, size, name: str = "") -> "Zone":
        """Axis-aligned box helper for tests/config authoring."""
        c = np.asarray(center, dtype=np.float64)
        s = np.asarray(size, dtype=np.float64) / 2
        corners = np.array([[sx, sy, sz] for sx in (-1, 1)
                            for sy in (-1, 1) for sz in (-1, 1)])
        v = c + corners * s
        faces = [
            (0, 1, 3), (0, 3, 2), (4, 6, 7), (4, 7, 5),
            (0, 4, 5), (0, 5, 1), (2, 3, 7), (2, 7, 6),
            (0, 2, 6), (0, 6, 4), (1, 5, 7), (1, 7, 3),
        ]
        tris = np.stack([v[list(f)] for f in faces])
        return cls(zone_id, name=name or f"box{zone_id}", triangles=tris)


@dataclass
class ZoneSet:
    """(ref: zone_monitor.h:42)"""

    zones: List[Zone] = dc_field(default_factory=list)
    # zones live at power-on (ref: zone_common.py power_on_live_ids);
    # None = all zones live
    power_on_live_ids: Optional[List[int]] = None

    @property
    def live_ids(self) -> List[int]:
        if self.power_on_live_ids is not None:
            return list(self.power_on_live_ids)
        return [z.id for z in self.zones]

    def hash(self) -> bytes:
        h = hashlib.sha256()
        for z in sorted(self.zones, key=lambda z: z.id):
            h.update(struct.pack("<IB", z.id, z.mode.value))
            h.update(z.mesh_hash())
        return h.digest()

    def to_zip(self) -> bytes:
        """Package as the sensor-facing zip (json + STLs)
        (ref: sensor_http.h:401-461 zone config zip)."""
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            cfg = {"zones": [
                {"id": z.id, "name": z.name, "mode": z.mode.name.lower(),
                 "mesh": f"zone_{z.id}.stl", "min_points": z.min_points,
                 "frame_count": z.frame_count,
                 "min_range_m": z.min_range_m, "max_range_m": z.max_range_m}
                for z in self.zones]}
            if self.power_on_live_ids is not None:
                cfg["power_on_live_ids"] = list(self.power_on_live_ids)
            zf.writestr("zones.json", json.dumps(cfg, indent=2))
            for z in self.zones:
                zf.writestr(f"zone_{z.id}.stl", save_stl(None, z.triangles))
        return buf.getvalue()

    @classmethod
    def from_zip(cls, blob: bytes) -> "ZoneSet":
        zones = []
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            cfg = json.loads(zf.read("zones.json"))
            for zc in cfg.get("zones", []):
                tris = load_stl(zf.read(zc["mesh"]))
                zones.append(Zone(
                    id=zc["id"], name=zc.get("name", ""),
                    mode=ZoneMode[zc.get("mode", "occupancy").upper()],
                    triangles=tris,
                    min_points=zc.get("min_points", 1),
                    frame_count=zc.get("frame_count", 1),
                    min_range_m=zc.get("min_range_m", 0.0),
                    max_range_m=zc.get("max_range_m", 200.0)))
        return cls(zones, power_on_live_ids=cfg.get("power_on_live_ids"))


class ZoneSetOutputFilter(Enum):
    """What a serialized zone set carries
    (ref: client.pyi:1854 ZoneSetOutputFilter STL/ZRB/STL_AND_ZRB)."""

    STL = 1
    ZRB = 2
    STL_AND_ZRB = 3


def _zoneset_to_json(self, zone_set_output=ZoneSetOutputFilter.STL) -> str:
    """zones.json content (ref: client.pyi ZoneSet.to_json)."""
    cfg = {"zones": [
        {"id": z.id, "name": z.name, "mode": z.mode.name.lower(),
         "mesh": f"zone_{z.id}.stl", "min_points": z.min_points,
         "frame_count": z.frame_count,
         "min_range_m": z.min_range_m, "max_range_m": z.max_range_m}
        for z in self.zones]}
    if self.power_on_live_ids is not None:
        cfg["power_on_live_ids"] = list(self.power_on_live_ids)
    return json.dumps(cfg, indent=2)


def _zoneset_to_zip_blob(self,
                         zone_set_output=ZoneSetOutputFilter.STL,
                         zrbs=None) -> bytes:
    """Zip blob with the requested artifacts: STL meshes and/or
    pre-rendered Zrb range-image blobs (ref: client.pyi
    ZoneSet.to_zip_blob; zrb entries keyed zone_<id>.zrb)."""
    want_stl = zone_set_output in (ZoneSetOutputFilter.STL,
                                   ZoneSetOutputFilter.STL_AND_ZRB)
    want_zrb = zone_set_output in (ZoneSetOutputFilter.ZRB,
                                   ZoneSetOutputFilter.STL_AND_ZRB)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("zones.json", self.to_json(zone_set_output))
        if want_stl:
            for z in self.zones:
                zf.writestr(f"zone_{z.id}.stl",
                            save_stl(None, z.triangles))
        if want_zrb:
            for zid, zrb in (zrbs or {}).items():
                blob = zrb.to_blob() if hasattr(zrb, "to_blob") else \
                    bytes(zrb)
                zf.writestr(f"zone_{zid}.zrb", blob)
    return buf.getvalue()


def _zoneset_save(self, path: str,
                  zone_set_output=ZoneSetOutputFilter.STL) -> None:
    """Write the zip to disk (ref: client.pyi ZoneSet.save)."""
    with open(path, "wb") as f:
        f.write(self.to_zip_blob(zone_set_output))


ZoneSet.to_json = _zoneset_to_json
ZoneSet.to_zip_blob = _zoneset_to_zip_blob
ZoneSet.save = _zoneset_save


class CoordinateFrame(Enum):
    """STL vertex frame (ref: zone_monitor.cpp binding
    Stl::CoordinateFrame BODY/SENSOR)."""

    BODY = 0
    SENSOR = 1


class Stl:
    """STL mesh handle with identity hash, constructible from a path or
    raw bytes (ref: zone_monitor.cpp:75-86 Stl binding; stl.h)."""

    def __init__(self, source,
                 coordinate_frame: CoordinateFrame = CoordinateFrame.BODY):
        if isinstance(source, str):
            self.filename = source
            with open(source, "rb") as f:
                self._data = f.read()
        else:
            self.filename = ""
            self._data = bytes(source)
        self.coordinate_frame = coordinate_frame
        self.triangles = load_stl(self._data)

    def to_mesh(self) -> np.ndarray:
        """Triangle vertices, (n_tris, 3, 3) float64."""
        return self.triangles

    @property
    def hash(self) -> str:
        """sha256 of the raw STL bytes (ref: Stl::hash)."""
        import hashlib

        return hashlib.sha256(self._data).hexdigest()

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Stl):
            return NotImplemented
        return self._data == other._data


class Triangle:
    """Mesh triangle view: coords / edges / normal
    (ref: client.pyi Triangle; zone mesh accessors)."""

    def __init__(self, vertices: np.ndarray):
        self._v = np.asarray(vertices, dtype=np.float64).reshape(3, 3)

    @property
    def coords(self) -> List[np.ndarray]:
        return [self._v[0], self._v[1], self._v[2]]

    @property
    def edges(self) -> List[np.ndarray]:
        return [self._v[1] - self._v[0], self._v[2] - self._v[1],
                self._v[0] - self._v[2]]

    @property
    def normal(self) -> np.ndarray:
        n = np.cross(self._v[1] - self._v[0], self._v[2] - self._v[0])
        mag = np.linalg.norm(n)
        return n / mag if mag > 0 else n


#: Plain 3-vector used by the mesh accessors (ref: client.pyi Coord).
Coord = np.ndarray


class BeamConfig:
    """(ref: client.pyi BeamConfig — unbound in the reference binding
    as well; placeholder for API parity)."""
