"""Point-cloud file (PLY/PCD/CSV/LAS) sources (readers in io/cloud_io.py)."""

from .sources import IoType, ScanSourceOptions, register_scan_source


def _build(source: str, opts: ScanSourceOptions):
    raise NotImplementedError(
        "point-cloud file scan sources are read via io.cloud_io.read_pointcloud")


for _t in (IoType.PLY, IoType.PCD, IoType.CSV, IoType.LAS):
    register_scan_source(_t)(_build)
