"""Multi-sensor fixtures: dual-stream pcaps, collation, extrinsics
(ref: python/tests/test_multiple_scan_source_pcap.py,
tests/pcap_with_extrinsics/)."""

import glob
import os

import numpy as np
import pytest

from ouster_sdk_tpu.io.pcap_scan_source import PcapScanSource
from ouster_sdk_tpu.io.pcap_source import PcapPacketSource

PCAP_DIR = "/root/reference/tests/pcaps"


def test_same_ports_two_sensors():
    """Two sensors sharing ports: disambiguated by packet size/serial."""
    path = os.path.join(PCAP_DIR, "same_ports.pcap")
    metas = [os.path.join(PCAP_DIR, "same_ports.1.json"),
             os.path.join(PCAP_DIR, "same_ports.2.json")]
    if not all(map(os.path.exists, [path] + metas)):
        pytest.skip("fixture missing")
    src = PcapPacketSource(path, metadata_paths=metas)
    assert len(src.sensor_info) == 2
    counts = {0: 0, 1: 0}
    for idx, p in src:
        counts[idx] += 1
    assert counts[0] > 0 and counts[1] > 0


def test_collated_scan_source_two_sensors():
    path = os.path.join(PCAP_DIR, "same_ports_nonlegacy.pcap")
    metas = [os.path.join(PCAP_DIR, "same_ports_nonlegacy.1.json"),
             os.path.join(PCAP_DIR, "same_ports_nonlegacy.2.json")]
    if not all(map(os.path.exists, [path] + metas)):
        pytest.skip("fixture missing")
    src = PcapScanSource(path, meta=metas)
    sets = list(src)
    assert sets, "no collated sets"
    # at least one set should carry scans from both sensors over the run
    seen = set()
    for s in sets:
        for i, scan in enumerate(s):
            if scan is not None:
                seen.add(i)
    assert seen == {0, 1}


def test_extrinsics_pcap_dir():
    d = "/root/reference/tests/pcap_with_extrinsics"
    if not os.path.isdir(d):
        pytest.skip("fixture missing")
    pcaps = glob.glob(os.path.join(d, "*.pcap"))
    ext_file = glob.glob(os.path.join(d, "*extrinsic*"))
    if not pcaps:
        pytest.skip("no pcap in fixture dir")
    src = PcapScanSource(pcaps[0],
                         extrinsics_file=ext_file[0] if ext_file else None)
    infos = src.sensor_info
    assert infos
    if ext_file:
        assert any(not np.allclose(i.extrinsic, np.eye(4)) for i in infos)


def test_accumulators_with_slam_poses():
    from ouster_sdk_tpu.io.osf import OsfScanSource
    from ouster_sdk_tpu.viz.accumulators import (
        MapAccumulator,
        ScansAccumulator,
        TracksAccumulator,
    )

    path = "/root/reference/tests/osfs/OS-1-128_v2.3.0_1024x10_lb_n3.osf"
    if not os.path.exists(path):
        pytest.skip("fixture missing")
    src = OsfScanSource(path)
    scans_acc = ScansAccumulator(src.sensor_info, accum_min_dist_meters=0.0,
                                 accum_min_dist_num=1)
    tracks = TracksAccumulator()
    gmap = MapAccumulator(src.sensor_info, map_voxel_size=0.5)
    for ls_set in src:
        scans_acc.accept(list(ls_set))
        tracks.accept(list(ls_set))
        gmap.accept(list(ls_set))
    assert scans_acc.points().shape[0] > 1000
    assert tracks.points().shape[0] >= 1
    assert gmap.points().shape[0] > 100
