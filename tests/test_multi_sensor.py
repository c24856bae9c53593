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


def _deconflicted_infos(metas, imu_ports):
    """Load sensor infos, reassigning IMU ports: legacy IMU packets carry
    no id, so same-imu-port pairs are rejected (reference semantics) —
    the reference's own multi-sensor tests deconflict the same way
    (ref: python/tests/test_multiple_scan_source_pcap.py patch_json_file)."""
    import json

    from ouster_sdk_tpu.core.metadata import sensor_info_from_metadata

    infos = []
    for meta, port in zip(metas, imu_ports):
        d = json.load(open(meta))
        if port is not None:
            d["config_params"]["udp_port_imu"] = port
        infos.append(sensor_info_from_metadata(d))
    return infos



def test_same_ports_two_sensors():
    """Two sensors sharing ports: disambiguated by packet size/serial."""
    path = os.path.join(PCAP_DIR, "same_ports.pcap")
    metas = [os.path.join(PCAP_DIR, "same_ports.1.json"),
             os.path.join(PCAP_DIR, "same_ports.2.json")]
    if not all(map(os.path.exists, [path] + metas)):
        pytest.skip("fixture missing")
    src = PcapPacketSource(
        path, sensor_infos=_deconflicted_infos(metas, [7503, None]))
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
    src = PcapScanSource(
        path, sensor_infos=_deconflicted_infos(metas, [7503, None]))
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


def test_frame_reader_per_sensor_port_filter(tmp_path):
    """A two-sensor capture (same profile, different dst ports) stages per
    sensor: each FrameReader only sees its own stream (planar + packet
    layouts)."""
    from ouster_sdk_tpu.core.types import (
        LidarMode,
        SensorInfo,
        UDPProfileLidar,
    )
    from ouster_sdk_tpu.io.frames import FrameReader
    from ouster_sdk_tpu.io.pcap import PcapWriter
    from ouster_sdk_tpu.ops.packet_format import PacketWriter
    from ouster_sdk_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("no native toolchain")

    def make_info(port, sn):
        info = SensorInfo.from_default(LidarMode.from_string("512x10"))
        info.format.udp_profile_lidar = \
            UDPProfileLidar("RNG19_RFL8_SIG16_NIR16")
        info.config.udp_port_lidar = port
        info.sn = sn
        return info

    def _frame_packets(info, fid):
        pw = PacketWriter(info.format)
        cpp = pw.columns_per_packet
        for p in range(info.format.columns_per_frame // cpp):
            buf = pw.new_packet()
            pw.set_packet_header(buf, init_id=info.init_id,
                                 prod_sn=info.sn)
            pw.set_frame_id(buf, fid)
            m0 = p * cpp
            pw.set_col_headers(
                buf,
                np.arange(cpp, dtype=np.uint64) + fid * 10**8 + m0,
                np.arange(cpp, dtype=np.uint16) + m0,
                np.ones(cpp, dtype=np.uint32))
            yield buf.tobytes()

    info_a, info_b = make_info(7502, "101"), make_info(7602, "202")
    path = str(tmp_path / "two.pcap")
    with PcapWriter(path) as w:
        ts = 10**9
        for fid in (1, 2):
            for info, port in ((info_a, 7502), (info_b, 7602)):
                for pkt in _frame_packets(info, fid if info is info_a
                                          else fid + 100):
                    w.write(pkt, "10.0.0.1", "10.0.0.2", 7000, port, ts)
                    ts += 10**5

    fr_a = FrameReader(path, info=info_a)
    fr_b = FrameReader(path, info=info_b)
    fids_a = [f for f, _, _ in fr_a]
    fids_b = [f for f, _, _ in fr_b]
    assert fids_a == [1, 2]
    assert fids_b == [101, 102]
    pf_a, pl_a, hd_a, _ = next(fr_a.iter_planar_chunks(4))
    assert list(pf_a) == [1, 2]


@pytest.mark.parametrize("name", ["same_ports", "same_ports_legacy",
                                  "same_ports_nonlegacy"])
def test_duplicate_imu_port_rejected(name):
    """Same IMU port across sensors is ambiguous (legacy IMU packets
    carry no id) -> PcapDuplicatePortException
    (ref: test_multiple_scan_source_pcap.py:40-50)."""
    from ouster_sdk_tpu.io.pcap import PcapDuplicatePortException

    path = os.path.join(PCAP_DIR, f"{name}.pcap")
    metas = [os.path.join(PCAP_DIR, f"{name}.1.json"),
             os.path.join(PCAP_DIR, f"{name}.2.json")]
    if not all(map(os.path.exists, [path] + metas)):
        pytest.skip("fixture missing")
    with pytest.raises(PcapDuplicatePortException):
        PcapScanSource(path, meta=metas)


def test_duplicate_legacy_lidar_port_rejected():
    """Even with IMU deconflicted, two LEGACY-lidar sensors on one port
    cannot be told apart (ref: test_multiple_scan_source_pcap.py:117)."""
    from ouster_sdk_tpu.io.pcap import PcapDuplicatePortException

    path = os.path.join(PCAP_DIR, "same_ports_legacy.pcap")
    metas = [os.path.join(PCAP_DIR, "same_ports_legacy.1.json"),
             os.path.join(PCAP_DIR, "same_ports_legacy.2.json")]
    if not all(map(os.path.exists, [path] + metas)):
        pytest.skip("fixture missing")
    with pytest.raises(PcapDuplicatePortException):
        PcapScanSource(
            path, sensor_infos=_deconflicted_infos(metas, [7503, None]))


def test_bad_id_sensor_yields_none_other_decodes(tmp_path):
    """Mismatched serials: the bad-id sensor's scans are None while the
    matching sensor still decodes
    (ref: test_multiple_scan_source_pcap.py:83-114)."""
    import json

    from ouster_sdk_tpu.core.metadata import sensor_info_from_metadata
    from ouster_sdk_tpu.io.sources import collate

    path = os.path.join(PCAP_DIR, "same_ports.pcap")
    metas = [os.path.join(PCAP_DIR, "same_ports.1.json"),
             os.path.join(PCAP_DIR, "same_ports.2.json")]
    if not all(map(os.path.exists, [path] + metas)):
        pytest.skip("fixture missing")
    infos = []
    for m, imu, sn in zip(metas, (7503, None), (1234, 5678)):
        d = json.load(open(m))
        if imu:
            d["config_params"]["udp_port_imu"] = imu
        d["sensor_info"]["prod_sn"] = sn
        infos.append(sensor_info_from_metadata(d))
    src = PcapScanSource(path, sensor_infos=infos)
    scans = list(iter(collate(src)))[0]
    assert scans[0] is None
    assert scans[1] is not None
    assert scans[1].frame_id == 883 and scans[1].h == 64
