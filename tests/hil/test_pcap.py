"""Record a pcap from a live sensor without dropping packets and read
it back (ref: tests/hil/test_pcap.py test_pcap_record). Requires
--sensor <hostname>; the record/replay machinery itself is covered
in-image by tests/test_round2_extras.py (RecordingPacketSource) and
tests/test_pcap_reassembly.py.
"""

from itertools import islice
from os import path

import numpy as np


def test_pcap_record(sensor_hostname, tmp_path):
    from ouster_sdk_tpu import PacketFormat
    from ouster_sdk_tpu.core.packets import LidarPacket
    from ouster_sdk_tpu.io.pcap import record
    from ouster_sdk_tpu.io.pcap_source import PcapPacketSource
    from ouster_sdk_tpu.sensor.scan_source import SensorPacketSource

    n_packets = 640
    pcap_path = path.join(str(tmp_path), "test.pcap")

    with SensorPacketSource([sensor_hostname], timeout=120,
                            buffer_time_sec=2.0) as src:
        metadata = src.sensor_info
        w = metadata[0].format.columns_per_frame
        flushed = 0
        while flushed < 640:  # flush startup
            idx, pkt = src.get_packet(timeout_sec=5.0)
            assert pkt is not None
            flushed += 1
        n = record((p for idx, p in islice(iter(src), n_packets)),
                   pcap_path,
                   lidar_port=metadata[0].config.udp_port_lidar or 7502,
                   imu_port=metadata[0].config.udp_port_imu or 7503)
    assert n == n_packets

    with PcapPacketSource(pcap_path, sensor_infos=metadata) as psrc:
        capture = [p for idx, p in psrc]
    assert len(capture) == n_packets

    pf = PacketFormat.from_info(metadata[0])
    ids = np.concatenate([
        pf.col_measurement_id(p.buf) for p in capture
        if isinstance(p, LidarPacket)]).astype(np.int64)
    assert np.count_nonzero(np.diff(ids) % w != 1) == 0, \
        "measurement id gaps in the recording"
