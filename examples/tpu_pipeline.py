"""Run the fused TPU pipeline on frames from a pcap.

Shows the device fast path: host stages whole frames of packet words,
the jitted pipeline decodes + projects + dewarps on device.
Usage: python examples/tpu_pipeline.py <pcap>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from ouster_sdk_tpu import open_packet_source
from ouster_sdk_tpu.core.scans import Scans
from ouster_sdk_tpu.ops.fused import ScanPipeline
from ouster_sdk_tpu.ops.unpack import frame_words_from_packets


def main():
    pcap = sys.argv[1]
    packets = open_packet_source(pcap)
    info = packets.sensor_info[0]
    pipe = ScanPipeline(info)

    frame = []
    from ouster_sdk_tpu import PacketFormat

    pf = PacketFormat.from_info(info)
    current_fid = None
    for idx, p in packets:
        if p.type().value != "Lidar":
            continue
        fid = pf.frame_id(p.buf)
        if current_fid is None:
            current_fid = fid
        if fid != current_fid:
            words = frame_words_from_packets(frame, pipe.cfg.plan)
            out = pipe(jnp.asarray(words))
            xyz = out["XYZ"]
            print(f"frame {current_fid}: XYZ {xyz.shape} "
                  f"max |r| = {float(abs(xyz).max()):.2f} m")
            frame, current_fid = [], fid
        frame.append(p)


if __name__ == "__main__":
    main()
