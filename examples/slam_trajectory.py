"""Run SLAM over a source and export the trajectory (KITTI format).

Usage: python examples/slam_trajectory.py <osf|pcap> [poses.txt]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ouster_sdk_tpu import open_source
from ouster_sdk_tpu.slam.engine import SlamConfig, SlamEngine


def main():
    src = open_source(sys.argv[1])
    out = sys.argv[2] if len(sys.argv) > 2 else "poses_kitti.txt"
    engine = SlamEngine(src.sensor_info, SlamConfig(voxel_size=1.0))
    poses = []
    for scan_set in src:
        engine.update(scan_set)
        poses.append(engine.last_pose.copy())
    with open(out, "w") as f:
        for p in poses:
            f.write(" ".join(f"{v:.18e}" for v in p[:3].reshape(-1)) + "\n")
    print(f"wrote {len(poses)} poses to {out}")


if __name__ == "__main__":
    main()
