"""Run the fused TPU pipeline on frames from a pcap.

Shows both device fast paths:
  1. the planar path (fastest): one native pass stages frames word-planar,
     the Pallas kernel decodes + projects (+ optional fused per-column
     dewarp) with no transposes;
  2. the packet-words path: whole frames of packet words through the
     jitted XLA pipeline producing every field + XYZ.

Usage: python examples/tpu_pipeline.py <pcap>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from ouster_sdk_tpu.io.frames import FrameReader
from ouster_sdk_tpu.ops.fused import ScanPipeline


def main():
    pcap = sys.argv[1]
    fr = FrameReader(pcap)
    pipe = ScanPipeline(fr.info)

    # 1. planar fast path: chunked word-planar staging -> Pallas kernel
    for fids, planes, hdrs, _ts in fr.iter_planar_chunks(8):
        out = pipe.project_planar(jnp.asarray(planes.copy()),
                                  jnp.asarray(hdrs.copy()))
        xyz = out[0] if isinstance(out, tuple) else out  # first return
        print(f"planar chunk {list(fids)}: XYZ {xyz.shape} "
              f"max |r| = {float(abs(xyz).max()):.2f} m")

        # full-field decode from the same staging (fused XLA)
        fields = pipe.decode_planar(jnp.asarray(planes.copy()),
                                    jnp.asarray(hdrs.copy()))
        names = [k for k in fields if k.isupper()]
        print(f"  decoded fields: {names}")

        # fused per-column dewarp: identity poses here; a SLAM pipeline
        # passes its per-column trajectory
        poses = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                 (fids.size, fr.plan.w, 4, 4))
        world = pipe.project_planar(jnp.asarray(planes.copy()),
                                    jnp.asarray(hdrs.copy()), poses=poses)
        assert np.isfinite(np.asarray(world)).all()
        break

    # 2. packet-words path: every field + XYZ in one jitted pipeline
    batch, fids = fr.read_all(max_frames=4)
    out = pipe.batch(jnp.asarray(batch))
    print(f"packet-words batch {list(fids)}: "
          f"XYZ {out['XYZ'].shape}, RANGE {out['RANGE'].shape}")


if __name__ == "__main__":
    main()
