"""Headline benchmark: packet -> XYZ throughput at 128x2048 dual-return.

Target (BASELINE.md): >= 1 Gpt/s/chip first-return points, XYZ within the
f32-representable tolerance of the reference f64 math. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Runs on whatever jax.devices() provides (real TPU under the driver; CPU
locally). Measures the steady-state jitted pipeline on device-resident
frames (host->HBM staging is double-buffered in deployment and overlaps
compute; its bandwidth is reported separately on stderr).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    # persistent compilation cache: the fused program is large and the
    # remote-compile path is slow; cache across bench runs where supported
    try:
        os.makedirs("/root/repo/.jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from __graft_entry__ import _make_info, _synth_frame
    from ouster_sdk_tpu.ops.fused import ScanPipeline

    W, H = 2048, 128
    info = _make_info(w=W, h=H, dual=True)
    pipe = ScanPipeline(info)
    frame = _synth_frame(info)

    # B frames per dispatch amortize the per-call tunnel latency (~4 ms);
    # the device-side incremental cost is ~0.12 ms/frame at 128x2048 dual
    B = 64
    dev_frame = jnp.asarray(np.broadcast_to(frame, (B,) + frame.shape).copy())
    dev_poses = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, W, 4, 4))

    def step(fr, po):
        out = pipe._batch_native(fr, pipe.lut, po)
        return out["XYZ"], out["XYZ2"]

    step_c = jax.jit(step)
    # warmup/compile
    r = step_c(dev_frame, dev_poses)
    jax.block_until_ready(r)

    # steady-state timing
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        r = step_c(dev_frame, dev_poses)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0

    pts = B * H * W * iters  # first-return points
    mpts = pts / dt / 1e6

    # host->device staging bandwidth (side info)
    frame_np = np.asarray(frame)
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(jax.device_put(frame_np))
    h2d = frame_np.nbytes * 5 / (time.perf_counter() - t0) / 1e9

    print(f"device={jax.devices()[0].device_kind} "
          f"B={B} iters={iters} dt={dt:.3f}s h2d={h2d:.2f} GB/s "
          f"dual-return (2x XYZ computed)", file=sys.stderr)

    print(json.dumps({
        "metric": "packet_to_xyz_throughput_128x2048_dual",
        "value": round(mpts, 1),
        "unit": "Mpt/s/chip",
        "vs_baseline": round(mpts / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
