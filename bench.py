"""Headline benchmark: packet -> XYZ throughput at 128x2048 dual-return.

Target (BASELINE.md): >= 1 Gpt/s/chip first-return points, XYZ within the
f32-representable tolerance of the reference f64 math. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures the fused Pallas decode+projection kernel
(ops/pallas_kernels.py) over B-frame batches with a value dependency
chained between dispatches so the runtime cannot elide repeated work; both
returns are projected, first-return points are counted (the reference's
dual-return convention). Host->HBM staging bandwidth is reported on stderr
(in this sandbox the TPU sits behind a tunnel, so dispatch latency ~9 ms
dominates; batching amortizes it).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    # persistent compilation cache across bench runs
    try:
        os.makedirs("/root/repo/.jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from __graft_entry__ import _make_info, _synth_frame
    from ouster_sdk_tpu.ops.pallas_kernels import (
        PlanarLut,
        unpack_project_pallas_batched,
    )
    from ouster_sdk_tpu.ops.unpack import make_decode_plan
    from ouster_sdk_tpu.ops.xyzlut import make_xyz_lut

    W, H = 2048, 128
    info = _make_info(w=W, h=H, dual=True)
    plan = make_decode_plan(info)
    frame = _synth_frame(info)
    # fused LUT kernel (ops/pallas_kernels.py): contiguous pixel-region
    # ingest, in-VMEM xpose + sublane-split word select, both returns from
    # one fetch, double-single projection (1 f32 ulp of the f64 reference).
    # The LUT blocks re-read per tile amortize across the batch, measuring
    # faster than the LUT-free synthesis variant at this batch size
    # (ops/pallas_lutfree.py: 2.3-2.5 vs 2.9-3.0 Gpt/s here).
    lut = PlanarLut(make_xyz_lut(info))

    B = 128
    frames_np = np.broadcast_to(frame, (B,) + frame.shape).copy()
    # two pre-salted input variants so alternating dispatches are distinct
    # computations the runtime cannot cache/elide (a large in-graph
    # dynamic-update-slice compiles very slowly through the remote tunnel)
    frames2_np = frames_np.copy()
    frames2_np[0, 0, plan.hw] ^= 2  # flip a column-timestamp bit
    variants = [jnp.asarray(frames_np), jnp.asarray(frames2_np)]

    @jax.jit
    def step(fr):
        xyz, xyz2 = unpack_project_pallas_batched(
            fr, lut.dir_hi, lut.dir_lo, lut.off_hi, lut.off_lo, plan,
            dual=True)
        return jnp.sum(xyz) + jnp.sum(xyz2)

    # warmup/compile, then a chained warm loop to reach steady state (the
    # first ~10 dispatches through the tunnel carry a cold penalty)
    for v in variants:
        jax.block_until_ready(step(v))
    warm = jnp.float32(0)
    for i in range(10):
        warm = warm + step(variants[i % 2])
    jax.block_until_ready(warm)

    iters = 30
    acc = jnp.float32(0)
    t0 = time.perf_counter()
    for i in range(iters):
        acc = acc + step(variants[i % 2])
    jax.block_until_ready(acc)
    dt = time.perf_counter() - t0

    pts = B * H * W * iters  # first-return points
    mpts = pts / dt / 1e6

    # host->device staging bandwidth (side info)
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(frames_np[:4]))
    h2d = frames_np[:4].nbytes / (time.perf_counter() - t0) / 1e9

    print(f"device={jax.devices()[0].device_kind} B={B} iters={iters} "
          f"dt={dt:.3f}s ({dt / iters * 1e3:.2f} ms/dispatch) "
          f"h2d={h2d:.2f} GB/s dual-return (both returns projected) "
          f"acc={float(acc):.3e}", file=sys.stderr)

    print(json.dumps({
        "metric": "packet_to_xyz_throughput_128x2048_dual",
        "value": round(mpts, 1),
        "unit": "Mpt/s/chip",
        "vs_baseline": round(mpts / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
