"""Multi-chip sharding on the virtual 8-device CPU mesh
(ref: parallel/sharding.py; task requirement dryrun_multichip)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_mesh_sharded_batch_pipeline():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _make_info, _synth_frame
    from ouster_sdk_tpu.ops.fused import ScanPipeline

    n = len(jax.devices())
    assert n >= 8, f"expected 8 virtual devices, got {n}"

    info = _make_info(w=64, h=16, dual=False)
    pipe = ScanPipeline(info)
    frame = _synth_frame(info)

    mesh = Mesh(np.array(jax.devices()[:8]), ("batch",))
    frames = jax.device_put(
        jnp.asarray(np.stack([frame] * 8)), NamedSharding(mesh, P("batch")))
    poses = jax.device_put(
        jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (8, 64, 4, 4)),
        NamedSharding(mesh, P("batch")))

    out = pipe._batch(frames, pipe.lut, poses)
    xyz = out["XYZ"]
    assert xyz.shape == (8, 16, 64, 3)
    # output stays sharded on the batch axis
    assert len(xyz.sharding.device_set) == 8
    # all shards agree with the single-frame path
    single = pipe(jnp.asarray(frame))["XYZ"]
    np.testing.assert_allclose(np.asarray(xyz[3]), np.asarray(single),
                               rtol=0, atol=0)


def test_collective_reduction_over_mesh():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:8]), ("sensor",))
    clouds = jax.device_put(
        jnp.ones((8, 100, 3)), NamedSharding(mesh, P("sensor")))

    @jax.jit
    def total_points(c):
        return jnp.sum(c[..., 0])

    assert float(total_points(clouds)) == 800.0


def test_fuse_multi_sensor_clouds_gathers_world_frame():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ouster_sdk_tpu.parallel.sharding import fuse_multi_sensor_clouds

    rng = np.random.default_rng(3)
    S, N = 8, 50
    clouds_np = rng.normal(size=(S, N, 3))
    ext_np = np.broadcast_to(np.eye(4), (S, 4, 4)).copy()
    ext_np[:, :3, 3] = rng.normal(size=(S, 3))  # distinct translations

    mesh = Mesh(np.array(jax.devices()[:8]), ("sensor",))
    clouds = jax.device_put(jnp.asarray(clouds_np),
                            NamedSharding(mesh, P("sensor")))
    ext = jax.device_put(jnp.asarray(ext_np),
                         NamedSharding(mesh, P("sensor")))

    fused = fuse_multi_sensor_clouds(mesh, clouds, ext)
    assert fused.shape == (S * N, 3)
    expect = np.concatenate(
        [clouds_np[i] @ ext_np[i, :3, :3].T + ext_np[i, :3, 3]
         for i in range(S)])
    np.testing.assert_allclose(np.asarray(fused), expect, atol=1e-6)
    # result is replicated (all-gathered), not left sharded
    assert fused.sharding.is_fully_replicated


def test_graft_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_2d_mesh_multi_sensor_step():
    """(sensor, frame) mesh: per-sensor LUTs ride the sensor axis like
    sharded weights; explicit psum collectives produce a replicated
    global centroid identical to the unsharded computation."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _make_info, _synth_frame
    from ouster_sdk_tpu.ops.fused import ScanPipeline
    from ouster_sdk_tpu.parallel.sharding import (make_mesh_2d,
                                                  sharded_multi_sensor_step)

    S, F = 2, 4
    infos = []
    for s in range(S):
        i2 = _make_info(w=64, h=16, dual=False)
        i2.format.columns_per_packet = 16
        i2.beam_altitude_angles = list(np.linspace(20.0 - s, -20.0 - s, 16))
        infos.append(i2)
    pipes = [ScanPipeline(i) for i in infos]
    mesh = make_mesh_2d(S, F)
    step, luts = sharded_multi_sensor_step(pipes, mesh)

    frames = jnp.asarray(np.stack(
        [np.stack([_synth_frame(infos[s])] * F) for s in range(S)]))
    poses = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (S, F, 64, 4, 4))
    with mesh:
        fr = jax.device_put(frames, NamedSharding(mesh, P("sensor", "frame")))
        lt = jax.device_put(luts, NamedSharding(mesh, P("sensor")))
        po = jax.device_put(poses, NamedSharding(mesh, P("sensor", "frame")))
        xyz, centroid = step(fr, lt, po)
        xyz.block_until_ready()

    # reference: unsharded per-sensor compute
    tot = np.zeros(3)
    cnt = 0
    for s in range(S):
        out = pipes[s]._batch(frames[s], pipes[s].lut, poses[s])
        np.testing.assert_allclose(np.asarray(xyz[s]), np.asarray(out["XYZ"]),
                                   rtol=0, atol=1e-6)
        tot += np.asarray(jnp.sum(out["XYZ"], axis=(0, 1, 2)))
        cnt += int(jnp.sum(out["RANGE"] != 0))
    # psum tree-reduction order differs from the sequential reference sum
    np.testing.assert_allclose(np.asarray(centroid), tot / max(cnt, 1),
                               rtol=1e-4)
