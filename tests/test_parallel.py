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


def _planar_batch(info, B):
    """Synth a frame and stage it word-planar, replicated to a (B, ...)
    batch with distinct noise per frame id column untouched (the kernel
    is elementwise per frame, so replication is fine for equality)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _synth_frame
    from ouster_sdk_tpu.ops.unpack import make_decode_plan
    from test_pallas import _stage_planar

    plan = make_decode_plan(info)
    rng = np.random.default_rng(11)
    planes, hdrs = [], []
    for b in range(B):
        frame = _synth_frame(info)
        p, h = _stage_planar(frame, plan)
        planes.append(p)
        hdrs.append(h)
    return np.stack(planes), np.stack(hdrs)


@pytest.mark.parametrize("engine", ["pallas", "xla"])
def test_sharded_scan_pipeline_matches_single_chip(engine):
    """ScanPipeline.sharded(mesh): the planar kernel family (the SAME
    kernels bench.py runs — Pallas in interpret mode on this CPU mesh)
    executes under shard_map, output batch-sharded over 8 devices and
    bit-identical to the unsharded single-chip path."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _make_info
    from ouster_sdk_tpu.ops.fused import ScanPipeline
    from ouster_sdk_tpu.parallel import make_mesh

    info = _make_info(w=256, h=16, dual=False)
    pipe = ScanPipeline(info)
    planes, hdrs = _planar_batch(info, 8)

    sp = pipe.sharded(make_mesh(8), engine=engine)
    out = sp.project(sp.shard(planes), sp.shard(hdrs))
    assert out.shape == (8, 3, 16, 256)
    assert len(out.sharding.device_set) == 8

    ref = pipe.project_planar(jnp.asarray(planes), jnp.asarray(hdrs),
                              engine=engine)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sharded_dual_and_dewarp_paths():
    """Dual-return yields a sharded pair; fused dewarp accepts sharded
    per-column poses — both equal to the single-chip planar path."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _make_info
    from ouster_sdk_tpu.ops.fused import ScanPipeline
    from ouster_sdk_tpu.parallel import make_mesh

    mesh = make_mesh(8)

    # dual
    info_d = _make_info(w=256, h=16, dual=True)
    pipe_d = ScanPipeline(info_d)
    planes, hdrs = _planar_batch(info_d, 8)
    sp = pipe_d.sharded(mesh, engine="pallas")
    o1, o2 = sp.project(sp.shard(planes), sp.shard(hdrs))
    r1, r2 = pipe_d.project_planar(jnp.asarray(planes), jnp.asarray(hdrs),
                                   engine="pallas")
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(r1))
    np.testing.assert_array_equal(np.asarray(o2), np.asarray(r2))
    assert len(o2.sharding.device_set) == 8

    # single-return fused dewarp with per-frame pose ramps
    info_s = _make_info(w=256, h=16, dual=False)
    pipe_s = ScanPipeline(info_s)
    planes, hdrs = _planar_batch(info_s, 8)
    rng = np.random.default_rng(5)
    poses = np.broadcast_to(np.eye(4, dtype=np.float32),
                            (8, 256, 4, 4)).copy()
    poses[..., :3, 3] = rng.normal(size=(8, 256, 3)).astype(np.float32)
    sps = pipe_s.sharded(mesh, engine="pallas")
    out = sps.project(sps.shard(planes), sps.shard(hdrs),
                      poses=sps.shard(poses))
    ref = pipe_s.project_planar(jnp.asarray(planes), jnp.asarray(hdrs),
                                poses=jnp.asarray(poses), engine="pallas")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sharded_map_source_streams_and_pads(tmp_path):
    """Source-level batch API: FrameReader chunks stream through the
    sharded projector; a 6-frame capture on an 8-way mesh pads the tail
    chunk to the compiled shape and reports only the real frame ids."""
    import sys

    sys.path.insert(0, "/root/repo")
    import bench as bench_mod
    from __graft_entry__ import _make_info
    from ouster_sdk_tpu.io.frames import FrameReader
    from ouster_sdk_tpu.ops.fused import ScanPipeline
    from ouster_sdk_tpu.parallel import make_mesh

    info = _make_info(w=256, h=16, dual=False)
    path = str(tmp_path / "six.pcap")
    bench_mod._synth_pcap(path, info, 6)

    pipe = ScanPipeline(info)
    sp = pipe.sharded(make_mesh(8), engine="xla")
    reader = FrameReader(path, info=info)
    got = {}
    for fids, xyz in sp.map_source(reader, chunk=8):
        assert xyz.shape[0] == 8  # compiled shape incl. padding
        for i, f in enumerate(fids):
            got[int(f)] = np.asarray(xyz[i])
    assert sorted(got) == [1, 2, 3, 4, 5, 6]

    ref_reader = FrameReader(path, info=info)
    fids, planes, hdrs, _ = next(ref_reader.iter_planar_chunks(8))
    ref = np.asarray(pipe.project_planar(jnp.asarray(planes),
                                         jnp.asarray(hdrs), engine="xla"))
    for i, f in enumerate(fids):
        np.testing.assert_array_equal(got[int(f)], ref[i])


def test_sharded_batch_divisibility_error():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _make_info
    from ouster_sdk_tpu.ops.fused import ScanPipeline
    from ouster_sdk_tpu.parallel import make_mesh

    info = _make_info(w=256, h=16, dual=False)
    sp = ScanPipeline(info).sharded(make_mesh(8))
    with pytest.raises(ValueError, match="not divisible"):
        sp.shard(np.zeros((6, 4, 16, 256), dtype=np.uint32))


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
