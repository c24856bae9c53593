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

    out = pipe._batch_native(frames, pipe.lut, poses)
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


def test_graft_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
