"""Multi-chip scaling: data parallelism over frames/sensors via jax.sharding.

The reference's only parallelism is intra-host threads + OpenMP
(ref: SURVEY.md §2.15) — there is no collective communication to translate.
The TPU-native scaling story is pure SPMD data parallelism: a batch of
frames (possibly from many sensors) is sharded over a 1-D device mesh on the
leading axis; every op in the fused pipeline is elementwise over (B, H, W),
so XLA inserts zero collectives and scaling is linear in chips. Collation /
reduction steps (e.g. multi-sensor point-cloud fusion or global statistics)
use psum/all_gather over the same mesh.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "batch") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def shard_frames(mesh: Mesh, frames: jnp.ndarray,
                 axis_name: str = "batch") -> jnp.ndarray:
    """Place a (B, ...) array with the leading axis split over the mesh."""
    return jax.device_put(
        frames, NamedSharding(mesh, P(axis_name)))


def sharded_pipeline(pipe, mesh: Mesh, axis_name: str = "batch"):
    """Wrap a ScanPipeline's batch fn with explicit input/output shardings.

    Returns fn(frames_words (B, n_pkts, pkt_words), poses (B, W, 4, 4))
    -> dict of (B, ...) arrays, B sharded over the mesh.
    """
    in_shard = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    def run(frames_words, poses):
        return pipe._batch(frames_words, pipe.lut, poses)

    return jax.jit(
        run,
        in_shardings=(in_shard, in_shard),
        out_shardings=in_shard,
    )


def make_mesh_2d(n_sensors: int, n_frames: int,
                 axis_names=("sensor", "frame")) -> Mesh:
    """2D device mesh: sensors on one axis, frame batch on the other —
    the natural layout for multi-sensor rigs (per-sensor LUTs live on the
    sensor axis like per-shard weights; frames are pure data parallel)."""
    devs = np.array(jax.devices()[:n_sensors * n_frames])
    return Mesh(devs.reshape(n_sensors, n_frames), axis_names)


def sharded_multi_sensor_step(pipes: Sequence, mesh: Mesh):
    """Build a jitted step over a (S, F, n_pkts, pkt_words) frame batch on
    a ("sensor", "frame") mesh using shard_map + explicit collectives.

    Per-sensor LUTs are stacked on the sensor axis (sharded like weights
    in tensor parallelism); frames are data parallel; the returned global
    centroid is psum'd over BOTH mesh axes, exercising ICI collectives.

    Returns (step_fn, stacked_luts): step_fn(frames, luts, poses) ->
    (xyz (S, F, H, W, 3), centroid (3,) replicated).
    """
    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # pre-0.8 jax
        from jax.experimental.shard_map import shard_map

    pipe0 = pipes[0]
    luts = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[p.lut for p in pipes])

    def local_step(frames, lut, poses):
        # frames: (S_loc, F_loc, n_pkts, words); lut: (S_loc, ...) pytree
        def per_sensor(fr, lt, po):
            out = pipe0._batch(fr, lt, po)
            return out["XYZ"], out["RANGE"]

        xyz, rng = jax.vmap(per_sensor)(frames, lut, poses)
        total = jax.lax.psum(jax.lax.psum(
            jnp.sum(xyz, axis=(0, 1, 2, 3)), "frame"), "sensor")
        count = jax.lax.psum(jax.lax.psum(
            jnp.sum(rng != 0), "frame"), "sensor")
        centroid = total / jnp.maximum(count, 1)
        return xyz, centroid

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P("sensor", "frame"), P("sensor"),
                  P("sensor", "frame")),
        out_specs=(P("sensor", "frame"), P()),
    )
    return jax.jit(sharded), luts


def fuse_multi_sensor_clouds(mesh: Mesh, clouds: jnp.ndarray,
                             extrinsics: jnp.ndarray,
                             axis_name: str = "sensor") -> jnp.ndarray:
    """Apply per-sensor extrinsics to (S, N, 3) clouds sharded over the
    mesh's sensor axis, then all-gather the fused (S*N, 3) world-frame
    cloud so every device holds the full result — the TPU equivalent of
    the reference Collator + extrinsics fan-in
    (ref: scan_source_utils.h:22)."""
    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # pre-0.8 jax
        from jax.experimental.shard_map import shard_map

    def apply(cloud, ext):
        return cloud @ ext[:3, :3].T + ext[:3, 3]

    def local_fuse(clouds_blk, ext_blk):
        fused = jax.vmap(apply)(clouds_blk, ext_blk)
        # gather the sensor-sharded blocks so the fused cloud is
        # replicated (rides ICI; ref module docstring)
        return jax.lax.all_gather(
            fused, axis_name, axis=0, tiled=True).reshape(-1, 3)

    kw = dict(mesh=mesh, in_specs=(P(axis_name), P(axis_name)),
              out_specs=P())
    try:  # jax >= 0.7 calls the replication check check_vma
        fn = shard_map(local_fuse, check_vma=False, **kw)
    except TypeError:
        fn = shard_map(local_fuse, check_rep=False, **kw)
    return fn(clouds, extrinsics)
