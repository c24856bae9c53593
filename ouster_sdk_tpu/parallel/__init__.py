"""Multi-chip scaling API (SPMD over jax.sharding meshes).

Public surface:
- make_mesh / make_mesh_2d: device mesh constructors
- ShardedScanPipeline (via ScanPipeline.sharded(mesh)): the planar
  decode/projection kernel family under shard_map, batch-sharded
- shard_frames: leading-axis placement helper
- sharded_multi_sensor_step: (sensor, frame) 2-D mesh step with
  per-sensor LUTs and psum collectives
- fuse_multi_sensor_clouds: extrinsics fan-in + all_gather
"""

from .sharding import (  # noqa: F401
    ShardedScanPipeline,
    fuse_multi_sensor_clouds,
    make_mesh,
    make_mesh_2d,
    shard_frames,
    sharded_multi_sensor_step,
    sharded_pipeline,
)

__all__ = [
    "ShardedScanPipeline",
    "fuse_multi_sensor_clouds",
    "make_mesh",
    "make_mesh_2d",
    "shard_frames",
    "sharded_multi_sensor_step",
    "sharded_pipeline",
]
