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

from typing import Dict, Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _shard_map():
    fn = getattr(jax, "shard_map", None)
    if fn is None:  # pre-0.8 jax
        from jax.experimental.shard_map import shard_map as fn
    return fn


def _shard_map_norep(fn, **kw):
    """shard_map with the replication check disabled: Pallas out_shapes
    carry no vma annotation, and the keyword's name changed across jax
    versions (check_rep -> check_vma)."""
    sm = _shard_map()
    try:
        return sm(fn, check_vma=False, **kw)
    except TypeError:  # jax < 0.7
        return sm(fn, check_rep=False, **kw)


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
    shard_map = _shard_map()
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
    def apply(cloud, ext):
        return cloud @ ext[:3, :3].T + ext[:3, 3]

    def local_fuse(clouds_blk, ext_blk):
        fused = jax.vmap(apply)(clouds_blk, ext_blk)
        # gather the sensor-sharded blocks so the fused cloud is
        # replicated (rides ICI; ref module docstring)
        return jax.lax.all_gather(
            fused, axis_name, axis=0, tiled=True).reshape(-1, 3)

    fn = _shard_map_norep(local_fuse, mesh=mesh,
                          in_specs=(P(axis_name), P(axis_name)),
                          out_specs=P())
    return fn(clouds, extrinsics)


class ShardedScanPipeline:
    """Public multi-chip face of the planar decode/projection family.

    Wraps a ScanPipeline so the SAME kernel family the single-chip
    benchmark runs (ops/pallas_kernels.py planar kernels, or their
    bit-identical XLA twins) executes under `shard_map` over a device
    mesh: a (B, ...) batch of word-planar staged frames is split on the
    leading axis, every chip runs the fused unpack+projection on its
    local shard, and outputs stay batch-sharded for downstream sharded
    consumers (reductions ride `psum`/`all_gather` on the same mesh).

    The reference has no multi-device analog — its parallelism stops at
    OpenMP threads (ref: SURVEY.md §2.15); this is the TPU-native scaling
    story: pure SPMD over frames, zero collectives in the hot loop, so
    throughput is linear in chips.

    Construct via :meth:`ScanPipeline.sharded`::

        pipe = ScanPipeline(info)
        sp = pipe.sharded(make_mesh())          # all local chips
        planes, hdrs = sp.shard(planes), sp.shard(hdrs)
        xyz = sp.project(planes, hdrs)          # (B, 3, h, w), sharded

    or stream straight from a capture::

        for fids, xyz in sp.map_source(FrameReader(path, info=info)):
            ...

    `engine` picks the lowering per chip: 'pallas' (the hand-tiled TPU
    kernel; lowered in interpret mode on non-TPU backends so the kernel
    logic itself is what runs on the CPU test mesh), 'xla' (stock-ops
    twin, bit-identical), or 'auto' (pallas on TPU, xla elsewhere —
    same policy as the single-chip path, ops/fused.py).
    """

    def __init__(self, pipe, mesh: Mesh, *, axis_name: Optional[str] = None,
                 engine: str = "auto", words: Optional[Tuple[int, ...]] = None,
                 tile_w: Optional[int] = None):
        from ..ops.fused import planar_engine_default

        self.pipe = pipe
        self.mesh = mesh
        if axis_name is None:
            axis_name = mesh.axis_names[0]
        self.axis_name = axis_name
        self.n_shards = mesh.shape[axis_name]
        if engine == "auto":
            engine = planar_engine_default()
        self.engine = engine
        self.words = words
        plan = pipe.cfg.plan
        w = plan.w
        if tile_w is None:
            tile_w = 256 if (w % 256 == 0 and w >= 256) else w
        self._tile_w = tile_w
        platforms = {d.platform for d in mesh.devices.flat}
        self._interpret = engine == "pallas" and platforms != {"tpu"}
        self._in = NamedSharding(mesh, P(axis_name))
        self._repl = NamedSharding(mesh, P())
        self._jit_cache: Dict[Tuple[bool, ...], object] = {}

    def shard(self, arr) -> jnp.ndarray:
        """Place a (B, ...) array with B split over the mesh axis."""
        arr = np.asarray(arr) if not isinstance(arr, jnp.ndarray) else arr
        if arr.shape[0] % self.n_shards:
            raise ValueError(
                f"batch {arr.shape[0]} not divisible by the mesh's "
                f"{self.n_shards} shards on axis {self.axis_name!r}; pad "
                f"the batch (see map_source) or resize the chunk")
        return jax.device_put(arr, self._in)

    def replicate(self, arr) -> jnp.ndarray:
        """Place an array fully replicated on every mesh device."""
        return jax.device_put(arr, self._repl)

    def _local_project(self, dewarp: bool):
        from ..ops.pallas_kernels import (
            unpack_project_planar_batched,
            unpack_project_planar_batched_xla,
        )

        cfg = self.pipe.cfg
        dual = cfg.dual and not dewarp
        kw = dict(plan=cfg.plan, precision=cfg.precision, dual=dual,
                  words=self.words)

        if self.engine == "xla":
            def local(planes, hdrs, lut, *poses):
                return unpack_project_planar_batched_xla(
                    planes, hdrs, lut,
                    poses=poses[0] if poses else None, **kw)
        else:
            def local(planes, hdrs, lut, *poses):
                return unpack_project_planar_batched(
                    planes, hdrs, lut, tile_w=self._tile_w,
                    interpret=self._interpret,
                    poses=poses[0] if poses else None, **kw)
        return local, dual

    def _projector(self, dewarp: bool):
        key = (dewarp,)
        fn = self._jit_cache.get(key)
        if fn is None:
            local, dual = self._local_project(dewarp)
            ax = self.axis_name
            in_specs = (P(ax), P(ax), P()) + ((P(ax),) if dewarp else ())
            out_specs = (P(ax), P(ax)) if dual else P(ax)
            fn = jax.jit(_shard_map_norep(
                local, mesh=self.mesh, in_specs=in_specs,
                out_specs=out_specs))
            self._jit_cache[key] = fn
        return fn

    def project(self, planes: jnp.ndarray, col_hdrs: jnp.ndarray,
                poses: Optional[jnp.ndarray] = None):
        """Batched planes (B, pw|n_sel, h, w) + col headers (B, chw, w)
        -> XYZ (B, 3, h, w) f32, batch-sharded over the mesh (a pair of
        arrays for dual-return profiles; world-frame when per-column
        poses (B, w, 4, 4) are given). Bit-identical to the single-chip
        ScanPipeline.project_planar on the same engine."""
        lut = self.pipe._planar_lut.stack
        if poses is not None:
            return self._projector(True)(planes, col_hdrs, lut, poses)
        return self._projector(False)(planes, col_hdrs, lut)

    __call__ = project

    def map_source(self, reader, chunk: Optional[int] = None,
                   pipelined: bool = True
                   ) -> Iterator[Tuple[np.ndarray, object]]:
        """Source-level batch API: stream a FrameReader's word-planar
        chunks through the sharded projector. Yields (frame_ids, xyz)
        per chunk with xyz batch-sharded on the mesh; a short tail chunk
        is padded up to the mesh batch (compiled shape) and the padding
        rows are dropped from frame_ids, so callers slice xyz by
        len(frame_ids)."""
        if chunk is None:
            chunk = self.n_shards * max(1, 8 // self.n_shards)
        if chunk % self.n_shards:
            raise ValueError(f"chunk {chunk} must be a multiple of the "
                             f"mesh's {self.n_shards} shards")
        it = (reader.iter_planar_chunks_pipelined(chunk, words=self.words)
              if pipelined else
              reader.iter_planar_chunks(chunk, words=self.words))
        for fids, planes, hdrs, _ts in it:
            n = fids.size
            if n < chunk:
                pad = chunk - n
                planes = np.concatenate(
                    [planes, np.broadcast_to(planes[-1:],
                                             (pad,) + planes.shape[1:])])
                hdrs = np.concatenate(
                    [hdrs, np.broadcast_to(hdrs[-1:],
                                           (pad,) + hdrs.shape[1:])])
            yield fids, self.project(self.shard(planes), self.shard(hdrs))
