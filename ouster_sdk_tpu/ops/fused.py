"""The fused frame pipeline: packets -> fields -> XYZ -> destagger -> dewarp.

This is the north-star compute path of the framework (ref: SURVEY.md §3.3 —
the reference runs these as four separate OpenMP/Eigen passes:
ScanBatcher parse, cartesianT, destagger_into, dewarp). Here the entire
chain is one jitted XLA program over the (H, W) grid: bit-unpack feeds the
projection multiply-adds directly, the destagger gather is folded in, and
per-column pose dewarp is a batched (W,3,3) contraction — no intermediate
trips to HBM between stages beyond what XLA schedules.

Batch ('B') and sensor axes vmap/pjit over the same program; sharding the
batch axis across a device mesh is pure data parallelism (see
parallel/sharding.py).
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import ChanField
from ..core.types import SensorInfo
from .destagger import destagger_jnp
from .precision import dd_add, dd_mul_f
from .unpack import DecodePlan, _extract, decode_frame, make_decode_plan
from .xyzlut import XYZLutDevice, make_xyz_lut, to_device_lut


@dataclass(frozen=True)
class PipelineConfig:
    """Static configuration for the fused pipeline (hashable, jit-static)."""

    plan: DecodePlan
    shifts: Tuple[int, ...]
    destagger: bool = True
    dewarp: bool = True
    dual: bool = False
    precision: str = "dd"  # "dd" | "f32"


def planar_engine_default() -> str:
    """Resolve engine='auto' for the planar projection: the
    OUSTER_SDK_TPU_ENGINE env var ('pallas' | 'xla') wins; otherwise
    Pallas on real TPU backends and XLA everywhere else (CPU/interpret)."""
    import os

    env = os.environ.get("OUSTER_SDK_TPU_ENGINE", "").strip().lower()
    if env in ("pallas", "xla"):
        return env
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    return "pallas" if platform == "tpu" else "xla"


class ScanPipeline:
    """Per-sensor fused pipeline factory.

    Usage:
        pipe = ScanPipeline(info)
        out = pipe(packet_words)               # single frame
        out = pipe.batch(frames_words, poses)  # (B, ...) frames
    """

    def __init__(self, info: SensorInfo, *, use_extrinsics: bool = False,
                 destagger: bool = True, dewarp: bool = True,
                 precision: str = "dd"):
        self.info = info
        self._use_extrinsics = use_extrinsics
        plan = make_decode_plan(info)
        self.cfg = PipelineConfig(
            plan=plan,
            shifts=tuple(info.format.pixel_shift_by_row),
            destagger=destagger,
            dewarp=dewarp,
            dual=any(f.name == ChanField.RANGE2 for f in plan.fields),
            precision=precision,
        )
        self.lut = to_device_lut(make_xyz_lut(info, use_extrinsics))
        self._single = jax.jit(functools.partial(
            _pipeline, cfg=self.cfg))
        self._batch = jax.jit(jax.vmap(
            functools.partial(_pipeline, cfg=self.cfg),
            in_axes=(0, None, 0)))
        # no-pose variants: skip the identity dewarp einsum entirely
        # (cfg is jit-static, so this compiles a genuinely cheaper
        # program for the common no-SLAM path)
        cfg_nd = dataclasses.replace(self.cfg, dewarp=False)
        self._single_nd = jax.jit(functools.partial(_pipeline, cfg=cfg_nd))
        self._batch_nd = jax.jit(jax.vmap(
            functools.partial(_pipeline, cfg=cfg_nd),
            in_axes=(0, None, 0)))
        self._dummy_pose = jnp.broadcast_to(
            jnp.eye(4, dtype=jnp.float32), (self.cfg.plan.w, 4, 4))

    def __call__(self, packet_words: jnp.ndarray,
                 poses: Optional[jnp.ndarray] = None
                 ) -> Dict[str, jnp.ndarray]:
        if poses is None:
            return self._single_nd(packet_words, self.lut,
                                   self._dummy_pose)
        return self._single(packet_words, self.lut, poses)

    def batch(self, frames_words: jnp.ndarray,
              poses: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
        b = frames_words.shape[0]
        if poses is None:
            dummy = jnp.broadcast_to(
                jnp.eye(4, dtype=jnp.float32),
                (b, self.cfg.plan.w, 4, 4))
            return self._batch_nd(frames_words, self.lut, dummy)
        return self._batch(frames_words, self.lut, poses)

    # -- planar fast path ---------------------------------------------------
    @functools.cached_property
    def _planar_lut(self):
        from .pallas_kernels import PlanarLut

        # honor the constructor's extrinsics flag: both the packet-layout
        # and planar paths must project into the same frame
        return PlanarLut(make_xyz_lut(self.info, self._use_extrinsics))

    def project_planar(self, planes: jnp.ndarray, col_hdrs: jnp.ndarray,
                       poses: Optional[jnp.ndarray] = None,
                       words: Optional[Tuple[int, ...]] = None,
                       engine: str = "auto"):
        """Fastest packets -> XYZ path: word-planar staged frames
        (FrameReader.iter_planar_chunks) through the planar projection —
        no in-VMEM transpose, no XLA strided prep (2x the packet-layout
        kernel; see ops/pallas_kernels.py). Returns (B, 3, h, w) XYZ
        (sensor frame, or world frame when per-column poses are given;
        a pair of arrays for dual-return profiles — both returns dewarp
        with the column's shared pose, ref: pose_util.h:44-67).

        `words` declares a word-subset staging (see
        FrameReader.iter_planar_chunks). `engine` picks the lowering:
        'pallas' (hand-tiled kernel — fastest on-chip dispatch),
        'xla' (stock-ops twin, bit-identical output; no custom calls),
        or 'auto' (env OUSTER_SDK_TPU_ENGINE, else pallas on TPU). The
        XLA twin exists because some TPU attachments (tunneled or
        virtualized runtimes) throttle host<->device DMA after any
        custom-call execution; there the end-to-end pipeline runs faster
        on the XLA lowering even though the Pallas kernel wins on-chip."""
        from .pallas_kernels import (
            unpack_project_planar_batched,
            unpack_project_planar_batched_xla,
        )

        lut = self._planar_lut
        if engine == "auto":
            engine = planar_engine_default()
        kw = dict(precision=self.cfg.precision,
                  dual=self.cfg.dual, poses=poses,
                  words=words)
        if engine == "xla":
            return unpack_project_planar_batched_xla(
                planes, col_hdrs, lut.stack, self.cfg.plan, **kw)
        # explicit engine='pallas' on a non-TPU backend runs the kernel
        # in interpret mode (CPU test meshes; Mosaic needs real hardware)
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except Exception:
            interpret = True
        return unpack_project_planar_batched(
            planes, col_hdrs, lut.stack, self.cfg.plan,
            interpret=interpret, **kw)

    def sharded(self, mesh=None, *, axis_name: Optional[str] = None,
                engine: str = "auto",
                words: Optional[Tuple[int, ...]] = None,
                tile_w: Optional[int] = None):
        """Multi-chip face of the planar family: returns a
        ShardedScanPipeline running the SAME kernels as project_planar
        under shard_map over `mesh` (default: a 1-D mesh over every
        local device), with batches split on the leading axis. See
        parallel/sharding.py; docs/tpu.md §multi-chip."""
        from ..parallel.sharding import ShardedScanPipeline, make_mesh

        if mesh is None:
            mesh = make_mesh()
        return ShardedScanPipeline(self, mesh, axis_name=axis_name,
                                   engine=engine, words=words,
                                   tile_w=tile_w)

    def decode_planar(self, planes: jnp.ndarray, col_hdrs: jnp.ndarray
                      ) -> Dict[str, jnp.ndarray]:
        """Full-field decode from planar staging (fused XLA, no strided
        selects); batched when inputs carry a leading batch axis."""
        from .unpack import decode_frame_planar, decode_frame_planar_batch

        if planes.ndim == 4:
            return decode_frame_planar_batch(planes, col_hdrs,
                                             self.cfg.plan, True)
        return decode_frame_planar(planes, col_hdrs, self.cfg.plan)


def _project(rng: jnp.ndarray, lut: XYZLutDevice, valid: jnp.ndarray,
             precision: str) -> jnp.ndarray:
    """range (h, w) u32 -> xyz (h, w, 3) f32 (staggered frame)."""
    r = rng.astype(jnp.float32)[..., None]
    if precision == "dd":
        p_hi, p_lo = dd_mul_f(lut.dir_hi, lut.dir_lo, r)
        s_hi, s_lo = dd_add(p_hi, p_lo, lut.off_hi, lut.off_lo)
        xyz = s_hi + s_lo
    else:
        xyz = r * lut.dir_hi + lut.off_hi
    mask = (r != 0) & valid[None, :, None]
    return jnp.where(mask, xyz, jnp.float32(0))


def _pipeline(packet_words: jnp.ndarray, lut: XYZLutDevice,
              poses: jnp.ndarray, *, cfg: PipelineConfig
              ) -> Dict[str, jnp.ndarray]:
    plan = cfg.plan
    fields = decode_frame(packet_words, plan)
    valid = (fields["status"] & 1).astype(jnp.bool_)

    rng = fields[ChanField.RANGE]
    xyz = _project(rng, lut, valid, cfg.precision)

    out: Dict[str, jnp.ndarray] = dict(fields)

    if cfg.dewarp:
        # per-column world poses applied in the staggered frame: column w of
        # every row shares pose w (ref: pose_util.h:44-67)
        rot = poses[:, :3, :3].astype(jnp.float32)
        trans = poses[:, :3, 3].astype(jnp.float32)
        xyz = jnp.einsum("wij,hwj->hwi", rot, xyz) + trans[None]
        xyz = jnp.where((rng != 0)[..., None] & valid[None, :, None],
                        xyz, jnp.float32(0))

    if cfg.dual and ChanField.RANGE2 in out:
        xyz2 = _project(out[ChanField.RANGE2], lut, valid, cfg.precision)
        if cfg.dewarp:
            rot = poses[:, :3, :3].astype(jnp.float32)
            trans = poses[:, :3, 3].astype(jnp.float32)
            xyz2 = jnp.einsum("wij,hwj->hwi", rot, xyz2) + trans[None]
            xyz2 = jnp.where(
                (out[ChanField.RANGE2] != 0)[..., None]
                & valid[None, :, None], xyz2, jnp.float32(0))
        out["XYZ2"] = xyz2

    out["XYZ"] = xyz

    if cfg.destagger:
        shifts = np.asarray(cfg.shifts)
        for k in list(out.keys()):
            v = out[k]
            if v.ndim >= 2 and v.shape[0] == plan.h and \
                    (v.ndim == 2 and v.shape[1] == plan.w
                     or v.ndim == 3 and v.shape[1] == plan.w):
                out[k] = destagger_jnp(v, shifts)
    return out