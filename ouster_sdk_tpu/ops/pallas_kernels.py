"""Pallas TPU kernels for the hot decode/projection path.

The XLA pipeline (ops/fused.py) materializes every decoded field in HBM;
this kernel path emits only XYZ: a strided word-select (pure XLA slice)
pulls each pixel's RANGE word plane out of the packet stream, and the
Pallas kernel fuses bit extract -> double-single projection -> masking over
(h, TILE_W) blocks with the LUT stored planar (3, h, w) so the lane
dimension rides W (ref: pallas guide — tiling constraints; SURVEY.md §3.3).

Mosaic notes observed on v5e: no u32->f32 casts (route via i32) and no
lane-dimension reshapes (hence the outside-the-kernel word select).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_TPU_PALLAS = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_TPU_PALLAS = False

from .precision import dd_add, dd_mul_f
from .unpack import DecodePlan
from .xyzlut import XYZLut, XYZLutDevice
from .precision import split_f64_array


class PlanarLut:
    """LUT split to (3, h, w) f32 hi/lo planes for lane-friendly blocks."""

    def __init__(self, lut: XYZLut):
        dh, dl = split_f64_array(np.moveaxis(lut.direction, -1, 0))
        oh, ol = split_f64_array(np.moveaxis(lut.offset, -1, 0))
        self.dir_hi = jnp.asarray(dh)
        self.dir_lo = jnp.asarray(dl)
        self.off_hi = jnp.asarray(oh)
        self.off_lo = jnp.asarray(ol)


def _range_to_xyz(w0, dir_hi, dir_lo, off_hi, off_lo, *, bit, size,
                  upshift, precision):
    lo = w0 >> np.uint32(bit) if bit else w0
    if size < 32:
        lo = lo & np.uint32((1 << size) - 1)
    if upshift:
        lo = lo << np.uint32(upshift)
    # mosaic has no u32 -> f32 cast; range fits in i32 (< 2^20 mm)
    r = lo.astype(jnp.int32).astype(jnp.float32)[None]   # (1, h, TW)
    if precision == "dd":
        p_hi, p_lo = dd_mul_f(dir_hi, dir_lo, r)
        s_hi, s_lo = dd_add(p_hi, p_lo, off_hi, off_lo)
        xyz = s_hi + s_lo
    else:
        xyz = r * dir_hi + off_hi
    return jnp.where(r != 0, xyz, jnp.float32(0))


def _project_kernel(rw_ref, dir_hi_ref, dir_lo_ref, off_hi_ref, off_lo_ref,
                    xyz_ref, *, bit: int, size: int, upshift: int,
                    precision: str):
    xyz_ref[:] = _range_to_xyz(
        rw_ref[:], dir_hi_ref[:], dir_lo_ref[:], off_hi_ref[:],
        off_lo_ref[:], bit=bit, size=size, upshift=upshift,
        precision=precision)


def _project_dual_kernel(rw_ref, rw2_ref, dir_hi_ref, dir_lo_ref,
                         off_hi_ref, off_lo_ref, xyz_ref, xyz2_ref, *,
                         bit: int, size: int, upshift: int, bit2: int,
                         size2: int, upshift2: int, precision: str):
    args = (dir_hi_ref[:], dir_lo_ref[:], off_hi_ref[:], off_lo_ref[:])
    xyz_ref[:] = _range_to_xyz(rw_ref[:], *args, bit=bit, size=size,
                               upshift=upshift, precision=precision)
    xyz2_ref[:] = _range_to_xyz(rw2_ref[:], *args, bit=bit2, size=size2,
                                upshift=upshift2, precision=precision)


@functools.partial(jax.jit,
                   static_argnames=("plan", "tile_w", "precision",
                                    "interpret"))
def unpack_project_pallas(frame_words: jnp.ndarray, dir_hi, dir_lo, off_hi,
                          off_lo, plan: DecodePlan, tile_w: int = 512,
                          precision: str = "dd",
                          interpret: bool = False) -> jnp.ndarray:
    """Fused packets -> planar XYZ: (n_pkts, pkt_words) u32 ->
    (3, h, w) f32. LUT inputs are (3, h, w) hi/lo planes."""
    rng_plan = next(f for f in plan.fields if f.name == "RANGE")
    if rng_plan.bit + rng_plan.size > 32:
        raise NotImplementedError("word-spanning RANGE profile")

    cols = frame_words[:, plan.hw:plan.hw + plan.cpp * plan.cw]
    cols = cols.reshape(plan.w, plan.cw)

    # validity fold + strided range-word select (cheap XLA ops, one pass)
    status = cols[:, plan.status_word] >> np.uint32(plan.status_bit)
    if plan.status_size < 32:
        status = status & np.uint32((1 << plan.status_size) - 1)
    valid = (status & 1).astype(jnp.bool_)

    start = plan.chw + rng_plan.word
    limit = start + (plan.h - 1) * plan.pw + 1
    rng_words = jax.lax.slice_in_dim(
        cols, start, limit, stride=plan.pw, axis=1)
    rng_words = jnp.where(valid[:, None], rng_words, 0).T  # (h, W)

    grid = (plan.w // tile_w,)
    kernel = functools.partial(
        _project_kernel, bit=rng_plan.bit, size=rng_plan.size,
        upshift=rng_plan.upshift, precision=precision)

    mem = pltpu.VMEM if (_HAS_TPU_PALLAS and not interpret) else None

    def spec(block, index_map):
        if mem is not None:
            return pl.BlockSpec(block, index_map, memory_space=mem)
        return pl.BlockSpec(block, index_map)

    lut_spec = spec((3, plan.h, tile_w), lambda j: (0, 0, j))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec((plan.h, tile_w), lambda j: (0, j)),
            lut_spec, lut_spec, lut_spec, lut_spec,
        ],
        out_specs=spec((3, plan.h, tile_w), lambda j: (0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((3, plan.h, plan.w), jnp.float32),
        interpret=interpret,
    )(rng_words, dir_hi, dir_lo, off_hi, off_lo)


@functools.partial(jax.jit,
                   static_argnames=("plan", "tile_w", "precision", "dual",
                                    "interpret"))
def unpack_project_pallas_batched(frames_words: jnp.ndarray, dir_hi, dir_lo,
                                  off_hi, off_lo, plan: DecodePlan,
                                  tile_w: int = 512, precision: str = "dd",
                                  dual: bool = False,
                                  interpret: bool = False):
    """Batched fused decode: (B, n_pkts, pkt_words) -> (B, 3, h, w)
    (or a pair of them when dual=True).

    The batch rides the grid: frames are laid side by side on the W axis
    and the LUT block index wraps modulo the frame width — no vmap, no
    batched gathers, same kernel.
    """
    rng_plan = next(f for f in plan.fields if f.name == "RANGE")
    if rng_plan.bit + rng_plan.size > 32:
        raise NotImplementedError("word-spanning RANGE profile")
    B = frames_words.shape[0]

    cols = frames_words[:, :, plan.hw:plan.hw + plan.cpp * plan.cw]
    cols = cols.reshape(B * plan.w, plan.cw)

    status = cols[:, plan.status_word] >> np.uint32(plan.status_bit)
    if plan.status_size < 32:
        status = status & np.uint32((1 << plan.status_size) - 1)
    valid = (status & 1).astype(jnp.bool_)

    def word_plane(field_plan):
        start = plan.chw + field_plan.word
        limit = start + (plan.h - 1) * plan.pw + 1
        wp = jax.lax.slice_in_dim(
            cols, start, limit, stride=plan.pw, axis=1)
        return jnp.where(valid[:, None], wp, 0).T  # (h, B*W)

    rng_words = word_plane(rng_plan)

    tiles_per_frame = plan.w // tile_w
    grid = (B * tiles_per_frame,)
    mem = pltpu.VMEM if (_HAS_TPU_PALLAS and not interpret) else None

    def spec(block, index_map):
        if mem is not None:
            return pl.BlockSpec(block, index_map, memory_space=mem)
        return pl.BlockSpec(block, index_map)

    word_spec = spec((plan.h, tile_w), lambda j: (0, j))
    lut_spec = spec((3, plan.h, tile_w),
                    lambda j: (0, 0, j % tiles_per_frame))
    out_spec = spec((3, plan.h, tile_w), lambda j: (0, 0, j))
    out_shape = jax.ShapeDtypeStruct((3, plan.h, B * plan.w), jnp.float32)

    if not dual:
        kernel = functools.partial(
            _project_kernel, bit=rng_plan.bit, size=rng_plan.size,
            upshift=rng_plan.upshift, precision=precision)
        out = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[word_spec, lut_spec, lut_spec, lut_spec, lut_spec],
            out_specs=out_spec, out_shape=out_shape, interpret=interpret,
        )(rng_words, dir_hi, dir_lo, off_hi, off_lo)
        return jnp.moveaxis(out.reshape(3, plan.h, B, plan.w), 2, 0)

    rng2_plan = next(f for f in plan.fields if f.name == "RANGE2")
    rng2_words = word_plane(rng2_plan)
    kernel = functools.partial(
        _project_dual_kernel, bit=rng_plan.bit, size=rng_plan.size,
        upshift=rng_plan.upshift, bit2=rng2_plan.bit,
        size2=rng2_plan.size, upshift2=rng2_plan.upshift,
        precision=precision)
    out1, out2 = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[word_spec, word_spec, lut_spec, lut_spec, lut_spec,
                  lut_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(out_shape, out_shape), interpret=interpret,
    )(rng_words, rng2_words, dir_hi, dir_lo, off_hi, off_lo)
    return (jnp.moveaxis(out1.reshape(3, plan.h, B, plan.w), 2, 0),
            jnp.moveaxis(out2.reshape(3, plan.h, B, plan.w), 2, 0))


def unpack_project(frame_words, lut, plan: DecodePlan, *,
                   tile_w: int = 512, precision: str = "dd",
                   interpret: bool = False):
    """Convenience wrapper: accepts PlanarLut (preferred) or XYZLutDevice;
    returns (h, w, 3)."""
    if isinstance(lut, XYZLutDevice):
        dir_hi = jnp.moveaxis(lut.dir_hi, -1, 0)
        dir_lo = jnp.moveaxis(lut.dir_lo, -1, 0)
        off_hi = jnp.moveaxis(lut.off_hi, -1, 0)
        off_lo = jnp.moveaxis(lut.off_lo, -1, 0)
    else:
        dir_hi, dir_lo = lut.dir_hi, lut.dir_lo
        off_hi, off_lo = lut.off_hi, lut.off_lo
    planar = unpack_project_pallas(
        frame_words, dir_hi, dir_lo, off_hi, off_lo, plan,
        tile_w=tile_w, precision=precision, interpret=interpret)
    return jnp.moveaxis(planar, 0, -1)
