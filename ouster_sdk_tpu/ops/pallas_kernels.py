"""Pallas TPU kernels for the hot decode/projection path (LUT-based).

The XLA pipeline (ops/fused.py) materializes every decoded field in HBM;
this kernel path emits only XYZ. The kernel ingests the CONTIGUOUS
per-column pixel-word region, transposes the tile with the VMEM xpose
unit, splits the sublane dim (h*pw, TW) -> (h, pw, TW) — free, the lane
dim is untouched — and indexes the RANGE word plane in-register: the
alternative stride-pw XLA slice lowers to a lane relayout that costs more
than the projection (measured; see ops/pallas_lutfree.py for the same
scheme with in-kernel direction synthesis). The LUT is stored planar
(3, h, w) hi/lo so the lane dimension rides W (ref: pallas guide — tiling
constraints; SURVEY.md §3.3).

This LUT path serves every sensor incl. DF (per-pixel angle tables that
don't factorize); OS sensors prefer ops/pallas_lutfree.py, which replaces
the 48 B/px LUT reads with ~16 KB of VMEM factor tables.

Mosaic notes observed on v5e: no u32->f32 casts (route via i32), no
lane-dimension reshapes or lane-strided slices; 32-bit tile transposes
and sublane-dim splits are supported.
"""

from __future__ import annotations

import functools
from typing import Optional

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

from .pallas_lutfree import _field_plan, _pix_t3, _prep_pixel_words
from .precision import dd_add, dd_mul_f
from .unpack import DecodePlan
from .xyzlut import XYZLut, XYZLutDevice
from .precision import split_f64_array


class PlanarLut:
    """LUT split to (3, h, w) f32 hi/lo planes for lane-friendly blocks.

    `stack` additionally carries the direction-hi planes pre-split into
    12-bit Veltkamp halves (dh1 + dh2 == dir_hi exactly), so the kernel's
    error-free r*dir product needs no runtime Veltkamp splitting: the
    range integer is split exactly with bit masks and all four partial
    products are exact (Dekker). Layout: 18 planes =
    [dir_hi(3), dh1(3), dh2(3), dir_lo(3), off_hi(3), off_lo(3)].
    """

    def __init__(self, lut: XYZLut):
        dh, dl = split_f64_array(np.moveaxis(lut.direction, -1, 0))
        oh, ol = split_f64_array(np.moveaxis(lut.offset, -1, 0))
        c = np.float32(4097.0) * dh          # 2**12 + 1 f32 splitter
        dh1 = c - (c - dh)
        dh2 = dh - dh1
        self.stack = jnp.asarray(
            np.concatenate([dh, dh1, dh2, dl, oh, ol], axis=0))
        self.dir_hi = self.stack[0:3]
        self.dir_lo = self.stack[9:12]
        self.off_hi = self.stack[12:15]
        self.off_lo = self.stack[15:18]


def _range_to_xyz(w0, dir_hi, dir_lo, off_hi, off_lo, *, bit, size,
                  upshift, precision):
    lo = _extract_bits(w0, bit=bit, size=size, upshift=upshift)
    # mosaic has no u32 -> f32 cast; range fits in i32 (< 2^20 mm)
    r = lo.astype(jnp.int32).astype(jnp.float32)[None]   # (1, h, TW)
    if precision == "dd":
        p_hi, p_lo = dd_mul_f(dir_hi, dir_lo, r)
        s_hi, s_lo = dd_add(p_hi, p_lo, off_hi, off_lo)
        xyz = s_hi + s_lo
    else:
        xyz = r * dir_hi + off_hi
    return jnp.where(r != 0, xyz, jnp.float32(0))


def _masked_word(t3, v_ref, word: int):
    w0 = t3[:, word, :]                           # (h, TW) u32
    return jnp.where(v_ref[:] != 0, w0, np.uint32(0))


def _project_kernel(pix_ref, v_ref, dir_hi_ref, dir_lo_ref, off_hi_ref,
                    off_lo_ref, xyz_ref, *, h: int, pw: int, word: int,
                    bit: int, size: int, upshift: int, precision: str):
    t3 = _pix_t3(pix_ref, h, pw)
    xyz_ref[:] = _range_to_xyz(
        _masked_word(t3, v_ref, word), dir_hi_ref[:], dir_lo_ref[:],
        off_hi_ref[:], off_lo_ref[:], bit=bit, size=size, upshift=upshift,
        precision=precision)


def _project_dual_kernel(pix_ref, v_ref, dir_hi_ref, dir_lo_ref,
                         off_hi_ref, off_lo_ref, xyz_ref, xyz2_ref, *,
                         h: int, pw: int, word: int, bit: int, size: int,
                         upshift: int, word2: int, bit2: int, size2: int,
                         upshift2: int, precision: str):
    # one pixel-region fetch serves both returns
    t3 = _pix_t3(pix_ref, h, pw)
    args = (dir_hi_ref[:], dir_lo_ref[:], off_hi_ref[:], off_lo_ref[:])
    xyz_ref[:] = _range_to_xyz(
        _masked_word(t3, v_ref, word), *args, bit=bit, size=size,
        upshift=upshift, precision=precision)
    xyz2_ref[:] = _range_to_xyz(
        _masked_word(t3, v_ref, word2), *args, bit=bit2, size=size2,
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
    rng_plan = _field_plan(plan, "RANGE")
    pix, valid_row, _, _ = _prep_pixel_words(frame_words, plan)

    if plan.w % tile_w or plan.w < tile_w:
        raise ValueError(
            f"tile_w={tile_w} must evenly divide w={plan.w}")
    grid = (plan.w // tile_w,)
    kernel = functools.partial(
        _project_kernel, h=plan.h, pw=plan.pw, word=rng_plan.word,
        bit=rng_plan.bit, size=rng_plan.size, upshift=rng_plan.upshift,
        precision=precision)

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
            spec((tile_w, plan.h * plan.pw), lambda j: (j, 0)),
            spec((1, tile_w), lambda j: (0, j)),
            lut_spec, lut_spec, lut_spec, lut_spec,
        ],
        out_specs=spec((3, plan.h, tile_w), lambda j: (0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((3, plan.h, plan.w), jnp.float32),
        interpret=interpret,
    )(pix, valid_row, dir_hi, dir_lo, off_hi, off_lo)


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

    The batch rides the grid: the LUT block index wraps modulo the frame
    width — no vmap, no batched gathers, same kernel. Output blocks write
    straight into (B*3, h, w) (bit-identical memory to (B, 3, h, w), so
    the trailing reshape is free).
    """
    rng_plan = _field_plan(plan, "RANGE")
    pix, valid_row, B, _ = _prep_pixel_words(frames_words, plan)

    if plan.w % tile_w or plan.w < tile_w:
        raise ValueError(
            f"tile_w={tile_w} must evenly divide w={plan.w}")
    tiles_per_frame = plan.w // tile_w
    grid = (B * tiles_per_frame,)
    mem = pltpu.VMEM if (_HAS_TPU_PALLAS and not interpret) else None

    def spec(block, index_map):
        if mem is not None:
            return pl.BlockSpec(block, index_map, memory_space=mem)
        return pl.BlockSpec(block, index_map)

    word_spec = spec((tile_w, plan.h * plan.pw), lambda j: (j, 0))
    valid_spec = spec((1, tile_w), lambda j: (0, j))
    lut_spec = spec((3, plan.h, tile_w),
                    lambda j: (0, 0, j % tiles_per_frame))
    out_spec = spec(
        (3, plan.h, tile_w),
        lambda j: (j // tiles_per_frame, 0, j % tiles_per_frame))
    out_shape = jax.ShapeDtypeStruct((B * 3, plan.h, plan.w), jnp.float32)

    if not dual:
        kernel = functools.partial(
            _project_kernel, h=plan.h, pw=plan.pw, word=rng_plan.word,
            bit=rng_plan.bit, size=rng_plan.size,
            upshift=rng_plan.upshift, precision=precision)
        out = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[word_spec, valid_spec,
                      lut_spec, lut_spec, lut_spec, lut_spec],
            out_specs=out_spec, out_shape=out_shape, interpret=interpret,
        )(pix, valid_row, dir_hi, dir_lo, off_hi, off_lo)
        return out.reshape(B, 3, plan.h, plan.w)

    rng2_plan = _field_plan(plan, "RANGE2")
    kernel = functools.partial(
        _project_dual_kernel, h=plan.h, pw=plan.pw, word=rng_plan.word,
        bit=rng_plan.bit, size=rng_plan.size, upshift=rng_plan.upshift,
        word2=rng2_plan.word, bit2=rng2_plan.bit, size2=rng2_plan.size,
        upshift2=rng2_plan.upshift, precision=precision)
    out1, out2 = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[word_spec, valid_spec,
                  lut_spec, lut_spec, lut_spec, lut_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(out_shape, out_shape), interpret=interpret,
    )(pix, valid_row, dir_hi, dir_lo, off_hi, off_lo)
    return (out1.reshape(B, 3, plan.h, plan.w),
            out2.reshape(B, 3, plan.h, plan.w))


def _extract_bits(w0, *, bit: int, size: int, upshift: int):
    lo = w0 >> np.uint32(bit) if bit else w0
    if size < 32:
        lo = lo & np.uint32((1 << size) - 1)
    if upshift:
        lo = lo << np.uint32(upshift)
    return lo


def _proj_lean(r_u32, L, *, precision: str):
    """Integer range (h, TW) u32 (< 2**23) -> xyz (3, h, TW) f32.

    precision='dd': correctly-rounded (<= 0.5 f32 ulp of the f64 value)
    compensated evaluation of r*dir + off. The Dekker residual of r*dir_hi
    comes for free: r splits exactly with bit masks (11-bit halves) and
    dir_hi ships pre-split in the LUT stack (PlanarLut), so no runtime
    Veltkamp splitting — ~40% fewer VPU ops than the generic two_prod/
    two_sum chain in ops/precision.py (measured 4.3 -> 3.5 ms per
    128-frame 128x2048-dual batch).
    """
    DH, DH1, DH2, DL, OH, OL = (L[0:3], L[3:6], L[6:9], L[9:12],
                                L[12:15], L[15:18])
    if precision != "dd":
        r = r_u32.astype(jnp.int32).astype(jnp.float32)[None]
        return jnp.where(r != 0, r * DH + OH, jnp.float32(0))
    rl_i = r_u32 & np.uint32(0x7FF)
    rh_i = r_u32 - rl_i
    # mosaic has no u32 -> f32 cast; range fits in i32 (< 2^23 mm)
    rh = rh_i.astype(jnp.int32).astype(jnp.float32)[None]
    rl = rl_i.astype(jnp.int32).astype(jnp.float32)[None]
    r = rh + rl                                   # exact (integer < 2^23)
    p = r * DH
    # Dekker: all four partial products are exact (11+12 bit mantissas)
    e = ((rh * DH1 - p) + rh * DH2 + rl * DH1) + rl * DH2
    # two_sum(p, OH) — magnitudes are not ordered (dir components cross 0)
    s = p + OH
    bb = s - p
    es = (p - (s - bb)) + (OH - bb)
    xyz = s + (((e + es) + r * DL) + OL)
    return jnp.where(r != 0, xyz, jnp.float32(0))


def _valid_mask_u32(v_ref):
    return jnp.where(v_ref[:] != 0, np.uint32(0xFFFFFFFF), np.uint32(0))


def _dewarp_tile(xyz, P):
    """Per-column SE(3): pose planes P (12, TW) = row-major R (9) + t (3);
    xyz (3, h, TW) -> world (3, h, TW) (ref: pose_util.h:44 dewarp)."""
    rows = []
    for i in range(3):
        acc = P[9 + i][None] + P[3 * i][None] * xyz[0]
        for k in range(1, 3):
            acc = acc + P[3 * i + k][None] * xyz[k]
        rows.append(acc)                             # (h, TW) each
    return jnp.stack(rows, axis=0)                   # (3, h, TW)


def _planar_kernel(rng_ref, v_ref, lut_ref, xyz_ref, *, bit: int,
                   size: int, upshift: int, precision: str):
    r = _extract_bits(rng_ref[0], bit=bit, size=size, upshift=upshift)
    xyz_ref[:] = _proj_lean(r & _valid_mask_u32(v_ref), lut_ref[:],
                            precision=precision)


def _planar_dewarp_kernel(rng_ref, v_ref, pose_ref, lut_ref, xyz_ref, *,
                          bit: int, size: int, upshift: int,
                          precision: str):
    r = _extract_bits(rng_ref[0], bit=bit, size=size, upshift=upshift)
    r = r & _valid_mask_u32(v_ref)
    xyz = _proj_lean(r, lut_ref[:], precision=precision)
    world = _dewarp_tile(xyz, pose_ref[:])
    # keep no-return pixels at zero (dewarp would move them to the pose
    # translation otherwise)
    xyz_ref[:] = jnp.where((r != 0)[None], world, jnp.float32(0))


def _planar_dual_dewarp_kernel(rw_ref, v_ref, pose_ref, lut_ref, xyz_ref,
                               xyz2_ref, *, bit: int, size: int,
                               upshift: int, bit2: int, size2: int,
                               upshift2: int, precision: str):
    """Dual-return fused unpack -> xyz -> dewarp: both returns share the
    column's pose (dewarp is per-column, return-agnostic —
    ref: pose_util.h:44-67 applies pose w to every point of column w)."""
    vm = _valid_mask_u32(v_ref)
    L = lut_ref[:]
    P = pose_ref[:]
    r1 = _extract_bits(rw_ref[0], bit=bit, size=size, upshift=upshift) & vm
    r2 = _extract_bits(rw_ref[1], bit=bit2, size=size2,
                       upshift=upshift2) & vm
    w1 = _dewarp_tile(_proj_lean(r1, L, precision=precision), P)
    w2 = _dewarp_tile(_proj_lean(r2, L, precision=precision), P)
    xyz_ref[:] = jnp.where((r1 != 0)[None], w1, jnp.float32(0))
    xyz2_ref[:] = jnp.where((r2 != 0)[None], w2, jnp.float32(0))


def _planar_dual_split_dewarp_kernel(rng_ref, rng2_ref, v_ref, pose_ref,
                                     lut_ref, xyz_ref, xyz2_ref, *,
                                     bit: int, size: int, upshift: int,
                                     bit2: int, size2: int, upshift2: int,
                                     precision: str):
    """Split-plane variant of _planar_dual_dewarp_kernel (profiles whose
    range words can't ride one (2, h, TW) block)."""
    vm = _valid_mask_u32(v_ref)
    L = lut_ref[:]
    P = pose_ref[:]
    r1 = _extract_bits(rng_ref[0], bit=bit, size=size, upshift=upshift) & vm
    r2 = _extract_bits(rng2_ref[0], bit=bit2, size=size2,
                       upshift=upshift2) & vm
    w1 = _dewarp_tile(_proj_lean(r1, L, precision=precision), P)
    w2 = _dewarp_tile(_proj_lean(r2, L, precision=precision), P)
    xyz_ref[:] = jnp.where((r1 != 0)[None], w1, jnp.float32(0))
    xyz2_ref[:] = jnp.where((r2 != 0)[None], w2, jnp.float32(0))


def _planar_dual_kernel(rw_ref, v_ref, lut_ref, xyz_ref, xyz2_ref, *,
                        bit: int, size: int, upshift: int, bit2: int,
                        size2: int, upshift2: int, precision: str):
    """Aligned fast path: one (2, h, TW) input block carries both range
    words (RANGE in row 0, RANGE2 in row 1) — one input DMA stream, and
    each return writes its own contiguous (B*3, h, w) array so consumers
    never pay a de-interleave copy."""
    vm = _valid_mask_u32(v_ref)
    L = lut_ref[:]
    r1 = _extract_bits(rw_ref[0], bit=bit, size=size, upshift=upshift)
    r2 = _extract_bits(rw_ref[1], bit=bit2, size=size2, upshift=upshift2)
    xyz_ref[:] = _proj_lean(r1 & vm, L, precision=precision)
    xyz2_ref[:] = _proj_lean(r2 & vm, L, precision=precision)


def _planar_dual_split_kernel(rng_ref, rng2_ref, v_ref, lut_ref, xyz_ref,
                              xyz2_ref, *, bit: int, size: int,
                              upshift: int, bit2: int, size2: int,
                              upshift2: int, precision: str):
    """Fallback for profiles whose two range words can't ride one block
    (odd words-per-pixel or non-adjacent range words)."""
    vm = _valid_mask_u32(v_ref)
    L = lut_ref[:]
    r1 = _extract_bits(rng_ref[0], bit=bit, size=size, upshift=upshift)
    r2 = _extract_bits(rng2_ref[0], bit=bit2, size=size2,
                       upshift=upshift2)
    xyz_ref[:] = _proj_lean(r1 & vm, L, precision=precision)
    xyz2_ref[:] = _proj_lean(r2 & vm, L, precision=precision)


@functools.partial(jax.jit,
                   static_argnames=("plan", "tile_w", "precision", "dual",
                                    "interpret", "words"))
def unpack_project_planar_batched(planes: jnp.ndarray, col_hdrs: jnp.ndarray,
                                  lut_stack, plan: DecodePlan,
                                  tile_w: int = 256,
                                  precision: str = "dd", dual: bool = False,
                                  interpret: bool = False,
                                  poses: Optional[jnp.ndarray] = None,
                                  words: Optional[tuple] = None):
    """Fused decode over word-planar frames: planes (B, pw, h, w) u32 +
    col_hdrs (B, chw, w) u32 -> (B, 3, h, w) f32 (pair when dual=True).
    `lut_stack` is PlanarLut.stack — (18, h, w) f32 with the direction-hi
    planes pre-split for the error-free product (see PlanarLut).

    With poses (B, w, 4, 4) f32, the per-column SE(3) dewarp fuses into
    the same kernel (the north-star unpack -> xyz -> dewarp chain,
    ref: SURVEY §3.3) and the output is world-frame; dual-return profiles
    dewarp both returns with the column's shared pose (dewarp is
    return-agnostic, ref: pose_util.h:44-67).

    The host stages frames word-planar (io/frames.py iter_planar_chunks /
    native onat_group_frames_planar), so this kernel does NO transpose and
    the XLA prep is a contiguous plane slice — the packet-layout kernel
    above spends most of its time on exactly those two relayouts
    (measured: 11 ms -> ~2 ms per 128-frame batch at 128x2048 dual).
    Dual-return profiles with adjacent, block-aligned range words ride a
    merged (2, h, TW)-in kernel (one input DMA stream).

    `words` (static tuple) declares which packet words the planes array
    actually carries: projection needs only the range word(s), so staging
    and host->device transfer can ship planes[:, words] — 1/pw (single)
    or 2/pw (dual) of the packet bytes (FrameReader.iter_planar_chunks
    word subsetting). Default: all pw words, in packet order.
    """
    if planes.ndim == 3:
        planes = planes[None]
        col_hdrs = col_hdrs[None]
    B = planes.shape[0]
    pw = planes.shape[1]
    if words is None:
        if pw != plan.pw:
            raise ValueError(f"planes carry {pw} words but profile has "
                             f"{plan.pw}; pass words=(...) for subsets")
        words = tuple(range(plan.pw))

    def wmap(word):
        if word not in words:
            raise ValueError(f"projection needs packet word {word}; "
                             f"planes carry only {words}")
        return words.index(word)

    rng_plan = _field_plan(plan, "RANGE")

    # validity row: status plane is a contiguous slice of the planar
    # col headers (no lane-strided gather)
    status = col_hdrs[:, plan.staged_status_word, :] >> np.uint32(plan.status_bit)
    if plan.status_size < 32:
        status = status & np.uint32((1 << plan.status_size) - 1)
    valid = (status & np.uint32(1)).astype(jnp.uint32)
    valid = valid.reshape(1, B * plan.w)  # row layout: block (1, tile_w)

    rows = planes.reshape(B * pw, plan.h, plan.w)
    if plan.w % tile_w or plan.w < tile_w:
        raise ValueError(
            f"tile_w={tile_w} must evenly divide w={plan.w}")
    tiles_per_frame = plan.w // tile_w
    # 2D grid (tile, batch), batch fastest: the LUT block index depends
    # only on the tile coordinate, so Mosaic keeps the LUT block
    # resident across the whole batch instead of re-fetching ~2 MB per
    # step (at B=128 that redundant LUT traffic exceeded the data itself)
    grid = (tiles_per_frame, B)
    mem = pltpu.VMEM if (_HAS_TPU_PALLAS and not interpret) else None

    def spec(block, index_map):
        if mem is not None:
            return pl.BlockSpec(block, index_map, memory_space=mem)
        return pl.BlockSpec(block, index_map)

    def word_spec(word):
        word = wmap(word)
        return spec((1, plan.h, tile_w),
                    lambda i, b, word=word: (b * pw + word, 0, i))

    valid_spec = spec((1, tile_w),
                      lambda i, b: (0, b * tiles_per_frame + i))
    lut_spec = spec((18, plan.h, tile_w), lambda i, b: (0, 0, i))
    out_spec = spec((3, plan.h, tile_w), lambda i, b: (b, 0, i))
    out_shape = jax.ShapeDtypeStruct((B * 3, plan.h, plan.w), jnp.float32)

    pose_rows = pose_spec = None
    if poses is not None:
        # pose planes: (B, w, 4, 4) -> (B*12, w): rows 0-8 = R row-major,
        # 9-11 = t, matching _dewarp_tile
        if poses.ndim == 3:
            poses = poses[None]
        R = poses[..., :3, :3].reshape(B, plan.w, 9)
        t = poses[..., :3, 3]
        pose_rows = jnp.concatenate([R, t], axis=-1).astype(jnp.float32)
        pose_rows = jnp.moveaxis(pose_rows, -1, 1).reshape(B * 12, plan.w)
        pose_spec = spec((12, tile_w), lambda i, b: (b, i))

    if poses is not None and not dual:
        kernel = functools.partial(
            _planar_dewarp_kernel, bit=rng_plan.bit, size=rng_plan.size,
            upshift=rng_plan.upshift, precision=precision)
        out = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[word_spec(rng_plan.word), valid_spec, pose_spec,
                      lut_spec],
            out_specs=out_spec, out_shape=out_shape, interpret=interpret,
        )(rows, valid, pose_rows, lut_stack)
        return out.reshape(B, 3, plan.h, plan.w)

    if not dual:
        kernel = functools.partial(
            _planar_kernel, bit=rng_plan.bit, size=rng_plan.size,
            upshift=rng_plan.upshift, precision=precision)
        out = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[word_spec(rng_plan.word), valid_spec, lut_spec],
            out_specs=out_spec, out_shape=out_shape, interpret=interpret,
        )(rows, valid, lut_stack)
        return out.reshape(B, 3, plan.h, plan.w)

    rng2_plan = _field_plan(plan, "RANGE2")
    statics = dict(bit=rng_plan.bit, size=rng_plan.size,
                   upshift=rng_plan.upshift, bit2=rng2_plan.bit,
                   size2=rng2_plan.size, upshift2=rng2_plan.upshift,
                   precision=precision)
    w1, w2 = wmap(rng_plan.word), wmap(rng2_plan.word)
    aligned = (w2 == w1 + 1 and pw % 2 == 0 and w1 % 2 == 0)
    if aligned:
        # block units: first-dim block size 2 -> index is (row // 2)
        rw_spec = spec(
            (2, plan.h, tile_w),
            lambda i, b: ((b * pw + w1) // 2, 0, i))
        if poses is not None:
            out1, out2 = pl.pallas_call(
                functools.partial(_planar_dual_dewarp_kernel, **statics),
                grid=grid,
                in_specs=[rw_spec, valid_spec, pose_spec, lut_spec],
                out_specs=(out_spec, out_spec),
                out_shape=(out_shape, out_shape), interpret=interpret,
            )(rows, valid, pose_rows, lut_stack)
        else:
            out1, out2 = pl.pallas_call(
                functools.partial(_planar_dual_kernel, **statics),
                grid=grid,
                in_specs=[rw_spec, valid_spec, lut_spec],
                out_specs=(out_spec, out_spec),
                out_shape=(out_shape, out_shape), interpret=interpret,
            )(rows, valid, lut_stack)
        return (out1.reshape(B, 3, plan.h, plan.w),
                out2.reshape(B, 3, plan.h, plan.w))

    if poses is not None:
        out1, out2 = pl.pallas_call(
            functools.partial(_planar_dual_split_dewarp_kernel, **statics),
            grid=grid,
            in_specs=[word_spec(rng_plan.word), word_spec(rng2_plan.word),
                      valid_spec, pose_spec, lut_spec],
            out_specs=(out_spec, out_spec),
            out_shape=(out_shape, out_shape), interpret=interpret,
        )(rows, rows, valid, pose_rows, lut_stack)
    else:
        out1, out2 = pl.pallas_call(
            functools.partial(_planar_dual_split_kernel, **statics),
            grid=grid,
            in_specs=[word_spec(rng_plan.word), word_spec(rng2_plan.word),
                      valid_spec, lut_spec],
            out_specs=(out_spec, out_spec),
            out_shape=(out_shape, out_shape), interpret=interpret,
        )(rows, rows, valid, lut_stack)
    return (out1.reshape(B, 3, plan.h, plan.w),
            out2.reshape(B, 3, plan.h, plan.w))


def status_valid_mask_batched(col_hdrs: jnp.ndarray, plan: DecodePlan
                              ) -> jnp.ndarray:
    """(B, 1, w) u32 mask from the per-column status valid bit — the
    zero-fill semantics every staging variant (planar/packed/BP64)
    must apply identically (ref: lidar_scan.cpp:1194 zero_fields)."""
    status = col_hdrs[:, plan.staged_status_word, :] >> np.uint32(plan.status_bit)
    if plan.status_size < 32:
        status = status & np.uint32((1 << plan.status_size) - 1)
    return jnp.where((status & np.uint32(1)) != 0, np.uint32(0xFFFFFFFF),
                     np.uint32(0))[:, None, :]


def project_ranges_batched(field, lut_stack, precision: str, dual: bool,
                           poses: Optional[jnp.ndarray]):
    """Shared projection epilogue for the batched staging variants:
    `field(k)` returns the k-th masked range image (B, h, w) u32.
    Returns xyz (B, 3, h, w) [or (xyz, xyz2) when dual], optionally
    dewarped by per-column poses with no-return pixels kept at zero —
    one definition so the bit-identical-across-stagings guarantee has
    a single source of truth."""

    def proj(r):
        return jax.vmap(
            lambda rr: _proj_lean(rr, lut_stack, precision=precision))(r)

    r1 = field(0)
    xyz = proj(r1)                                       # (B, 3, h, w)

    if poses is not None:
        if poses.ndim == 3:
            poses = poses[None]
        rot = poses[..., :3, :3].astype(jnp.float32)     # (B, w, 3, 3)
        t = poses[..., :3, 3].astype(jnp.float32)        # (B, w, 3)

        def dewarp(pts, r):
            world = jnp.einsum("bwij,bjhw->bihw", rot, pts) \
                + jnp.moveaxis(t, -1, 1)[:, :, None, :]
            # no-return pixels stay at zero, matching the Pallas kernels
            return jnp.where((r != 0)[:, None], world, jnp.float32(0))

        if not dual:
            return dewarp(xyz, r1)
        r2 = field(1)
        # both returns share the column's pose (return-agnostic dewarp,
        # ref: pose_util.h:44-67)
        return dewarp(xyz, r1), dewarp(proj(r2), r2)

    if not dual:
        return xyz
    return xyz, proj(field(1))


@functools.partial(jax.jit,
                   static_argnames=("plan", "precision", "dual", "words"))
def unpack_project_planar_batched_xla(planes: jnp.ndarray,
                                      col_hdrs: jnp.ndarray,
                                      lut_stack, plan: DecodePlan,
                                      precision: str = "dd",
                                      dual: bool = False,
                                      poses: Optional[jnp.ndarray] = None,
                                      words: Optional[tuple] = None):
    """Pure-XLA twin of unpack_project_planar_batched: identical inputs,
    outputs, and numerics (same _extract_bits/_proj_lean math, so the
    result is bit-identical to the Pallas kernel), lowered entirely
    through stock XLA ops — no custom calls.

    Why it exists: the projection is bandwidth-trivial next to the
    host->device transfer, so on hosts where the runtime penalizes
    custom-call dispatch (e.g. tunneled/virtualized TPU attachments) the
    XLA lowering sustains higher END-TO-END throughput even though the
    Pallas kernel wins on pure on-chip dispatch rate. ScanPipeline's
    engine='auto' picks per environment; see ops/fused.py.
    """
    if planes.ndim == 3:
        planes = planes[None]
        col_hdrs = col_hdrs[None]
    B, pw = planes.shape[0], planes.shape[1]
    if words is None:
        if pw != plan.pw:
            raise ValueError(f"planes carry {pw} words but profile has "
                             f"{plan.pw}; pass words=(...) for subsets")
        words = tuple(range(plan.pw))

    def wmap(word):
        if word not in words:
            raise ValueError(f"projection needs packet word {word}; "
                             f"planes carry only {words}")
        return words.index(word)

    vm = status_valid_mask_batched(col_hdrs, plan)    # (B, 1, w) over h

    def field(k):
        fp = _field_plan(plan, "RANGE" if k == 0 else "RANGE2")
        return _extract_bits(planes[:, wmap(fp.word)], bit=fp.bit,
                             size=fp.size, upshift=fp.upshift) & vm

    return project_ranges_batched(field, lut_stack, precision, dual,
                                  poses)


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
