"""Device-side decode of bit-packed staging (ops layer of the wire-rate
ingest path; host side: FrameReader.iter_packed_chunks /
native onat_group_frames_packed).

Lidar ranges are 15/19-bit fields; shipping them as 32-bit words wastes
40-60% of the host->device link. The packed layout is a dense LSB-first
bitstream per (field, pixel row); because 32 pixels always span exactly
`nbits` u32 words (32*nbits % 32 == 0), the unpack is a fixed 32-lane
pattern of STATIC shifts over (..., w//32, nbits) blocks — XLA fuses it
straight into the projection with no gathers and no variable shifts,
so the link savings are free on-chip. The reference has no analog: its
ingest is host-resident (ref: parsing.cpp:653-702 decodes in place); on
a TPU the packets must cross a link first, which makes the wire format a
first-class performance surface.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .unpack import DecodePlan


def unfuse_words(fused: jnp.ndarray,
                 layout: Tuple[Tuple[int, Tuple[int, ...], str], ...]):
    """Device-side twin of io.frames.ChunkFuser.pack: slice one fused
    u32 upload buffer back into its arrays (static offsets/shapes, so
    XLA sees plain slices — free next to the transfer they replace).
    u8/u16 entries are re-derived from the u32 words with static shifts
    (TPU-friendly; no bitcast of sub-word types needed). Supported
    dtypes: u8/u16/u32/f32 — 64-bit values (frame ids, timestamps)
    belong in host-side metadata, not the upload buffer."""
    out = []
    for off, shape, dt in layout:
        n = 1
        for s in shape:
            n *= s
        if dt == "uint32":
            out.append(jax.lax.slice(fused, (off,), (off + n,))
                       .reshape(shape))
        elif dt == "float32":
            w = jax.lax.slice(fused, (off,), (off + n,))
            out.append(jax.lax.bitcast_convert_type(w, jnp.float32)
                       .reshape(shape))
        elif dt in ("uint8", "uint16"):
            per = 4 if dt == "uint8" else 2
            nw = (n + per - 1) // per
            w = jax.lax.slice(fused, (off,), (off + nw,))
            parts = [(w >> np.uint32(8 * (4 // per) * k))
                     & np.uint32((1 << (32 // per)) - 1)
                     for k in range(per)]
            v = jnp.stack(parts, axis=-1).reshape(-1)[:n]
            out.append(v.astype(dt).reshape(shape))
        else:
            raise ValueError(f"unfuse_words: unsupported dtype {dt}")
    return out


def unpack_bits(packed: jnp.ndarray, nbits: int, w: int) -> jnp.ndarray:
    """(..., w*nbits//32) u32 dense LSB-first bitstream -> (..., w) u32
    values. Static-shift 32-pixel block pattern; w % 32 == 0."""
    if w % 32:
        raise ValueError("w must be a multiple of 32")
    blocks = packed.reshape(packed.shape[:-1] + (w // 32, nbits))
    mask = np.uint32((1 << nbits) - 1)
    lanes = []
    for j in range(32):
        bit = nbits * j
        w0, s = bit // 32, bit % 32
        v = blocks[..., w0]
        if s:
            v = v >> np.uint32(s)
        if s + nbits > 32:
            v = v | (blocks[..., w0 + 1] << np.uint32(32 - s))
        lanes.append(v & mask)
    out = jnp.stack(lanes, axis=-1)          # (..., w//32, 32)
    return out.reshape(packed.shape[:-1] + (w,))


@functools.partial(jax.jit,
                   static_argnames=("plan", "nbits", "upshifts",
                                    "precision", "dual"))
def project_packed_batched(packed: jnp.ndarray, col_hdrs: jnp.ndarray,
                           lut_stack, plan: DecodePlan, nbits: int,
                           upshifts: Tuple[int, ...] = (0,),
                           precision: str = "dd",
                           dual: bool = False,
                           poses: Optional[jnp.ndarray] = None):
    """Packed range stream(s) -> XYZ, numerically identical to the planar
    kernels (same _proj_lean math; tests assert bit-equality). packed is
    (B, n_fields, h, w*nbits//32) with field 0 = RANGE (and field 1 =
    RANGE2 when dual); col_hdrs (B, chw, w) supplies the per-column
    status mask exactly like the planar path."""
    from .pallas_kernels import (project_ranges_batched,
                                 status_valid_mask_batched)

    if len(upshifts) < (2 if dual else 1):
        raise ValueError(
            "upshifts needs one entry per packed field "
            f"({2 if dual else 1}); use packed_range_fields(plan, dual)")
    if packed.ndim == 3:
        packed = packed[None]
        col_hdrs = col_hdrs[None]
    B = packed.shape[0]

    vm = status_valid_mask_batched(col_hdrs, plan)        # (B, 1, w)

    def field(k):
        r = unpack_bits(packed[:, k], nbits, plan.w)      # (B, h, w)
        if upshifts[k]:
            r = r << np.uint32(upshifts[k])
        return r & vm

    return project_ranges_batched(field, lut_stack, precision, dual,
                                  poses)


def packed_range_fields(plan: DecodePlan, dual: bool
                        ) -> Tuple[Tuple[Tuple[int, int], ...],
                                   int, Tuple[int, ...]]:
    """(fields, nbits, upshifts) for RANGE(+RANGE2) packed staging of
    this profile — the arguments to pair FrameReader.iter_packed_chunks
    with project_packed_batched."""
    def fp(name):
        for f in plan.fields:
            if f.name == name:
                return f
        raise KeyError(name)

    r1 = fp("RANGE")
    fields = [(r1.word, r1.bit)]
    upshifts = [r1.upshift]
    if dual:
        r2 = fp("RANGE2")
        if r2.size != r1.size:
            raise RuntimeError("mixed range widths")
        fields.append((r2.word, r2.bit))
        upshifts.append(r2.upshift)
    return tuple(fields), r1.size, tuple(upshifts)
