"""BP64: lossless delta/bit-packed wire codec for range-field ingest.

Why it exists: the packed staging (ops/packed.py) already ships the
theoretical floor for INCOMPRESSIBLE ranges (nbits/px). Real captures are
nothing like incompressible — neighbouring azimuth steps land mm apart on
the same surface — so the link (PCIe, or this sandbox's ~30 MB/s tunnel
after first dispatch) is left carrying ~19 bits/px of mostly-small
deltas. BP64 transposes that structure into bytes, per 64-pixel row
block:

  anchor[b]  = first non-zero value of the block (0 if none)   u32 side
  carry c[j] = v[j] if v[j] != 0 else c[j-1]   (c[-1] := anchor)
  z[j]       = zigzag(c[j] - c[j-1])           (0 for dropouts)
  width w    = max bit length of z             (5 bits of the u8 side)
  zmask      = 64-bit dropout bitmask, present only when the block has
               dropouts (flag bit 7 of the width byte)
  payload   += [zmask? 2 words] + z[0..63] packed at w bits = 2*w words

Dropout pixels (range 0 — ubiquitous in real scans) therefore cost 1
bit each and do NOT widen the block: the carry chain glides over them
and the bitmask restores the zeros on decode. A 64-slot block is always
a whole number of u32 words, so the payload is a dense word stream — the
property that keeps the device decode a static-shape gather + shift.
Typical real scenes: 5-9 bits/px (vs 19 packed); worst case (white
noise) is nbits+1.6 bits/px, so the codec is never used blind —
FrameReader measures the first chunk and falls back to packed staging
when a capture doesn't compress (io/frames.py iter_bp64_chunks).

The layout is the delta+block-bitpack family of Parquet's
DELTA_BINARY_PACKED / Lemire's FastPFOR, specialized to word-aligned
64-value blocks, a dropout mask, and a jittable decoder. w % 64 == 0
holds for every lidar mode (512/1024/2048/4096 columns).

Decode runs on device inside the projection program: widths -> word
offsets by cumsum, two u32 gathers per pixel, variable shift, zigzag^-1,
cumsum over the 64-slot axis, + anchor, zero-mask. The reconstructed
range feeds the SAME _proj_lean math as the planar/packed paths, so XYZ
is bit-identical across all three stagings (tests/test_bp64.py).

The reference has no analog: its ingest is host-resident (ref:
parsing.cpp:653-702 decodes in place). On a TPU the packets cross a link
first, which makes the wire format a first-class performance surface.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .unpack import DecodePlan

BLOCK = 64
ZFLAG = np.uint8(0x80)
WMASK = np.uint8(0x1F)


def bp64_encode_numpy(values: np.ndarray, nbits: int
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reference encoder (the native library ships the production one;
    tests assert byte equality). values: (..., w) u32 with w % 64 == 0.
    Returns (payload u32 (P,), widths u8 (..., w//64) [bit7 = has
    dropout mask], anchors u32 (..., w//64)); payload is the dense
    concatenation of every block in C order of the leading axes."""
    if not 1 <= nbits <= 30:
        # widths are 5-bit (WMASK): zigzag deltas of nbits-values need
        # up to nbits+1 bits, so nbits > 30 would truncate width 32 to
        # 0 and decode every delta as zero — corrupt, not slow
        raise ValueError("bp64 supports 1 <= nbits <= 30")
    v = np.ascontiguousarray(values, np.uint32)
    w = v.shape[-1]
    if w % BLOCK:
        raise ValueError("w must be a multiple of 64")
    blocks = v.reshape(-1, BLOCK)                       # (nb, 64)
    nb = len(blocks)
    zero = blocks == 0
    has_z = zero.any(axis=1)
    # carry chain: dropouts inherit the previous value; anchor = first
    # non-zero (or 0 for an all-dropout block)
    idx = np.where(zero, 0, np.arange(1, BLOCK + 1)[None])
    np.maximum.accumulate(idx, axis=1, out=idx)          # last nonzero+1
    first_nz = zero.argmin(axis=1)                       # 0 if none
    anchors = np.where(zero.all(axis=1), np.uint32(0),
                       blocks[np.arange(nb), first_nz])
    padded = np.concatenate([anchors[:, None], blocks], axis=1)  # c[-1]
    carry = padded[np.arange(nb)[:, None], idx]          # (nb, 64)
    prev = np.concatenate([anchors[:, None], carry[:, :-1]], axis=1)
    d = carry - prev                                     # wrapping u32
    z = (d << np.uint32(1)) ^ (0 - (d >> np.uint32(31)))  # zigzag
    maxz = z.max(axis=1)
    widths = np.zeros(nb, np.uint8)
    nzw = maxz > 0
    widths[nzw] = np.floor(
        np.log2(maxz[nzw].astype(np.float64))).astype(np.uint8) + 1
    # block word sizes: optional 2-word zmask + 2*w packed words
    sizes = 2 * widths.astype(np.int64) + 2 * has_z
    word_off = np.zeros(nb, np.int64)
    np.cumsum(sizes[:-1], out=word_off[1:])
    total = int(word_off[-1] + sizes[-1]) if nb else 0
    payload = np.zeros(total, np.uint32)
    if has_z.any():
        zi = np.nonzero(has_z)[0]
        bits = zero[zi].astype(np.uint64) << np.arange(BLOCK,
                                                       dtype=np.uint64)
        zm = bits.sum(axis=1)
        payload[word_off[zi]] = (zm & np.uint64(0xFFFFFFFF)).astype(
            np.uint32)
        payload[word_off[zi] + 1] = (zm >> np.uint64(32)).astype(np.uint32)
    data_off = word_off + 2 * has_z
    for wv in np.unique(widths):
        if wv == 0:
            continue
        sel = np.nonzero(widths == wv)[0]
        zb = z[sel]                                      # (m, 64)
        out = np.zeros((len(sel), 2 * int(wv)), np.uint32)
        for j in range(BLOCK):
            bit = j * int(wv)
            w0, s = bit >> 5, bit & 31
            out[:, w0] |= zb[:, j] << np.uint32(s)
            if s + int(wv) > 32:
                out[:, w0 + 1] |= zb[:, j] >> np.uint32(32 - s)
        oidx = data_off[sel, None] + np.arange(2 * int(wv))[None]
        payload[oidx.ravel()] = out.ravel()
    widths |= has_z.astype(np.uint8) << np.uint8(7)
    lead = values.shape[:-1]
    return (payload, widths.reshape(lead + (w // BLOCK,)),
            anchors.reshape(lead + (w // BLOCK,)))


def _decode_core(xp, pay, wid_b, anc, w):
    """Shared numpy/jnp decode body. pay must have >= 2 slack words
    (numpy; jnp gathers clamp). wid_b/anc are flat (nb_tot,)."""
    u32 = xp.uint32
    wid = (wid_b & WMASK).astype(xp.int32 if xp is jnp else np.int64)
    has_z = (wid_b >> 7).astype(wid.dtype)
    sizes = 2 * wid + 2 * has_z
    word_off = xp.cumsum(sizes) - sizes                  # exclusive
    data_off = word_off + 2 * has_z
    j = xp.arange(BLOCK, dtype=wid.dtype)
    bit = wid[:, None] * j[None]                         # (nb, 64)
    wi = data_off[:, None] + (bit >> 5)
    sh = (bit & 31).astype(u32)
    lo = pay[wi] >> sh
    hi = xp.where(sh == 0, u32(0),
                  pay[wi + 1] << ((u32(32) - sh) & u32(31)))
    mask = (u32(1) << wid[:, None].astype(u32)) - u32(1)
    z = (lo | hi) & mask
    d = (z >> u32(1)) ^ (u32(0) - (z & u32(1)))
    c = anc[:, None] + xp.cumsum(d.astype(u32), axis=1, dtype=u32)
    zm_lo = pay[word_off] * has_z.astype(u32)            # 0 when absent
    zm_hi = pay[word_off + 1] * has_z.astype(u32)
    zbit = xp.where(j[None] < 32,
                    (zm_lo[:, None] >> (j[None] & 31).astype(u32)),
                    (zm_hi[:, None] >> (j[None] & 31).astype(u32))) & u32(1)
    return xp.where(zbit != 0, u32(0), c)


def bp64_decode_numpy(payload: np.ndarray, widths: np.ndarray,
                      anchors: np.ndarray, w: int) -> np.ndarray:
    """Host mirror of the device decode (tests / fallback)."""
    pay = np.concatenate([payload.astype(np.uint32),
                          np.zeros(2, np.uint32)])
    v = _decode_core(np, pay, widths.reshape(-1),
                     anchors.reshape(-1).astype(np.uint32), w)
    return v.reshape(widths.shape[:-1] + (w,)).astype(np.uint32)


def bp64_decode_jnp(payload: jnp.ndarray, widths: jnp.ndarray,
                    anchors: jnp.ndarray, w: int) -> jnp.ndarray:
    """Device decode of one frame's fields: payload (P,) u32, widths
    (..., nb) u8, anchors (..., nb) u32 -> (..., w) u32. Static shapes;
    the only data-dependent addressing is two u32 gathers per pixel
    (out-of-range gathers clamp, and their values are masked to 0)."""
    v = _decode_core(jnp, payload, widths.reshape(-1),
                     anchors.reshape(-1).astype(jnp.uint32), w)
    return v.reshape(widths.shape[:-1] + (w,))


@functools.partial(jax.jit,
                   static_argnames=("plan", "nbits", "upshifts",
                                    "precision", "dual"))
def project_bp64_batched(payload: jnp.ndarray, widths: jnp.ndarray,
                         anchors: jnp.ndarray, col_hdrs: jnp.ndarray,
                         lut_stack, plan: DecodePlan, nbits: int,
                         upshifts: Tuple[int, ...] = (0,),
                         precision: str = "dd", dual: bool = False,
                         poses: Optional[jnp.ndarray] = None):
    """BP64 stream(s) -> XYZ, numerically identical to the planar/packed
    paths (same _proj_lean math; tests assert bit-equality). payload is
    (B, P) u32 (each frame's fields concatenated in (F, h, nb) C order,
    padded to a common P); widths (B, n_fields, h, nb) u8; anchors
    (B, n_fields, h, nb) u32; col_hdrs (B, chw, w) u32 supplies the
    status mask like the other stagings."""
    from .pallas_kernels import (project_ranges_batched,
                                 status_valid_mask_batched)

    if len(upshifts) < (2 if dual else 1):
        raise ValueError(
            "upshifts needs one entry per bp64 field "
            f"({2 if dual else 1}); use packed_range_fields(plan, dual)")
    if payload.ndim == 1:
        payload = payload[None]
        widths = widths[None]
        anchors = anchors[None]
        col_hdrs = col_hdrs[None]
    B, F = widths.shape[0], widths.shape[1]

    vm = status_valid_mask_batched(col_hdrs, plan)        # (B, 1, w)

    # word offsets restart at each frame's payload row -> vmap over B
    vals = jax.vmap(
        lambda pay, wd, an: bp64_decode_jnp(pay, wd, an, plan.w))(
            payload, widths, anchors)                     # (B, F, h, w)

    def field(k):
        r = vals[:, k]
        if upshifts[k]:
            r = r << np.uint32(upshifts[k])
        return r & vm

    return project_ranges_batched(field, lut_stack, precision, dual,
                                  poses)
