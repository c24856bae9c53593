"""Device-side (XLA) frame decode: packets -> LidarScan field arrays.

The TPU-native replacement for the reference's per-pixel FieldInfo hot loop
(ref: ouster_client/src/parsing.cpp:653-702, lidar_scan.cpp:1282-1322).
Instead of batching packet-by-packet on the host, whole frames of packet
bytes are staged to HBM as uint32 words and decoded in one fused
shift/mask pass over a (pixels, columns) grid — every field sits at a fixed
(word, bit) position within its 4-byte-aligned pixel block, so decode is
pure vectorized VPU work with no gathers.

The decode plan is derived from the same tables as the numpy reference
decoder (ops/profiles.py), which is the conformance oracle.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import DataFormat, SensorInfo
from .profiles import lookup_profile_entry, lookup_scan_fields, \
    make_packet_geometry


@dataclass(frozen=True)
class FieldPlan:
    """Static decode recipe for one field (hashable; jit-static)."""

    name: str
    word: int        # word index within the pixel block
    bit: int         # bit offset within that word
    size: int        # field width in bits
    upshift: int
    out_dtype: str   # numpy dtype name of the scan field


@dataclass(frozen=True)
class DecodePlan:
    """Static decode recipe for a whole frame (hashable; jit-static).

    Geometry in uint32 words: a lidar packet is
    [pkt_header hw][cpp x ([col_header chw][npx x pw])][col_footer fw]][pkt_footer]
    """

    profile: str
    h: int
    w: int
    cpp: int                 # columns per packet
    n_pkts: int
    pkt_words: int
    hw: int                  # packet header words
    cw: int                  # column block words
    chw: int                 # column header words
    pw: int                  # pixel block words
    legacy: bool
    fields: Tuple[FieldPlan, ...]
    status_word: int         # within the full column block (packet layout)
    status_bit: int
    status_size: int
    mid_word: int
    mid_bit: int
    # planar staging layout: LEGACY keeps status in the column FOOTER, so
    # the native grouper stages it as extra col-header row(s) after the
    # chw real header words (schw = chw + footer words staged)
    schw: int = 0
    staged_status_word: int = 0


def make_decode_plan(info_or_format, field_names: Optional[Tuple[str, ...]]
                     = None, raw_fields: bool = False) -> DecodePlan:
    fmt: DataFormat = (info_or_format.format
                       if isinstance(info_or_format, SensorInfo)
                       else info_or_format)
    geom = make_packet_geometry(fmt)
    entry = lookup_profile_entry(fmt.udp_profile_lidar)
    scan_fields = dict(lookup_scan_fields(fmt.udp_profile_lidar))
    if raw_fields:
        # RAW32_WORDk side-channels: the raw u32 words of each pixel
        # block (ref: open_source.h raw_fields); they ride the planar
        # staging for free — each is exactly one staged plane
        for name, finfo in entry.fields.items():
            if name.startswith("RAW32_WORD") and name not in scan_fields:
                scan_fields[name] = np.dtype(np.uint32)

    plans = []
    for name, finfo in sorted(entry.fields.items()):
        if name not in scan_fields:
            continue
        if field_names is not None and name not in field_names \
                and not (raw_fields and name.startswith("RAW32_WORD")):
            # raw_fields adds RAW32 side-channels ON TOP of a field_names
            # subset (matching PcapScanSource._field_types)
            continue
        if finfo.num_elements > 1:
            # RGB-style multi-element: emit one plan per element
            per = finfo.bit_size // finfo.num_elements
            for e in range(finfo.num_elements):
                bit = finfo.bit_start + e * per
                plans.append(FieldPlan(
                    name=f"{name}#{e}", word=bit // 32, bit=bit % 32,
                    size=per, upshift=0,
                    out_dtype=scan_fields[name].name))
            continue
        plans.append(FieldPlan(
            name=name,
            word=finfo.bit_start // 32,
            bit=finfo.bit_start % 32,
            size=finfo.bit_size,
            upshift=finfo.upshift,
            out_dtype=scan_fields[name].name,
        ))

    if geom.legacy:
        # status is the last word of the column block (the col footer,
        # ref: parsing.cpp:516-530); planar staging ships it as one
        # extra col-header row after the 4 real header words
        status_word = geom.col_size // 4 - 1
        status_bit, status_size = 0, 32
        schw = geom.col_header_size // 4 + 1
        staged_status_word = geom.col_header_size // 4
    else:
        status_word, status_bit, status_size = 2, 16, 16
        schw = geom.col_header_size // 4
        staged_status_word = status_word

    return DecodePlan(
        profile=fmt.udp_profile_lidar.value
        if hasattr(fmt.udp_profile_lidar, "value") else str(
            fmt.udp_profile_lidar),
        h=fmt.pixels_per_column,
        w=fmt.columns_per_frame,
        cpp=fmt.columns_per_packet,
        n_pkts=fmt.columns_per_frame // fmt.columns_per_packet,
        pkt_words=geom.lidar_packet_size // 4,
        hw=geom.packet_header_size // 4,
        cw=geom.col_size // 4,
        chw=geom.col_header_size // 4,
        pw=geom.channel_data_size // 4,
        legacy=geom.legacy,
        fields=tuple(plans),
        status_word=status_word,
        status_bit=status_bit,
        status_size=status_size,
        mid_word=2, mid_bit=0,
        schw=schw,
        staged_status_word=staged_status_word,
    )


def _extract(words: jnp.ndarray, word: int, bit: int, size: int,
             upshift: int = 0) -> jnp.ndarray:
    """Vectorized bitfield extract; `words` has block words on last axis.
    Returns uint32."""
    lo = words[..., word]
    if bit:
        lo = lo >> np.uint32(bit)
    if bit + size > 32:
        hi = words[..., word + 1] << np.uint32(32 - bit)
        lo = lo | hi
    if size < 32:
        lo = lo & np.uint32((1 << size) - 1)
    if upshift:
        lo = lo << np.uint32(upshift)
    return lo


@functools.partial(jax.jit, static_argnames=("plan", "dense", "zero_invalid"))
def decode_frame(packet_words: jnp.ndarray, plan: DecodePlan,
                 dense: bool = True, zero_invalid: bool = True
                 ) -> Dict[str, jnp.ndarray]:
    """Decode a full frame of lidar packets on device.

    Args:
      packet_words: (n_pkts, pkt_words) uint32 — one frame of packet payloads
        staged little-endian. Missing packets must be zero-filled rows (their
        columns then decode with status=0 and are zeroed).
      plan: static decode plan.
      dense: assume column k of packet p has measurement_id p*cpp + k (the
        in-order complete-frame fast path, matching parse_by_block). When
        False, columns are scattered by their decoded measurement_id.
      zero_invalid: zero all channel fields of columns whose status bit 0 is
        unset (reference zero-fill semantics).

    Returns dict with one (h, w) array per channel field (native dtypes)
    plus 'status' (w,) u32, 'measurement_id' (w,) u16, 'timestamp_lo'/'_hi'
    (w,) u32 pairs (u64 timestamps as words; combine on host if needed).
    """
    n_pkts, _ = packet_words.shape
    cols = packet_words[:, plan.hw:plan.hw + plan.cpp * plan.cw]
    cols = cols.reshape(n_pkts * plan.cpp, plan.cw)  # (W, cw)

    status = _extract(cols, plan.status_word, plan.status_bit,
                      plan.status_size)
    m_id = _extract(cols, plan.mid_word, plan.mid_bit, 16)
    ts_lo = cols[:, 0]
    ts_hi = cols[:, 1]
    valid = (status & 1).astype(jnp.bool_)

    px = cols[:, plan.chw:plan.chw + plan.h * plan.pw]
    px = px.reshape(-1, plan.h, plan.pw)  # (W, h, pw)

    out: Dict[str, jnp.ndarray] = {}
    for f in plan.fields:
        v = _extract(px, f.word, f.bit, f.size, f.upshift)  # (W, h) u32
        if zero_invalid:
            v = jnp.where(valid[:, None], v, 0)
        dt = jnp.dtype(f.out_dtype)
        if dt == jnp.float16:
            v = v.astype(jnp.uint16).view(jnp.float16)
        else:
            v = v.astype(dt)
        out[f.name] = v.T  # (h, W)

    if not dense:
        # scatter columns to their true positions; duplicate/missing m_ids
        # follow last-writer-wins like the reference's indexed stores
        idx = m_id.astype(jnp.int32)
        idx = jnp.where(valid, idx, plan.w)  # invalid -> dropped bucket
        for k, v in out.items():
            buf = jnp.zeros((v.shape[0], plan.w + 1), v.dtype)
            out[k] = buf.at[:, idx].set(v, mode="drop")[:, :plan.w]
        sbuf = jnp.zeros((plan.w + 1,), status.dtype)
        status = sbuf.at[idx].set(status, mode="drop")[: plan.w]
        tbuf = jnp.zeros((plan.w + 1,), ts_lo.dtype)
        ts_lo = tbuf.at[idx].set(ts_lo, mode="drop")[: plan.w]
        ts_hi = tbuf.at[idx].set(ts_hi, mode="drop")[: plan.w]
        m_id = jnp.where(status & 1, jnp.arange(plan.w, dtype=jnp.uint32),
                         0).astype(jnp.uint32)
    else:
        ts_lo = jnp.where(valid, ts_lo, 0)
        ts_hi = jnp.where(valid, ts_hi, 0)
        m_id = jnp.where(valid, m_id, 0)
        if zero_invalid:
            # batcher parity: invalid columns' header cells stay 0
            # (ref: lidar_scan.cpp:1207-1255 per-col skip)
            status = jnp.where(valid, status, 0)

    out["status"] = status.astype(jnp.uint32)
    out["measurement_id"] = m_id.astype(jnp.uint16)
    out["timestamp_lo"] = ts_lo
    out["timestamp_hi"] = ts_hi
    return out


decode_frame_batch = jax.vmap(decode_frame, in_axes=(0, None, None, None))
"""Batched decode over (B, n_pkts, pkt_words) frames -> (B, ...) fields."""


@functools.partial(jax.jit, static_argnames=("plan", "zero_invalid"))
def decode_frame_planar(planes: jnp.ndarray, col_hdrs: jnp.ndarray,
                        plan: DecodePlan, zero_invalid: bool = True
                        ) -> Dict[str, jnp.ndarray]:
    """Decode every channel field from word-planar staging.

    planes (pw, h, w) u32 + col_hdrs (chw, w) u32 (from FrameReader
    iter_planar_chunks / native onat_group_frames_planar). Each field is a
    contiguous plane index + shift/mask — XLA fuses the whole decode with
    no strided selects or transposes, unlike the packet-layout
    decode_frame. Output dict matches decode_frame's dense path.
    col_hdrs has plan.schw rows: the chw real header words plus, for
    LEGACY, the staged column-footer status word.
    """
    status = _extract(col_hdrs.T, plan.staged_status_word, plan.status_bit,
                      plan.status_size)
    m_id = _extract(col_hdrs.T, plan.mid_word, plan.mid_bit, 16)
    ts_lo = col_hdrs[0]
    ts_hi = col_hdrs[1]
    valid = (status & 1).astype(jnp.bool_)

    out: Dict[str, jnp.ndarray] = {}
    for f in plan.fields:
        lo = planes[f.word]
        if f.bit:
            lo = lo >> np.uint32(f.bit)
        if f.bit + f.size > 32:
            lo = lo | (planes[f.word + 1] << np.uint32(32 - f.bit))
        if f.size < 32:
            lo = lo & np.uint32((1 << f.size) - 1)
        if f.upshift:
            lo = lo << np.uint32(f.upshift)
        if zero_invalid:
            lo = jnp.where(valid[None, :], lo, 0)
        dt = jnp.dtype(f.out_dtype)
        if dt == jnp.float16:
            lo = lo.astype(jnp.uint16).view(jnp.float16)
        else:
            lo = lo.astype(dt)
        out[f.name] = lo  # already (h, w)

    # batcher parity: a present-but-invalid column's header cells stay 0
    # (per-col parse skips them, ref: lidar_scan.cpp:1207-1255; the block
    # path requires every column valid, so zeroing invalids matches both)
    if zero_invalid:
        status = jnp.where(valid, status, 0)
    out["status"] = status.astype(jnp.uint32)
    out["measurement_id"] = jnp.where(valid, m_id, 0).astype(jnp.uint16)
    out["timestamp_lo"] = jnp.where(valid, ts_lo, 0)
    out["timestamp_hi"] = jnp.where(valid, ts_hi, 0)
    return out


decode_frame_planar_batch = jax.vmap(decode_frame_planar,
                                     in_axes=(0, 0, None, None))
"""Batched planar decode over (B, pw, h, w) + (B, chw, w)."""


def frame_words_from_packets(packets, plan: DecodePlan,
                             m_ids: Optional[np.ndarray] = None
                             ) -> np.ndarray:
    """Host-side staging: stack one frame's lidar packet payloads into the
    (n_pkts, pkt_words) uint32 array expected by decode_frame, placing each
    packet at its packet_id slot and zero-filling gaps."""
    out = np.zeros((plan.n_pkts, plan.pkt_words), dtype=np.uint32)
    for i, p in enumerate(packets):
        buf = p.buf if hasattr(p, "buf") else p
        words = np.frombuffer(
            buf.tobytes() if isinstance(buf, np.ndarray) else buf,
            dtype="<u4", count=plan.pkt_words)
        if m_ids is not None:
            slot = int(m_ids[i]) // plan.cpp
        else:
            # first column's m_id lives at word hw+2 (eUDP) / hw+2 (legacy)
            slot = int(words[plan.hw + plan.mid_word] & 0xFFFF) // plan.cpp
        if 0 <= slot < plan.n_pkts:
            out[slot] = words
    return out
