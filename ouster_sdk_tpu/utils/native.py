"""ctypes bindings to the native host library (native/ouster_native.cpp).

Builds the shared library on first use (g++ -O3) into a per-user cache
directory keyed by a hash of the source, so a stale or foreign binary can
never be loaded (the blob is machine-specific: -march=native). Every caller
gracefully falls back to the pure-Python path when the toolchain is
unavailable, so the package stays importable anywhere.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native",
    "ouster_native.cpp")


def _cache_dir() -> str:
    return os.environ.get("OUSTER_NATIVE_CACHE") or os.path.join(
        os.environ.get("XDG_CACHE_HOME")
        or os.path.join(os.path.expanduser("~"), ".cache"),
        "ouster_sdk_tpu")


def _machine_tag() -> str:
    """CPU identity folded into the cache key: -march=native binaries
    are machine-specific, and a shared cache dir (NFS home) must never
    serve a foreign binary (SIGILL)."""
    import platform

    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(line.split(":", 1)[1].strip())
                    break
    except OSError:
        pass
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:8]


def _build() -> Optional[str]:
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
    except OSError:
        return None
    so = os.path.join(_cache_dir(),
                      f"libouster_native-{digest}-{_machine_tag()}.so")
    if os.path.exists(so):
        return so
    try:
        os.makedirs(os.path.dirname(so), exist_ok=True)
        tmp = so + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
             "-fPIC", _SRC, "-o", tmp],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)  # atomic vs concurrent builders
        return so
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, or None when unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        so = _build()
        if so is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(so)
        c = ctypes
        lib.onat_crc64.restype = c.c_uint64
        lib.onat_crc64.argtypes = [c.c_void_p, c.c_uint64]
        lib.onat_crc64_check_batch.restype = c.c_int64
        lib.onat_crc64_check_batch.argtypes = [
            c.c_void_p, c.c_int64, c.c_int64, c.c_void_p]
        lib.onat_png_unfilter.restype = c.c_int
        lib.onat_png_unfilter.argtypes = [
            c.c_void_p, c.c_void_p, c.c_int64, c.c_int64, c.c_int64]
        lib.onat_pcap_scan.restype = c.c_int64
        lib.onat_pcap_scan.argtypes = [
            c.c_void_p, c.c_int64, c.c_int, c.c_int, c.c_int,
            c.c_void_p, c.c_int64, c.c_void_p, c.c_void_p, c.c_void_p,
            c.c_void_p, c.c_void_p, c.c_int64]
        lib.onat_stage_frame.restype = c.c_int64
        lib.onat_stage_frame.argtypes = [
            c.c_void_p, c.c_void_p, c.c_void_p, c.c_int64, c.c_int64,
            c.c_int64, c.c_int64, c.c_void_p, c.c_int64]
        lib.onat_udp_recv_batch.restype = c.c_int64
        lib.onat_udp_recv_batch.argtypes = [
            c.c_int, c.c_void_p, c.c_int64, c.c_int64, c.c_void_p,
            c.c_void_p]
        lib.onat_group_frames.restype = c.c_int64
        lib.onat_group_frames.argtypes = [
            c.c_void_p, c.c_void_p, c.c_void_p, c.c_int64, c.c_int64,
            c.c_int64, c.c_int, c.c_uint64, c.c_int64, c.c_int64,
            c.c_int64, c.c_void_p, c.c_void_p, c.c_void_p, c.c_int64,
            c.c_void_p, c.c_void_p]
        lib.onat_group_frames_planar.restype = c.c_int64
        lib.onat_group_frames_planar.argtypes = [
            c.c_void_p, c.c_void_p, c.c_void_p, c.c_int64, c.c_int64,
            c.c_int64, c.c_int, c.c_uint64, c.c_int64, c.c_int64,
            c.c_int64, c.c_int64, c.c_int64, c.c_int64, c.c_int64,
            c.c_int64, c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p,
            c.c_int64, c.c_void_p, c.c_void_p, c.c_int64,
            c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p, c.c_int64]
        lib.onat_group_frames_packed.restype = c.c_int64
        lib.onat_group_frames_packed.argtypes = [
            c.c_void_p, c.c_void_p, c.c_void_p, c.c_int64, c.c_int64,
            c.c_int64, c.c_int, c.c_uint64, c.c_int64, c.c_int64,
            c.c_int64, c.c_int64, c.c_int64, c.c_int64, c.c_int64,
            c.c_int64, c.c_void_p, c.c_void_p, c.c_int64, c.c_int64,
            c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p, c.c_int64,
            c.c_void_p, c.c_void_p]
        lib.onat_bp64_encode.restype = c.c_int64
        lib.onat_bp64_encode.argtypes = [
            c.c_void_p, c.c_int64, c.c_int64, c.c_int64, c.c_void_p,
            c.c_int64, c.c_void_p, c.c_int64, c.c_void_p, c.c_void_p]
        _lib = lib
        return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def crc64(data: bytes) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    return int(lib.onat_crc64(_ptr(buf), buf.size))


def png_unfilter(rows: np.ndarray, h: int, stride: int,
                 bpp: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.uint8)
    out = np.empty((h, stride), dtype=np.uint8)
    rc = lib.onat_png_unfilter(_ptr(out), _ptr(rows), h, stride, bpp)
    if rc != 0:
        raise ValueError("bad PNG filter byte")
    return out


def pcap_scan(data, swap_endian: bool, ts_nano: bool,
              linktype: int, workspace: Optional[dict] = None):
    """Returns (payloads u8, offsets i64, sizes i64, ts u64,
    src_dst_ports u32, dst_ips u32) or None when native is unavailable.

    `workspace` (optional dict, owned by the caller) reuses the large
    output buffers across calls — big allocations are mmap'd fresh by the
    allocator every time, and first-touch page faults dominate on
    virtualized hosts. The returned arrays are views into the workspace
    and remain valid only until the next call with the same workspace.
    """
    lib = get_lib()
    if lib is None:
        return None
    buf = data if isinstance(data, np.ndarray) else \
        np.frombuffer(data, dtype=np.uint8)
    cap = buf.size
    # every datagram consumes >= 44 file bytes (16 B record header + IP/UDP
    # headers), so cap//32 slots can never be exceeded; payloads are a strict
    # subset of the file bytes so `cap` bounds the payload buffer
    max_out = cap // 32 + 64

    def _ws(name, n, dtype):
        if workspace is None:
            return np.empty(n, dtype=dtype)
        a = workspace.get(name)
        if a is None or a.size < n:
            a = workspace[name] = np.empty(n, dtype=dtype)
        return a[:n]

    payloads = _ws("payloads", cap, np.uint8)
    offsets = _ws("offsets", max_out, np.int64)
    sizes = _ws("sizes", max_out, np.int64)
    ts = _ws("ts", max_out, np.uint64)
    ports = _ws("ports", max_out, np.uint32)
    dst_ips = _ws("dst_ips", max_out, np.uint32)
    n = lib.onat_pcap_scan(
        _ptr(buf), buf.size, int(swap_endian), int(ts_nano), linktype,
        _ptr(payloads), payloads.size, _ptr(offsets), _ptr(sizes),
        _ptr(ts), _ptr(ports), _ptr(dst_ips), max_out)
    if n == -1:
        return None
    if n < -1:  # early-stop sentinel: -(count + 2) datagrams were emitted
        import warnings

        n = -n - 2
        warnings.warn(
            f"native pcap scan stopped early after {n} datagrams "
            "(output capacity reached); tail of the capture was dropped",
            RuntimeWarning, stacklevel=2)
    return (payloads, offsets[:n], sizes[:n], ts[:n], ports[:n],
            dst_ips[:n])


def stage_frame(payloads: np.ndarray, offsets: np.ndarray,
                sizes: np.ndarray, pkt_bytes: int, mid_off: int,
                cols_per_packet: int, n_slots: int
                ) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    frame = np.zeros((n_slots, pkt_bytes), dtype=np.uint8)
    lib.onat_stage_frame(
        _ptr(payloads), _ptr(np.ascontiguousarray(offsets, np.int64)),
        _ptr(np.ascontiguousarray(sizes, np.int64)), len(offsets),
        pkt_bytes, mid_off, cols_per_packet, _ptr(frame), n_slots)
    return frame


def group_frames(payloads: np.ndarray, offsets: np.ndarray,
                 ts: Optional[np.ndarray], pkt_bytes: int, fid_byte: int,
                 fid_shift: int, fid_mask: int, mid_byte: int,
                 cols_per_packet: int, n_slots: int, out_frames: np.ndarray,
                 out_fids: np.ndarray, out_ts: np.ndarray,
                 io_released: Optional[np.ndarray] = None
                 ) -> Optional[Tuple[int, int]]:
    """Group consecutive same-frame-id packets into zeroed frame slabs
    (one native pass). Returns (packets_consumed, n_frames) or None when
    the native library is unavailable. out_frames must be a C-contiguous
    (max_frames, n_slots, pkt_bytes//4) uint32 buffer (reused across
    calls). io_released (1,) i64 carries the released-frame id across
    resumed calls so boundary drop rules survive chunk breaks."""
    lib = get_lib()
    if lib is None:
        return None
    offsets = np.ascontiguousarray(offsets, np.int64)
    nframes = np.zeros(1, dtype=np.int64)
    consumed = lib.onat_group_frames(
        _ptr(payloads), _ptr(offsets),
        _ptr(np.ascontiguousarray(ts, np.uint64)) if ts is not None
        else None,
        offsets.size, pkt_bytes, fid_byte, fid_shift, fid_mask, mid_byte,
        cols_per_packet, n_slots, _ptr(out_frames), _ptr(out_fids),
        _ptr(out_ts), out_frames.shape[0], _ptr(nframes),
        _ptr(io_released) if io_released is not None else None)
    return int(consumed), int(nframes[0])


def group_frames_planar(payloads: np.ndarray, offsets: np.ndarray,
                        ts: Optional[np.ndarray], pkt_bytes: int,
                        fid_byte: int, fid_shift: int, fid_mask: int,
                        hw_bytes: int, cw_bytes: int, chw_bytes: int,
                        mid_byte_in_col: int, cpp: int, h: int, pw: int,
                        w: int, out_planes: np.ndarray,
                        out_colhdr: np.ndarray, out_fids: np.ndarray,
                        out_ts: np.ndarray,
                        word_sel: Optional[np.ndarray] = None,
                        out_pkt_ts: Optional[np.ndarray] = None,
                        out_pkt_hdrs: Optional[np.ndarray] = None,
                        out_first_hdr: Optional[np.ndarray] = None,
                        io_released: Optional[np.ndarray] = None,
                        ftr_words: int = 0
                        ) -> Optional[Tuple[int, int]]:
    """Word-planar grouping: out_planes (max_frames, pw, h, w) u32 and
    out_colhdr (max_frames, chw + ftr_words, w) u32, both reused across
    calls. `word_sel` (i64 array of packet-word indices) stages only
    those planes, compacted — out_planes then has len(word_sel) planes.
    `ftr_words` also stages the last N u32 of each column block (the
    LEGACY status footer) into colhdr rows [chw, chw+N).
    Optional scan-header outputs (see native docs): out_pkt_ts
    (max_frames, n_pkts) u64, out_pkt_hdrs (max_frames, n_pkts, hw) u32,
    out_first_hdr (max_frames, hw) u32, io_released (1,) i64 carrying the
    batcher released-frame id across resumed calls.
    Returns (packets_consumed, n_frames) or None without the native lib."""
    lib = get_lib()
    if lib is None:
        return None
    offsets = np.ascontiguousarray(offsets, np.int64)
    nframes = np.zeros(1, dtype=np.int64)
    if word_sel is not None:
        word_sel = np.ascontiguousarray(word_sel, np.int64)
    consumed = lib.onat_group_frames_planar(
        _ptr(payloads), _ptr(offsets),
        _ptr(np.ascontiguousarray(ts, np.uint64)) if ts is not None
        else None,
        offsets.size, pkt_bytes, fid_byte, fid_shift, fid_mask,
        hw_bytes, cw_bytes, chw_bytes, mid_byte_in_col, cpp, h, pw, w,
        _ptr(out_planes), _ptr(out_colhdr), _ptr(out_fids), _ptr(out_ts),
        out_planes.shape[0], _ptr(nframes),
        _ptr(word_sel) if word_sel is not None else None,
        word_sel.size if word_sel is not None else 0,
        _ptr(out_pkt_ts) if out_pkt_ts is not None else None,
        _ptr(out_pkt_hdrs) if out_pkt_hdrs is not None else None,
        _ptr(out_first_hdr) if out_first_hdr is not None else None,
        _ptr(io_released) if io_released is not None else None,
        ftr_words)
    return int(consumed), int(nframes[0])


def group_frames_packed(payloads: np.ndarray, offsets: np.ndarray,
                        ts: Optional[np.ndarray], pkt_bytes: int,
                        fid_byte: int, fid_shift: int, fid_mask: int,
                        hw_bytes: int, cw_bytes: int, chw_bytes: int,
                        mid_byte_in_col: int, cpp: int, h: int, pw: int,
                        w: int, field_words: np.ndarray,
                        field_bits: np.ndarray, nbits: int,
                        out_planes: np.ndarray, out_colhdr: np.ndarray,
                        out_fids: np.ndarray, out_ts: np.ndarray,
                        io_released: Optional[np.ndarray] = None
                        ) -> Optional[Tuple[int, int]]:
    """Bit-packed grouping (see native onat_group_frames_packed):
    out_planes (max_frames, n_fields, h, w*nbits//32) u32 dense LSB-first
    bitstreams of each selected field's nbits bits per pixel. Caller must
    pre-verify packet alignment (mid0 % cpp == 0 for every packet).
    Returns (packets_consumed, n_frames) or None without the native lib."""
    lib = get_lib()
    if lib is None:
        return None
    offsets = np.ascontiguousarray(offsets, np.int64)
    field_words = np.ascontiguousarray(field_words, np.int64)
    field_bits = np.ascontiguousarray(field_bits, np.int64)
    nframes = np.zeros(1, dtype=np.int64)
    consumed = lib.onat_group_frames_packed(
        _ptr(payloads), _ptr(offsets),
        _ptr(np.ascontiguousarray(ts, np.uint64)) if ts is not None
        else None,
        offsets.size, pkt_bytes, fid_byte, fid_shift, fid_mask,
        hw_bytes, cw_bytes, chw_bytes, mid_byte_in_col, cpp, h, pw, w,
        _ptr(field_words), _ptr(field_bits), field_words.size, nbits,
        _ptr(out_planes), _ptr(out_colhdr), _ptr(out_fids), _ptr(out_ts),
        out_planes.shape[0], _ptr(nframes),
        _ptr(io_released) if io_released is not None else None)
    return int(consumed), int(nframes[0])


def udp_recv_batch(sock, stride: int, max_msgs: int = 256,
                   workspace: Optional[dict] = None):
    """Batched recvmmsg drain of a non-blocking UDP socket; returns
    (payload_buffer (max_msgs, stride) u8, sizes i64 (n,), ts_ns) or None
    when native is unavailable or nothing pending. Pass a persistent
    `workspace` dict to reuse the multi-MB receive buffers across calls
    (fresh allocations at this size are mmap'd and first-touch
    page-fault on every drain)."""
    lib = get_lib()
    if lib is None:
        return None
    if workspace is not None:
        buf = workspace.get("buf")
        if buf is None or buf.shape != (max_msgs, stride):
            buf = workspace["buf"] = np.empty((max_msgs, stride),
                                              dtype=np.uint8)
            workspace["sizes"] = np.empty(max_msgs, dtype=np.int64)
            workspace["ts"] = np.zeros(1, dtype=np.uint64)
        sizes = workspace["sizes"]
        ts = workspace["ts"]
    else:
        buf = np.empty((max_msgs, stride), dtype=np.uint8)
        sizes = np.empty(max_msgs, dtype=np.int64)
        ts = np.zeros(1, dtype=np.uint64)
    n = lib.onat_udp_recv_batch(sock.fileno(), _ptr(buf), stride, max_msgs,
                                _ptr(sizes), _ptr(ts))
    if n <= 0:
        return None
    return buf[:n], sizes[:n], int(ts[0])


def bp64_encode(planes: np.ndarray, field_bits: np.ndarray, nbits: int,
                payload: np.ndarray, widths: np.ndarray,
                anchors: np.ndarray) -> int:
    """BP64-encode one frame's selected word planes (F, h, W) u32 into
    `payload` (u32, capacity = len(payload)); widths u8 / anchors u32
    are (F*h*(W//64),) flat. Returns payload words written, or -1 when
    the capacity is insufficient (caller grows and retries). Format:
    ops/bp64.py."""
    lib = get_lib()
    if lib is None:
        return -2
    F, h, W = planes.shape
    fb = np.ascontiguousarray(field_bits, np.int64)
    return int(lib.onat_bp64_encode(
        _ptr(planes), F, h, W, _ptr(fb), nbits,
        _ptr(payload), payload.size, _ptr(widths), _ptr(anchors)))
