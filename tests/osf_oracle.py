"""Independent OSF reader used ONLY to prove write-compatibility.

Reads OSF files with two implementations that share no code with
ouster_sdk_tpu:
  - container / flatbuffers layer: the pip `flatbuffers` runtime
    (Google's canonical Python implementation), traversing tables
    manually against the reference schemas
    (ref: /root/reference/ouster_osf/fb/*.fbs) — a vtable/alignment bug
    in our hand-rolled utils/flatbuf.py writer fails here even though
    our own reader round-trips;
  - ChannelData PNG layer: the system libpng via a ctypes C wrapper
    (full read API, no transforms except 16-bit byte-swap) — a filter/
    zlib/IHDR bug in our numpy PNG encoder fails here the same way it
    would fail the real SDK (ref: png_tools.cpp:589-689);
  - ChannelData zPNG layer: the reference's vendored zpng.cpp compiled
    UNMODIFIED against the system libzstd (ref:
    thirdparty/zpng/zpng.cpp, zpng_lidarscan_encoder.cpp) — the same
    decoder the real SDK runs.
"""

import ctypes
import hashlib
import os
import struct
import subprocess
import tempfile
import zlib

import numpy as np

try:
    import flatbuffers
    from flatbuffers import number_types as N
    HAVE_FB = True
except ImportError:  # pragma: no cover
    HAVE_FB = False

# ---------------------------------------------------------------------------
# libpng ctypes oracle
# ---------------------------------------------------------------------------

_PNG_WRAP = r"""
#include <png.h>
#include <string.h>

typedef struct { const unsigned char* p; size_t n, off; } mem_t;

static void read_cb(png_structp png, png_bytep out, png_size_t count) {
    mem_t* m = (mem_t*)png_get_io_ptr(png);
    if (m->off + count > m->n) png_error(png, "eof");
    memcpy(out, m->p + m->off, count);
    m->off += count;
}

extern "C" int oracle_png_decode(const unsigned char* buf, long len,
                                 long* w, long* h, long* channels,
                                 long* depth, unsigned char* out,
                                 long out_cap) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             NULL, NULL, NULL);
    if (!png) return 1;
    png_infop info = png_create_info_struct(png);
    if (!info) { png_destroy_read_struct(&png, NULL, NULL); return 2; }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, NULL);
        return 3;
    }
    mem_t m = {buf, (size_t)len, 0};
    png_set_read_fn(png, &m, read_cb);
    png_read_info(png, info);
    *w = png_get_image_width(png, info);
    *h = png_get_image_height(png, info);
    *channels = png_get_channels(png, info);
    *depth = png_get_bit_depth(png, info);
    if (*depth == 16) png_set_swap(png);  /* PNG is BE; emit host LE */
    png_read_update_info(png, info);
    size_t rowbytes = png_get_rowbytes(png, info);
    if ((long)(rowbytes * (size_t)(*h)) > out_cap) {
        png_destroy_read_struct(&png, &info, NULL);
        return 4;
    }
    for (long y = 0; y < *h; y++)
        png_read_row(png, out + (size_t)y * rowbytes, NULL);
    png_read_end(png, NULL);
    png_destroy_read_struct(&png, &info, NULL);
    return 0;
}
"""

_png_lib = None
_png_failed = False


def png_oracle():
    """Compile (once) and return the libpng wrapper, or None."""
    global _png_lib, _png_failed
    if _png_lib is not None or _png_failed:
        return _png_lib
    try:
        cache = os.path.join(tempfile.gettempdir(), "ouster_test_oracles")
        os.makedirs(cache, exist_ok=True)
        tag = hashlib.sha256(_PNG_WRAP.encode()).hexdigest()[:12]
        so = os.path.join(cache, f"libpng_oracle_{tag}.so")
        if not os.path.exists(so):
            src = os.path.join(cache, f"png_oracle_{tag}.cpp")
            with open(src, "w") as f:
                f.write(_PNG_WRAP)
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", src, "-o",
                 so + ".tmp", "-lpng"],
                check=True, capture_output=True, timeout=120)
            os.replace(so + ".tmp", so)
        lib = ctypes.CDLL(so)
        lib.oracle_png_decode.restype = ctypes.c_int
        lib.oracle_png_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_long]
        _png_lib = lib
    except Exception:
        _png_failed = True
    return _png_lib


def png_decode(buf: bytes) -> np.ndarray:
    """Decode a PNG via libpng -> (h, w) or (h, w, ch) native-LE array."""
    lib = png_oracle()
    assert lib is not None, "libpng oracle unavailable"
    data = np.frombuffer(buf, np.uint8)
    w = ctypes.c_long()
    h = ctypes.c_long()
    ch = ctypes.c_long()
    depth = ctypes.c_long()
    # IHDR gives dims up front (independent header parse)
    assert buf[:8] == b"\x89PNG\r\n\x1a\n", "bad PNG signature"
    iw, ih = struct.unpack(">II", buf[16:24])
    bitdepth, color = buf[24], buf[25]
    nch = {0: 1, 2: 3, 6: 4}[color]
    out = np.zeros(ih * iw * nch * (bitdepth // 8), np.uint8)
    rc = lib.oracle_png_decode(
        data.ctypes.data_as(ctypes.c_void_p), data.size,
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(ch),
        ctypes.byref(depth), out.ctypes.data_as(ctypes.c_void_p),
        out.size)
    assert rc == 0, f"libpng decode failed rc={rc}"
    assert (w.value, h.value, ch.value, depth.value) == \
        (iw, ih, nch, bitdepth)
    dt = np.uint8 if bitdepth == 8 else np.dtype("<u2")
    arr = out.view(dt).reshape(
        (ih, iw) if nch == 1 else (ih, iw, nch))
    return arr


# ---------------------------------------------------------------------------
# reference zpng.cpp ctypes oracle
# ---------------------------------------------------------------------------

_ZPNG_WRAP = r"""
#include "zpng.h"
#include <string.h>

extern "C" int oracle_zpng_decode(const unsigned char* buf, long len,
                                  long* w, long* h, long* channels,
                                  long* bpc, unsigned char* out,
                                  long out_cap) {
    ZPNG_Buffer in;
    in.Data = const_cast<unsigned char*>(buf);
    in.Bytes = (unsigned)len;
    ZPNG_ImageData img = ZPNG_Decompress(in);
    if (!img.Buffer.Data) return 1;
    *w = img.WidthPixels;
    *h = img.HeightPixels;
    *channels = img.Channels;
    *bpc = img.BytesPerChannel;
    int rc = 0;
    if ((long)img.Buffer.Bytes > out_cap) rc = 2;
    else memcpy(out, img.Buffer.Data, img.Buffer.Bytes);
    ZPNG_Free(&img.Buffer);
    return rc;
}
"""

_ZPNG_SRC = "/root/reference/thirdparty/zpng/zpng.cpp"
_ZPNG_INC = "/root/reference/thirdparty/zpng/include"

_zpng_lib = None
_zpng_failed = False


def zpng_oracle():
    """Compile (once) the reference's vendored zpng.cpp + wrapper."""
    global _zpng_lib, _zpng_failed
    if _zpng_lib is not None or _zpng_failed:
        return _zpng_lib
    try:
        with open(_ZPNG_SRC, "rb") as f:
            src_bytes = f.read()
        cache = os.path.join(tempfile.gettempdir(), "ouster_test_oracles")
        os.makedirs(cache, exist_ok=True)
        tag = hashlib.sha256(_ZPNG_WRAP.encode()
                             + src_bytes).hexdigest()[:12]
        so = os.path.join(cache, f"libzpng_oracle_{tag}.so")
        if not os.path.exists(so):
            wrap = os.path.join(cache, f"zpng_oracle_{tag}.cpp")
            with open(wrap, "w") as f:
                f.write(_ZPNG_WRAP)
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", wrap, _ZPNG_SRC,
                 "-I", _ZPNG_INC, "-o", so + ".tmp", "-lzstd"],
                check=True, capture_output=True, timeout=180)
            os.replace(so + ".tmp", so)
        lib = ctypes.CDLL(so)
        lib.oracle_zpng_decode.restype = ctypes.c_int
        lib.oracle_zpng_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_long]
        _zpng_lib = lib
    except Exception:
        _zpng_failed = True
    return _zpng_lib


def zpng_decode(buf: bytes, dtype, w: int, h: int) -> np.ndarray:
    """Decode a zPNG ChannelData via the reference's compiled zpng.cpp
    -> (h, w) field array (dtype mapping per
    zpng_lidarscan_encoder.cpp:56-75: 1/2-byte -> 1 channel,
    4-byte -> 4x1, 8-byte -> 4x2)."""
    lib = zpng_oracle()
    assert lib is not None, "zpng oracle unavailable"
    dt = np.dtype(dtype)
    data = np.frombuffer(buf, np.uint8)
    ow = ctypes.c_long()
    oh = ctypes.c_long()
    ch = ctypes.c_long()
    bpc = ctypes.c_long()
    out = np.zeros(h * w * dt.itemsize, np.uint8)
    rc = lib.oracle_zpng_decode(
        data.ctypes.data_as(ctypes.c_void_p), data.size,
        ctypes.byref(ow), ctypes.byref(oh), ctypes.byref(ch),
        ctypes.byref(bpc), out.ctypes.data_as(ctypes.c_void_p), out.size)
    assert rc == 0, f"reference zpng decode failed rc={rc}"
    exp_ch, exp_bpc = {1: (1, 1), 2: (1, 2), 4: (4, 1),
                       8: (4, 2)}[dt.itemsize]
    assert (oh.value, ch.value, bpc.value) == (h, exp_ch, exp_bpc), \
        (oh.value, ow.value, ch.value, bpc.value)
    assert ow.value * exp_ch * exp_bpc == w * dt.itemsize
    return out.view(dt).reshape(h, w)


# ---------------------------------------------------------------------------
# pip-flatbuffers manual traversal of the reference schemas
# ---------------------------------------------------------------------------

class Tab:
    """Slot-indexed accessors over flatbuffers.table.Table (slot k lives
    at vtable offset 4 + 2k, per the flatbuffers wire format)."""

    _SCALARS = {
        "u8": (N.Uint8Flags, 1), "u16": (N.Uint16Flags, 2),
        "u32": (N.Uint32Flags, 4), "u64": (N.Uint64Flags, 8),
        "i32": (N.Int32Flags, 4), "i64": (N.Int64Flags, 8),
        "f64": (N.Float64Flags, 8),
    }

    def __init__(self, buf, pos):
        self.t = flatbuffers.table.Table(buf, pos)

    def _off(self, slot):
        return self.t.Offset(4 + 2 * slot)

    def scalar(self, slot, kind, default=0):
        o = self._off(slot)
        if not o:
            return default
        flags, _ = self._SCALARS[kind]
        return self.t.Get(flags, o + self.t.Pos)

    def string(self, slot):
        o = self._off(slot)
        return self.t.String(o + self.t.Pos).decode() if o else None

    def vector_np(self, slot, dtype):
        """Scalar vector -> numpy array (empty when absent)."""
        o = self._off(slot)
        if not o:
            return np.zeros(0, dtype)
        n = self.t.VectorLen(o)
        a = self.t.Vector(o)
        dt = np.dtype(dtype)
        # alignment check: scalar vectors must be aligned to element size
        assert a % dt.itemsize == 0, \
            f"misaligned vector (pos {a}, elem {dt.itemsize})"
        return np.frombuffer(self.t.Bytes, dt, count=n, offset=a).copy()

    def vector_len(self, slot):
        o = self._off(slot)
        return self.t.VectorLen(o) if o else 0

    def vector_table(self, slot, j):
        o = self._off(slot)
        pos = self.t.Vector(o) + j * 4
        return Tab(self.t.Bytes, self.t.Indirect(pos))

    def vector_struct_bytes(self, slot, struct_size):
        o = self._off(slot)
        if not o:
            return b""
        n = self.t.VectorLen(o)
        a = self.t.Vector(o)
        return bytes(self.t.Bytes[a: a + n * struct_size])

    def table(self, slot):
        o = self._off(slot)
        return Tab(self.t.Bytes, self.t.Indirect(o + self.t.Pos)) \
            if o else None


def _root(block: bytes, ident: bytes, framed: bool = True) -> Tab:
    """Size-prefixed root with file_identifier check. `framed` blocks
    carry a trailing u32 CRC (file-level framing); metadata-entry /
    message buffers are bare size-prefixed flatbuffers."""
    size = struct.unpack("<I", block[:4])[0]
    expect = len(block) - (8 if framed else 4)
    assert size == expect, f"size prefix {size} vs block {expect}"
    if ident is not None:
        assert block[8:12] == ident, \
            f"identifier {block[8:12]!r} != {ident!r}"
    # keep the size prefix in the buffer: flatbuffers builders compute
    # vector alignment including the 4 prefix bytes, so slicing it off
    # would make correctly-built buffers look misaligned
    buf = block[: 4 + size]
    pos = 4 + struct.unpack("<I", buf[4:8])[0]
    return Tab(bytearray(buf), pos)


def _block_at(data: bytes, off: int) -> bytes:
    """[u32 size][fb][u32 crc32] block; crc verified over size+fb
    (ref: basics.cpp:147-161)."""
    size = struct.unpack("<I", data[off:off + 4])[0]
    block = data[off: off + 4 + size + 4]
    stored = struct.unpack("<I", block[-4:])[0]
    assert stored == zlib.crc32(block[:-4]), "block CRC32 mismatch"
    return block


_DTYPES = {1: np.uint8, 2: np.uint16, 3: np.uint32, 4: np.uint64,
           5: np.int8, 6: np.int16, 7: np.int32, 8: np.int64,
           9: np.float32, 10: np.float64, 12: np.float16}

_CHAN_FIELDS = {1: "RANGE", 2: "RANGE2", 3: "SIGNAL", 4: "SIGNAL2",
                5: "REFLECTIVITY", 6: "REFLECTIVITY2", 7: "NEAR_IR",
                8: "FLAGS", 9: "FLAGS2", 40: "RAW_HEADERS"}
_CHAN_FIELDS.update({50 + k: f"CUSTOM{k}" for k in range(10)})
_CHAN_FIELDS.update({59 + k: f"RAW32_WORD{k}" for k in range(1, 5)})
_CHAN_FIELDS.update({44 + k: f"RAW32_WORD{k}" for k in range(5, 10)})


def _restagger(img: np.ndarray, shifts) -> np.ndarray:
    """Wire (destaggered) -> in-memory (staggered) row rotation, per the
    reference convention destaggered[u, j] = staggered[u, (j - shift[u])
    mod w] (ref: lidar_scan_impl.h:764-847). Independent re-derivation —
    shares no code with ouster_sdk_tpu.ops.destagger."""
    sh = np.asarray(shifts, np.int64)
    h, w = img.shape
    idx = (np.arange(w, dtype=np.int64)[None, :] + sh[:, None]) % w
    return np.take_along_axis(img, idx, axis=1)


def _decode_channel(png_bytes: bytes, dtype, w: int, h: int,
                    shifts=None) -> np.ndarray:
    """ChannelData PNG -> (h, w) field array, replicating the reference's
    png_tools channel packing (8-bit GRAY, 16-bit GRAY, 32-bit as RGBA8,
    64-bit as RGBA16) via libpng; zPNG streams (magic 0xFBF8) go through
    the reference's compiled zpng.cpp instead.

    Stagger convention, matching the reference decoder
    (png_tools.cpp:715-796 tries raw zPNG first, then PNG+px_offset):
    PNG channels are DESTAGGERED on the wire and restaggered here via
    `shifts`; zPNG channels are staggered on the wire already
    (zpng_lidarscan_encoder.cpp:24 ignores px_offset)."""
    if len(png_bytes) >= 2 and \
            struct.unpack("<H", png_bytes[:2])[0] == 0xFBF8:
        return zpng_decode(png_bytes, dtype, w, h)
    arr = png_decode(png_bytes)
    if shifts is not None:
        if arr.ndim == 3:
            h2, w2, nch = arr.shape
            arr = _restagger(
                np.ascontiguousarray(arr).reshape(h2, w2 * nch)
                .view(np.uint32 if arr.dtype.itemsize * nch == 4
                      else np.uint64),
                shifts).view(arr.dtype).reshape(h2, w2, nch)
        else:
            arr = _restagger(arr, shifts)
    dt = np.dtype(dtype)
    if dt.itemsize == 1:
        assert arr.ndim == 2 and arr.dtype == np.uint8
        return arr.view(dt)
    if dt.itemsize == 2:
        assert arr.ndim == 2 and arr.dtype.itemsize == 2
        return arr.view(dt)
    if dt.itemsize == 4:
        assert arr.ndim == 3 and arr.shape[2] == 4 and \
            arr.dtype == np.uint8
        return np.ascontiguousarray(arr).reshape(h, w * 4) \
            .view(np.uint32).view(dt).reshape(h, w)
    if dt.itemsize == 8:
        assert arr.ndim == 3 and arr.shape[2] == 4 and \
            arr.dtype.itemsize == 2
        return np.ascontiguousarray(arr).reshape(h, w * 4) \
            .view(np.uint64).view(dt).reshape(h, w)
    raise AssertionError(f"unsupported dtype {dt}")


def _decode_custom_field(data: bytes, tag: int, shape: tuple) -> np.ndarray:
    """Field table payload -> array, replicating the reference's
    decode_field (png_tools.cpp:715-796): 1-D shapes are raw bytes;
    multi-dim shapes are a uint view collapsed to
    (shape[0], size/shape[0]) and PNG/zPNG-encoded, no px_offset."""
    dt = np.dtype(_DTYPES[tag])
    if len(shape) <= 1:
        arr = np.frombuffer(data, dt)
        return arr.reshape(shape) if shape else arr
    rows = shape[0]
    cols = int(np.prod(shape[1:]))
    udt = {1: np.uint8, 2: np.uint16, 4: np.uint32,
           8: np.uint64}[dt.itemsize]
    img = _decode_channel(data, udt, cols, rows)
    return img.reshape(rows * cols).view(dt).reshape(shape)


def parse_lidar_scan_msg(buf: bytes, w: int, h: int,
                         shifts=None) -> dict:
    """LidarScanMsg table (ref: lidar_scan_stream.fbs) -> dict."""
    # LidarScanMsg buffers are written size-prefixed, with or without a
    # file identifier; accept both
    msg = _root(buf, b"oLSM" if buf[8:12] == b"oLSM" else None,
                framed=False)
    out = {}
    fts = np.frombuffer(msg.vector_struct_bytes(1, 2), np.uint8)
    fts = fts.reshape(-1, 2)
    n_ch = msg.vector_len(0)
    assert n_ch == fts.shape[0], "channels vs field_types length"
    fields = {}
    for j in range(n_ch):
        chan_tab = msg.vector_table(0, j)
        png_bytes = bytes(chan_tab.vector_np(0, np.uint8))
        name = _CHAN_FIELDS[int(fts[j, 0])]
        dtype = _DTYPES[int(fts[j, 1])]
        fields[name] = _decode_channel(png_bytes, dtype, w, h, shifts)
    out["fields"] = fields
    out["timestamp"] = msg.vector_np(2, np.uint64)
    out["measurement_id"] = msg.vector_np(3, np.uint16)
    out["status"] = msg.vector_np(4, np.uint32)
    out["frame_id"] = msg.scalar(5, "i32")
    pose = msg.vector_np(6, np.float64)
    if pose.size:
        # col-major 4x4 per column (ref: lidar_scan_stream.fbs pose)
        out["pose"] = pose.reshape(-1, 4, 4).transpose(0, 2, 1)
    out["packet_timestamp"] = msg.vector_np(7, np.uint64)
    custom = {}
    classes = {}
    for j in range(msg.vector_len(8)):
        f = msg.vector_table(8, j)
        name = f.string(0)
        tag = f.scalar(1, "u8")
        shape = tuple(int(x) for x in f.vector_np(2, np.uint64))
        classes[name] = f.scalar(3, "i64")  # FIELD_CLASS (common.fbs)
        data = f.vector_np(4, np.uint8)
        custom[name] = _decode_custom_field(bytes(data), tag, shape)
    out["custom_fields"] = custom
    out["custom_field_classes"] = classes
    out["frame_status"] = msg.scalar(9, "u64")
    out["shutdown_countdown"] = msg.scalar(10, "u8")
    out["shot_limiting_countdown"] = msg.scalar(11, "u8")
    out["alert_flags"] = msg.vector_np(12, np.uint8)
    return out


def read_osf(path: str) -> dict:
    """Fully-independent OSF read: header, metadata entries, every
    LidarScanStream message decoded. Asserts on any framing/CRC/schema
    violation."""
    assert HAVE_FB, "pip flatbuffers unavailable"
    with open(path, "rb") as f:
        data = f.read()

    hdr_block = _block_at(data, 0)
    hdr = _root(hdr_block, b"OSF$")
    out = {"version": hdr.scalar(0, "u64"),
           "status": hdr.scalar(1, "u8")}
    assert out["status"] == 2, "header not VALID"
    m_off = hdr.scalar(2, "u64", 1)
    file_len = hdr.scalar(3, "u64", 1)
    assert file_len == len(data), "file_length mismatch"

    m_block = _block_at(data, m_off)
    meta = _root(m_block, b"OSF#")
    out["id"] = meta.string(0)
    out["start_ts"] = meta.scalar(1, "u64")
    out["end_ts"] = meta.scalar(2, "u64")

    chunks_base = len(hdr_block)
    chunk_offsets = np.frombuffer(
        meta.vector_struct_bytes(3, 24), np.uint64).reshape(-1, 3)

    entries = {}
    prev_id = -1
    for j in range(meta.vector_len(4)):
        e = meta.vector_table(4, j)
        eid = e.scalar(0, "u32")
        assert eid > prev_id, "entries not sorted by id"
        prev_id = eid
        entries[eid] = {"type": e.string(1),
                        "buffer": bytes(e.vector_np(2, np.uint8))}
    out["entries"] = entries

    # sensor dims from LidarSensor metadata json
    dims = {}
    sensors = {}
    import json as _json

    for eid, e in entries.items():
        if e["type"].endswith("LidarSensor"):
            ls = _root(e["buffer"],
                       b"oLS_" if e["buffer"][8:12] == b"oLS_" else None,
                       framed=False)
            mjson = bytes(ls.vector_np(0, np.uint8)).decode()
            sensors[eid] = _json.loads(mjson)
    streams = {}
    collation_ids = set()
    for eid, e in entries.items():
        if e["type"].endswith("LidarScanStream"):
            st = _root(e["buffer"],
                       b"oLSS" if e["buffer"][8:12] == b"oLSS" else None,
                       framed=False)
            streams[eid] = st.scalar(0, "u32")  # sensor_id
        elif e["type"].endswith("CollationStream"):
            collation_ids.add(eid)
    out["sensors"] = sensors
    shifts_by_stream = {}
    for eid, sid in streams.items():
        fmt = sensors[sid].get("lidar_data_format") or \
            sensors[sid].get("data_format")
        dims[eid] = (fmt["columns_per_frame"], fmt["pixels_per_column"])
        shifts_by_stream[eid] = fmt["pixel_shift_by_row"]

    scans = []
    collations = []
    for start_ts, end_ts, off in chunk_offsets:
        block = _block_at(data, chunks_base + int(off))
        chunk = _root(block, b"OSF!")
        for j in range(chunk.vector_len(0)):
            m = chunk.vector_table(0, j)
            ts = m.scalar(0, "u64")
            sid = m.scalar(1, "u32")
            assert start_ts <= ts <= end_ts, "msg ts outside chunk range"
            body = bytes(m.vector_np(2, np.uint8))
            if sid in collation_ids:
                collations.append(parse_collation_msg(body))
                continue
            if sid not in dims:
                continue  # stream type this oracle doesn't model
            w, h = dims[sid]
            scan = parse_lidar_scan_msg(body, w, h,
                                        shifts_by_stream[sid])
            scan["ts"] = ts
            scan["stream_id"] = sid
            scans.append(scan)
    out["scans"] = scans
    out["collations"] = collations
    return out


def parse_collation_msg(buf: bytes) -> dict:
    """CollationMsg (ref: collation_stream.fbs) -> {scan_ids, fields}.
    ScanID is a 16-byte struct (u32 sensor_id @0, u64 scan_idx @8 after
    alignment padding)."""
    msg = _root(buf, None, framed=False)
    raw = msg.vector_struct_bytes(0, 16)
    ids = []
    for k in range(len(raw) // 16):
        sensor_id = struct.unpack_from("<I", raw, 16 * k)[0]
        scan_idx = struct.unpack_from("<Q", raw, 16 * k + 8)[0]
        ids.append((sensor_id, scan_idx))
    fields = {}
    for j in range(msg.vector_len(1)):
        f = msg.vector_table(1, j)
        tag = f.scalar(1, "u8")
        shape = tuple(int(x) for x in f.vector_np(2, np.uint64))
        data = f.vector_np(4, np.uint8)
        fields[f.string(0)] = _decode_custom_field(bytes(data), tag, shape)
    return {"scan_ids": ids, "fields": fields}


# ---------------------------------------------------------------------------
# Reference Reader STREAMING-ORDER oracle
# ---------------------------------------------------------------------------
# The full C++ `ouster_osf` Reader cannot be compiled in this image (no
# flatc / no flatbuffers C++ headers to generate against), so this
# re-implements its Streaming Layout traversal EXACTLY as reader.cpp does,
# against the same StreamingInfo/Chunk structures, using the pip
# flatbuffers-style Tab reader above:
#   - per-stream chunk cursors from the StreamingInfo ChunkInfo mapping,
#     in Metadata.chunks start_ts order
#     (ref: reader.cpp:551-614 MessagesStreamingIter ctor,
#     chunk.cpp:98-112 get_by_lower_bound_ts: first chunk whose
#     end_ts >= start_ts);
#   - every chunk CRC-verified before use (ref: reader.cpp verify_chunk);
#   - a min-heap on each cursor's CURRENT message ts
#     (ref: reader.cpp:534-537 greater_chunk_type — ties by ts only, so
#     equal-ts cross-stream order is heap-internal; compare with
#     assert_streaming_equivalent below);
#   - within-stream non-decreasing ts ENFORCED like the reference's
#     "Can't have decreasing by timestamp messages in StreamingLayout"
#     (ref: reader.cpp:698-720);
#   - range [start_ts, end_ts) exclusive; Reader::messages(a, b) maps to
#     [a, b+1) (ref: reader.cpp:755-758 MessagesStreamingRange::begin).


def streaming_order(path: str, start_ts=None, end_ts=None,
                    stream_ids=None):
    """(ts, stream_id) sequence in the reference Reader's Streaming
    Layout order over [start_ts, end_ts) (defaults: the whole file,
    end-inclusive like Reader::messages())."""
    import heapq

    assert HAVE_FB, "pip flatbuffers unavailable"
    with open(path, "rb") as f:
        data = f.read()
    hdr_block = _block_at(data, 0)
    hdr = _root(hdr_block, b"OSF$")
    m_off = hdr.scalar(2, "u64", 1)
    meta = _root(_block_at(data, m_off), b"OSF#")
    chunks_base = len(hdr_block)
    chunk_offsets = np.frombuffer(
        meta.vector_struct_bytes(3, 24), np.uint64).reshape(-1, 3)
    span = {int(off): (int(s), int(e)) for s, e, off in chunk_offsets}

    if start_ts is None:
        start_ts = int(meta.scalar(1, "u64"))
    if end_ts is None:
        end_ts = int(meta.scalar(2, "u64")) + 1  # messages() inclusive
    else:
        end_ts = int(end_ts) + 1

    # StreamingInfo: per-stream chunk offsets. The reference REQUIRES it
    # for streaming iteration (reader.cpp:684 throws without chunk info).
    stream_chunks = {}
    for j in range(meta.vector_len(4)):
        e = meta.vector_table(4, j)
        if e.string(1) != "ouster/v1/streaming/StreamingInfo":
            continue
        si = _root(e.vector_np(2, np.uint8).tobytes(), None, framed=False)
        for k in range(si.vector_len(0)):
            ci = si.vector_table(0, k)
            off, sid = ci.scalar(0, "u64"), ci.scalar(1, "u32")
            stream_chunks.setdefault(sid, []).append(int(off))
            # ChunkInfo.message_count must match the chunk's actual
            # message vector length
            chunk = _root(_block_at(data, chunks_base + int(off)), b"OSF!")
            assert ci.scalar(2, "u32") == chunk.vector_len(0), \
                "StreamingInfo message_count != chunk contents"
    assert stream_chunks, "no StreamingInfo entry (streaming needs one)"
    for sid in stream_chunks:
        stream_chunks[sid].sort(key=lambda o: span[o][0])

    if stream_ids is None:
        stream_ids = sorted(stream_chunks)

    def chunk_msgs(off):
        block = _block_at(data, chunks_base + off)  # CRC verify_chunk
        chunk = _root(block, b"OSF!")
        out = []
        for j in range(chunk.vector_len(0)):
            m = chunk.vector_table(0, j)
            out.append((m.scalar(0, "u64"), m.scalar(1, "u32")))
        return out

    # open the first valid cursor per stream (ctor semantics)
    heap = []
    seq = 0
    for sid in stream_ids:
        offs = stream_chunks.get(sid, [])
        # lower bound: first chunk whose end_ts >= start_ts
        ci = 0
        while ci < len(offs) and span[offs[ci]][1] < start_ts:
            ci += 1
        while ci < len(offs) and span[offs[ci]][0] < end_ts:
            msgs = chunk_msgs(offs[ci])
            found = False
            for mi, (ts, _) in enumerate(msgs):
                if start_ts <= ts < end_ts:
                    heap.append((ts, seq, sid, ci, mi, msgs))
                    seq += 1
                    found = True
                    break
            if found:
                break
            ci += 1
    heapq.heapify(heap)

    out = []
    curr_ts = start_ts
    while heap:
        ts, _, sid, ci, mi, msgs = heapq.heappop(heap)
        assert ts >= curr_ts, \
            "decreasing ts in StreamingLayout (reference Reader throws)"
        curr_ts = ts
        out.append((ts, sid))
        if mi + 1 < len(msgs):
            if msgs[mi + 1][0] < end_ts:
                heapq.heappush(heap, (msgs[mi + 1][0], seq, sid, ci,
                                      mi + 1, msgs))
                seq += 1
            continue
        offs = stream_chunks[sid]
        ci += 1
        if ci < len(offs) and span[offs[ci]][0] < end_ts:
            nmsgs = chunk_msgs(offs[ci])
            for nmi, (nts, _) in enumerate(nmsgs):
                assert nts >= curr_ts, \
                    "decreasing ts across stream chunks (Reader throws)"
                if nts < end_ts:
                    heapq.heappush(heap, (nts, seq, sid, ci, nmi, nmsgs))
                    seq += 1
                    break
    return out


def assert_streaming_equivalent(got, oracle):
    """Compare a reader's (ts, stream_id) order against the oracle's:
    identical non-decreasing ts sequence, and the same multiset of
    stream ids at every timestamp (the reference's heap breaks equal-ts
    ties by internal order, so cross-stream order WITHIN one timestamp
    is not part of the contract — reader.cpp:534-537 compares ts only)."""
    assert len(got) == len(oracle), (len(got), len(oracle))
    assert [t for t, _ in got] == [t for t, _ in oracle], "ts order"
    from collections import Counter

    by_ts_got, by_ts_oracle = {}, {}
    for t, s in got:
        by_ts_got.setdefault(t, Counter())[s] += 1
    for t, s in oracle:
        by_ts_oracle.setdefault(t, Counter())[s] += 1
    assert by_ts_got == by_ts_oracle, "per-ts stream multiset"
