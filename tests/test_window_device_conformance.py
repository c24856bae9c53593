"""Azimuth-window + 4096x5 conformance on the DEVICE route (VERDICT r4
items 4 and 7b).

Synthesizes column_window-restricted captures — only packets overlapping
the window are sent, and boundary packets carry NONZERO GARBAGE in their
out-of-window columns with status=0 — then asserts the device decode
(pcap iterator AND live stager) is bit-equal to the numpy ScanBatcher
oracle, which implements the reference's zero-fill semantics
(ref: ouster_client/src/lidar_scan.cpp:1061 zero_header_cols, :1194
zero_fields; window geometry types.h:849-856). Covers eUDP single, eUDP
dual with a WRAPPED window, LEGACY geometry, and the 4096x5 mode
(types.h:97) full-frame and windowed.

Each case is also pinned to a stored digest golden
(tests/goldens/synth_window/*.json) so the decoded content itself is a
regression anchor, not just route-vs-route equality.
"""

import json
import os

import numpy as np
import pytest

from ouster_sdk_tpu import ChanField, LidarMode, PacketWriter, SensorInfo
from ouster_sdk_tpu.core.types import UDPProfileLidar

from test_device_scan_source import (  # noqa: E402  (test helpers)
    _assert_scans_equal,
    _numpy_scans,
    _run_live,
    _write_stream,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens",
                          "synth_window")

CASES = [
    # (case id, mode, profile, window or None)
    ("eudp_single_mid", "1024x10",
     UDPProfileLidar.RNG19_RFL8_SIG16_NIR16, (128, 831)),
    ("eudp_dual_wrapped", "1024x10",
     UDPProfileLidar.RNG19_RFL8_SIG16_NIR16_DUAL, (896, 255)),
    ("legacy_mid", "512x10", UDPProfileLidar.LEGACY, (64, 383)),
    ("mode_4096x5_full", "4096x5",
     UDPProfileLidar.RNG19_RFL8_SIG16_NIR16, None),
    ("mode_4096x5_windowed", "4096x5",
     UDPProfileLidar.RNG19_RFL8_SIG16_NIR16, (1024, 3071)),
]


def _in_window(m: int, w0: int, w1: int) -> bool:
    return (w0 <= m <= w1) if w0 <= w1 else (m >= w0 or m <= w1)


def _build(mode: str, profile, window):
    info = SensorInfo.from_default(LidarMode.from_string(mode))
    info.format.udp_profile_lidar = profile
    if window is not None:
        info.format.column_window = window
    pw = PacketWriter(info.format)
    w = info.format.columns_per_frame
    cpp = info.format.columns_per_packet
    w0, w1 = info.format.column_window
    fields = [ChanField.RANGE, ChanField.REFLECTIVITY, ChanField.SIGNAL,
              ChanField.NEAR_IR]
    if profile == UDPProfileLidar.RNG19_RFL8_SIG16_NIR16_DUAL:
        fields += [ChanField.RANGE2, ChanField.REFLECTIVITY2,
                   ChanField.SIGNAL2]
    stream = []
    t = [0]
    rng = np.random.default_rng(42)
    for fid in (1, 2):
        for p in range(w // cpp):
            mids = np.arange(cpp, dtype=np.uint16) + p * cpp
            inw = np.array([_in_window(int(m), w0, w1) for m in mids])
            if not inw.any():
                continue  # a real sensor never sends this packet
            buf = pw.new_packet()
            pw.set_packet_header(buf, init_id=info.init_id,
                                 prod_sn=info.sn)
            pw.set_frame_id(buf, fid)
            # out-of-window columns: status=0 and GARBAGE pixel data —
            # the decoded scan must still be zero there (zero-fill)
            pw.set_col_headers(
                buf, (mids.astype(np.uint64) + 1000) * (fid + 1),
                mids, inw.astype(np.uint32))
            for name in fields:
                fi = pw.field_info(name)
                hi = 1 << min(fi.bit_size, 19)
                pw.set_field(buf, name, rng.integers(
                    1, hi, size=(pw.pixels_per_column, cpp)))
            t[0] += 100_000
            stream.append(("lidar", np.frombuffer(buf.tobytes(),
                                                  np.uint8), t[0]))
    return info, stream


def _scan_digest(scan) -> dict:
    import hashlib

    out = {}
    for name in sorted(scan.fields):
        arr = scan.field(name)
        out[name] = hashlib.md5(
            np.ascontiguousarray(arr).tobytes()).hexdigest()
    for h in ("timestamp", "measurement_id", "status"):
        out[h] = hashlib.md5(
            np.ascontiguousarray(getattr(scan, h)).tobytes()).hexdigest()
    return out


@pytest.mark.conformance
@pytest.mark.parametrize("case,mode,profile,window", CASES,
                         ids=[c[0] for c in CASES])
def test_windowed_device_route_bit_equal(tmp_path, case, mode, profile,
                                         window):
    from ouster_sdk_tpu.io.device_engine import (DeviceScanIterator,
                                                 supports_device_decode)
    from ouster_sdk_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    info, stream = _build(mode, profile, window)
    assert supports_device_decode(info), case

    ref = _numpy_scans(info, stream)
    assert ref, "oracle produced no scans"
    w0, w1 = info.format.column_window
    # the oracle itself must show the window: in-window columns valid,
    # out-of-window columns zero-filled
    for s in ref:
        mids = np.arange(s.w)
        inw = np.array([_in_window(int(m), w0, w1) for m in mids])
        assert (s.status[inw] & 1).all(), case
        assert not (s.status[~inw] & 1).any(), case
        rng_img = s.field(ChanField.RANGE)
        assert (rng_img[:, inw] > 0).any(), case
        assert (rng_img[:, ~inw] == 0).all(), \
            f"{case}: garbage leaked into out-of-window columns"

    path = _write_stream(tmp_path, info, stream, f"{case}.pcap")
    dev = list(DeviceScanIterator(path, info))
    assert [s.frame_id for s in dev] == [s.frame_id for s in ref], case
    for a, b in zip(dev, ref):
        _assert_scans_equal(a, b)

    ref_l = _numpy_scans(info, stream, trailing_flush=False)
    dev_l = _run_live(info, stream)
    assert [s.frame_id for s in dev_l] == [s.frame_id for s in ref_l]
    for a, b in zip(dev_l, ref_l):
        _assert_scans_equal(a, b)

    # digest regression anchor
    golden_path = os.path.join(GOLDEN_DIR, f"{case}_digest.json")
    got = [_scan_digest(s) for s in dev]
    if not os.path.exists(golden_path):  # pragma: no cover - generation
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(golden_path, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
        pytest.fail(f"golden generated, rerun: {golden_path}")
    with open(golden_path) as f:
        golden = json.load(f)
    assert got == golden, f"{case}: digest drift vs stored golden"
