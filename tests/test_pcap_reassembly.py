"""IPv4 reassembly hole tracking + native pcap scanner edge cases.

ADVICE round 1: a retransmitted (duplicate) fragment must not satisfy the
completion check while a hole remains (the reference ip_reassembler tracks
holes explicitly, ref: ouster_pcap/include/ouster/ip_reassembler.h:76-100);
the native scanner must handle null/loopback and IPv6 captures like the
pure-Python reader, and must signal early-stop truncation.
"""

import struct

import numpy as np
import pytest

from ouster_sdk_tpu.io.pcap import (LINKTYPE_ETHERNET, LINKTYPE_NULL,
                                    IpReassembler, PcapReader)
from ouster_sdk_tpu.utils import native


def test_duplicate_fragment_does_not_mask_hole():
    r = IpReassembler()
    # datagram of 24 bytes in 3 fragments of 8; send frag0 twice, then last.
    # byte counter would see 24 >= 24 and emit with a hole at [8, 16).
    assert r.process("a", "b", 1, 17, 0, True, b"A" * 8) is None
    assert r.process("a", "b", 1, 17, 0, True, b"A" * 8) is None  # dup
    assert r.process("a", "b", 1, 17, 16, False, b"C" * 8) is None
    # only the genuinely missing fragment completes it
    out = r.process("a", "b", 1, 17, 8, True, b"B" * 8)
    assert out == b"A" * 8 + b"B" * 8 + b"C" * 8


def test_overlapping_fragments_complete():
    r = IpReassembler()
    assert r.process("a", "b", 2, 17, 0, True, b"A" * 16) is None
    out = r.process("a", "b", 2, 17, 8, False, b"B" * 16)
    assert out is not None and len(out) == 24


def _write_raw_pcap(path, frames, linktype):
    with open(path, "wb") as f:
        f.write(struct.pack("<IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0, 0x40000,
                            linktype))
        for frame in frames:
            f.write(struct.pack("<IIII", 1, 0, len(frame), len(frame)))
            f.write(frame)


def _udp4(payload, sport=7000, dport=7502):
    udp = struct.pack(">HHHH", sport, dport, 8 + len(payload), 0) + payload
    ip = struct.pack(">BBHHHBBH4s4s", 0x45, 0, 20 + len(udp), 1, 0, 64, 17,
                     0, b"\x7f\x00\x00\x01", b"\x7f\x00\x00\x01")
    return ip + udp


def _udp6(payload, sport=7000, dport=7503):
    udp = struct.pack(">HHHH", sport, dport, 8 + len(payload), 0) + payload
    ip6 = struct.pack(">IHBB", 6 << 28, len(udp), 17, 64) + b"\x00" * 15 + \
        b"\x01" + b"\x00" * 15 + b"\x02"
    return ip6 + udp


@pytest.mark.skipif(native.get_lib() is None, reason="no native toolchain")
def test_native_scan_null_loopback(tmp_path):
    p = str(tmp_path / "lo.pcap")
    frames = [struct.pack("<I", 2) + _udp4(b"x" * 100) for _ in range(3)]
    _write_raw_pcap(p, frames, LINKTYPE_NULL)
    with open(p, "rb") as f:
        res = native.pcap_scan(f.read(), False, False, LINKTYPE_NULL)
    assert res is not None
    _, offsets, sizes, *_ = res
    assert list(sizes) == [100, 100, 100]
    # pure-Python reader agrees
    assert sum(1 for _ in PcapReader(p)) == 3


@pytest.mark.skipif(native.get_lib() is None, reason="no native toolchain")
def test_native_scan_ipv6(tmp_path):
    p = str(tmp_path / "v6.pcap")
    eth6 = b"\x00" * 12 + struct.pack(">H", 0x86DD)
    frames = [eth6 + _udp6(bytes([i]) * 64) for i in range(4)]
    _write_raw_pcap(p, frames, LINKTYPE_ETHERNET)
    with open(p, "rb") as f:
        res = native.pcap_scan(f.read(), False, False, LINKTYPE_ETHERNET)
    assert res is not None
    payloads, offsets, sizes, ts, ports, ips = res
    assert list(sizes) == [64, 64, 64, 64]
    assert bytes(payloads[offsets[2]:offsets[2] + 64]) == b"\x02" * 64
    assert all(p == (7000 << 16) | 7503 for p in ports)
    assert sum(1 for _ in PcapReader(p)) == 4


@pytest.mark.skipif(native.get_lib() is None, reason="no native toolchain")
def test_native_scan_truncation_sentinel(tmp_path):
    lib = native.get_lib()
    p = str(tmp_path / "tiny.pcap")
    eth = b"\x00" * 12 + struct.pack(">H", 0x0800)
    frames = [eth + _udp4(b"y" * 10) for _ in range(10)]
    _write_raw_pcap(p, frames, LINKTYPE_ETHERNET)
    with open(p, "rb") as f:
        data = np.frombuffer(f.read(), dtype=np.uint8)
    # deliberately undersized outputs: 4 slots for 10 datagrams
    max_out = 4
    payloads = np.empty(data.size, dtype=np.uint8)
    offsets = np.empty(max_out, np.int64)
    sizes = np.empty(max_out, np.int64)
    ts = np.empty(max_out, np.uint64)
    ports = np.empty(max_out, np.uint32)
    ips = np.empty(max_out, np.uint32)
    ptr = lambda a: a.ctypes.data_as(__import__("ctypes").c_void_p)  # noqa
    n = lib.onat_pcap_scan(ptr(data), data.size, 0, 0, LINKTYPE_ETHERNET,
                           ptr(payloads), payloads.size, ptr(offsets),
                           ptr(sizes), ptr(ts), ptr(ports), ptr(ips), max_out)
    assert n == -(4 + 2)  # early-stop sentinel, 4 datagrams emitted


@pytest.mark.skipif(native.get_lib() is None, reason="no native toolchain")
def test_native_duplicate_fragment_hole(tmp_path):
    p = str(tmp_path / "dupfrag.pcap")
    eth = b"\x00" * 12 + struct.pack(">H", 0x0800)
    payload = bytes(range(256)) * 9  # 2304 B datagram
    udp = struct.pack(">HHHH", 7000, 7502, 8 + len(payload), 0) + payload

    def frag(off, chunk, more):
        ff = (0x2000 if more else 0) | (off // 8)
        ip = struct.pack(">BBHHHBBH4s4s", 0x45, 0, 20 + len(chunk), 42, ff,
                         64, 17, 0, b"\x0a\x00\x00\x01", b"\x0a\x00\x00\x02")
        return eth + ip + chunk

    # frag0 (dup), frag2 -> still a hole; byte counting would emit here
    frames = [frag(0, udp[:800], True), frag(0, udp[:800], True),
              frag(1600, udp[1600:], False), frag(800, udp[800:1600], True)]
    _write_raw_pcap(p, frames, LINKTYPE_ETHERNET)
    with open(p, "rb") as f:
        res = native.pcap_scan(f.read(), False, False, LINKTYPE_ETHERNET)
    payloads, offsets, sizes, *_ = res
    assert list(sizes) == [len(payload)]
    assert bytes(payloads[offsets[0]:offsets[0] + sizes[0]]) == payload
    # python reader agrees byte-for-byte
    infos = list(PcapReader(p))
    assert len(infos) == 1 and infos[0][1] == payload
