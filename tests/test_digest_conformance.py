"""Golden-digest conformance: batch reference pcaps and compare md5 digests
against the reference `*_digest.json` files (the reference's own bit-exactness
mechanism, ref: python/src/ouster/sdk/core/_digest.py + test_pcap.py)."""

import glob
import os

import pytest

from ouster_sdk_tpu.io.pcap_source import PcapPacketSource
from ouster_sdk_tpu.utils.digest import StreamDigest


def _digest_cases():
    pcap_dir = "/root/reference/tests/pcaps"
    if not os.path.isdir(pcap_dir):
        return []
    out = []
    for dj in sorted(glob.glob(os.path.join(pcap_dir, "*_digest.json"))):
        pcap = dj.replace("_digest.json", ".pcap")
        if os.path.exists(pcap):
            out.append((pcap, dj))
    return out


CASES = _digest_cases()


@pytest.mark.conformance
@pytest.mark.parametrize(
    "pcap_path,digest_path", CASES,
    ids=[os.path.basename(p) for p, _ in CASES])
def test_pcap_digest(pcap_path, digest_path):
    with open(digest_path) as f:
        good = StreamDigest.from_json(f.read())
    source = PcapPacketSource(pcap_path)
    computed = StreamDigest.from_packet_source(source)
    good.check(computed)
