"""ScanSource surface parity with the reference's python tests
(test_open_source.py, test_scan_ops.py): scans_num as a property,
unindexed error types/texts, chaining derived views, and open_source
error messages.
"""

import os
import tempfile

import pytest

from ouster_sdk_tpu import open_source

PCAP = "/root/reference/tests/pcaps/OS-0-128-U1_v2.3.0_1024x10.pcap"
OSF = "/root/reference/tests/osfs/OS-1-128_v2.3.0_1024x10_lb_n3.osf"

pytestmark = pytest.mark.skipif(
    not os.path.exists(PCAP), reason="reference fixtures missing")


def test_open_source_empty_source_url():
    """(ref: test_open_source.py:13-16)"""
    with pytest.raises(ValueError, match="No valid source specified"):
        open_source("")


def test_open_source_undetermined_source_type():
    """(ref: test_open_source.py:26-30)"""
    with pytest.raises(Exception,
                       match="not found. File or host not found"):
        open_source("unknown source")


def test_open_source_unhandled_source_type():
    """(ref: test_open_source.py:33-38)"""
    with tempfile.NamedTemporaryFile(suffix=".txt") as f:
        with pytest.raises(Exception,
                           match="Could not detect IO type"):
            open_source(f.name)


def test_open_source_meta_not_supported_osf():
    """(ref: test_open_source.py:41-45)"""
    with pytest.raises(Exception, match="'meta' not supported"):
        open_source(OSF, meta=["fake_meta.json"])


def test_unindexed_scans_num_raises():
    """scans_num is a PROPERTY and raises RuntimeError when unindexed
    (ref: client.pyi:4343; test_open_source.py:96-104)."""
    src = open_source(PCAP, index=False)
    with pytest.raises(RuntimeError,
                       match="Cannot perform 'scans_num' on an "
                             "unindexed source"):
        src.scans_num


def test_unindexed_len_raises():
    """(ref: test_open_source.py:106-113)"""
    src = open_source(PCAP, index=False)
    with pytest.raises(TypeError,
                       match="Cannot get the length of an unindexed "
                             "scan source"):
        len(src)


def test_indexed_scans_num_property():
    src = open_source(PCAP, index=True)
    n = src.scans_num
    assert isinstance(n, list) and n[0] >= 1
    assert len(src) >= 1


def test_open_source_field_names():
    """field_names filters the decoded field set
    (ref: test_open_source.py:62-77)."""
    for parameter, expected in [(["RANGE"], {"RANGE"}), ([], set())]:
        src = open_source(PCAP, field_names=parameter)
        got = False
        for s, in src:
            got = True
            assert set(s.fields) == expected
        assert got


def test_chain():
    """reduce -> clip -> mask chaining with forwarded index state
    (ref: test_scan_ops.py:219-231; client.pyi:4402-4415)."""
    src = open_source(OSF, index=True)
    chained = src.reduce([32]).clip(["RANGE"], 0, 10000) \
        .mask(["RANGE"], [None])
    assert chained.scans_num == src.scans_num
    assert len(chained) == len(src)
    assert chained.is_indexed and not chained.is_live
    count = 0
    for s, in chained:
        assert s.h == 32
        assert s.field("RANGE").max() <= 10000
        count += 1
    assert count == len(src)


def test_chain_invalid_args_raise():
    """(ref: test_scan_ops.py:41-67, 86-99, 118-133)"""
    src = open_source(OSF, index=True)
    with pytest.raises(ValueError):
        src.reduce([32, 32])  # factor count != sensor count
    with pytest.raises(ValueError):
        src.reduce([7])  # does not divide the beam count
    with pytest.raises(ValueError):
        src.clip(["RANGE"], 5000, 1000)  # upper < lower
    with pytest.raises(ValueError):
        src.mask(["RANGE"], [None, None])  # mask count != sensor count
