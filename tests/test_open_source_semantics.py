"""open_source behavior parity (ref: python/tests/test_open_source.py,
test_scan_source_slice.py): error cases, option handling, field subsets,
slicing semantics of indexed sources."""

import os

import numpy as np
import pytest

from ouster_sdk_tpu import ChanField
from ouster_sdk_tpu.io.sources import open_source

PCAP = "/root/reference/tests/pcaps/OS-0-128-U1_v2.3.0_1024x10.pcap"
OSF = "/root/reference/tests/osfs/OS-1-128_v2.3.0_1024x10_lb_n3.osf"


def _need(path):
    if not os.path.exists(path):
        pytest.skip("fixture missing")


def test_open_source_empty_url():
    with pytest.raises(ValueError):
        open_source("")


def test_open_source_unsupported_extension(tmp_path):
    # backend/io_type failures surface wrapped in SourceURLException,
    # like the reference (open_source.py:100-101)
    from ouster_sdk_tpu.io.sources import SourceURLException

    p = tmp_path / "data.txt"
    p.write_text("hello")
    with pytest.raises(SourceURLException,
                       match="Could not detect IO type"):
        open_source(str(p))


def test_open_source_unknown_option():
    _need(PCAP)
    with pytest.raises(Exception):  # check-on-unused semantics
        open_source(PCAP, definitely_not_an_option=1)


def test_open_source_meta_override():
    _need(PCAP)
    meta = PCAP.replace(".pcap", ".json")
    src = open_source(PCAP, meta=[meta])
    assert src.sensor_info[0].sn


def test_field_names_subset_osf():
    _need(OSF)
    src = open_source(OSF, field_names=[ChanField.RANGE])
    scan = next(iter(src)).valid()[0]
    assert scan.has_field(ChanField.RANGE)
    assert not scan.has_field(ChanField.NEAR_IR)


def test_unindexed_len_raises():
    _need(PCAP)
    src = open_source(PCAP)  # no index
    if not src.is_indexed:
        with pytest.raises(TypeError):
            len(src)


# -- slicing semantics (ref: test_scan_source_slice.py) ---------------------

@pytest.fixture(scope="module")
def indexed():
    _need(OSF)
    return open_source(OSF, index=True)


@pytest.mark.parametrize("start,stop,step", [
    (0, None, None), (1, None, None), (None, 2, None),
    (0, 3, 2), (1, 3, None), (None, None, 2)])
def test_slicing_level_1(indexed, start, stop, step):
    n = len(indexed)
    got = indexed[start:stop:step]
    idx = list(range(n))[start:stop:step]
    assert len(got) == len(idx)
    for g, i in zip(got, idx):
        a = g.valid()[0]
        b = indexed[i].valid()[0]
        assert a.frame_id == b.frame_id


def test_slicing_level_2(indexed):
    n = len(indexed)
    if n < 3:
        pytest.skip("fixture too short")
    sub = indexed[0:n]
    sub2 = sub[1:n]
    assert len(sub2) == n - 1
    assert sub2[0].valid()[0].frame_id == indexed[1].valid()[0].frame_id


def test_slicing_negative_step_raises(indexed):
    with pytest.raises(Exception):
        _ = indexed[::-1]


def test_index_out_of_range_raises(indexed):
    with pytest.raises(IndexError):
        _ = indexed[len(indexed) + 5]


def test_raw_headers_and_raw_fields_options():
    """open_source(raw_headers=True / raw_fields=True) adds the RAW
    channels like the reference options (ref: open_source.h:80
    raw_headers/raw_fields)."""
    P = "/root/reference/tests/pcaps/OS-2-128-U1_v2.3.0_1024x10.pcap"
    _need(P)
    src = open_source(P, raw_headers=True)
    scan = next(iter(src)).valid()[0]
    rh = scan.field("RAW_HEADERS")
    col = scan.first_valid_column()
    assert rh[:8, col].copy().view("<u8")[0] == scan.timestamp[col]

    src2 = open_source(P, raw_fields=True)
    scan2 = next(iter(src2)).valid()[0]
    raw1 = scan2.field("RAW32_WORD1")
    np.testing.assert_array_equal(raw1 & 0x7FFFF,
                                  scan2.field(ChanField.RANGE))


# -- sliced-source parity matrix (ref: python/tests/test_scan_source_slice.py
#    test_slicing_level_1/2: a sliced source behaves like native list
#    slicing of the original, including nested re-slicing) ----------------

_L = 3  # both lb_n3 fixtures hold exactly 3 scans
_SLICE_PATHS = [
    "/root/reference/tests/osfs/OS-1-128_v2.3.0_1024x10_lb_n3.osf",
    "/root/reference/tests/pcaps/OS-1-128_v2.3.0_1024x10_lb_n3.pcap",
]


@pytest.mark.parametrize("path", _SLICE_PATHS)
@pytest.mark.parametrize("start, stop, step", [
    (0, _L, None), (0, _L - 1, None), (0, _L - 3, None),
    (1, _L, None), (3, _L, None), (0, _L + _L, None),
    (0, -1, None), (0, -_L, None),
    (-1, _L, None), (-_L, _L, None),
    (0, _L, 2), (0, _L, 3), (0, _L - 1, 2),
    (1, _L, 2), (1, _L - 1, 3),
])
def test_sliced_source_matches_native_slicing(path, start, stop, step):
    _need(path)
    src = open_source(path, index=True)
    ref_ids = [s[0].frame_id for s in src]
    assert len(ref_ids) == _L
    s = slice(start, stop, step)
    sliced = src[s]
    assert len(sliced) == len(ref_ids[s])
    assert [x[0].frame_id for x in sliced] == ref_ids[s]
    # level-2 nested slicing composes (ref test_slicing_level_2_*)
    nested = sliced[1:]
    assert [x[0].frame_id for x in nested] == ref_ids[s][1:]
