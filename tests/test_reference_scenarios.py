"""Scenario parity with reference python test suites not covered
elsewhere (ref: python/tests/test_resolve_extrinsics.py,
test_lidar_scan_set.py, test_packet_iter.py ichunked_* cases,
test_data.py LidarScan ctor overloads)."""

import os
import weakref
from itertools import count

import numpy as np
import pytest

from ouster_sdk_tpu import LidarScan, LidarScanSet
from ouster_sdk_tpu.io.pcap_source import ichunked_before
from ouster_sdk_tpu.io.sources import open_source

NOEXT = ("/root/reference/tests/pcap_without_extrinsics/"
         "OS-0-128-U1_v2.3.0_10.pcap")
WITHEXT = ("/root/reference/tests/pcap_with_extrinsics/"
           "OS-0-128-U1_v2.3.0_10.pcap")
EXTJ = ("/root/reference/tests/pcap_with_extrinsics/"
        "extrinsic_parameters.json")


def _need(p):
    if not os.path.exists(p):
        pytest.skip("fixture missing")


# -- extrinsics resolution (ref: test_resolve_extrinsics.py) --------------

def test_no_extrinsics_defaults_identity():
    _need(NOEXT)
    ss = open_source(NOEXT)
    np.testing.assert_array_equal(ss.sensor_info[0].extrinsic, np.eye(4))


def test_extrinsics_supplied_as_array():
    _need(NOEXT)
    ss = open_source(NOEXT, extrinsics=[np.ones((4, 4))])
    np.testing.assert_array_equal(ss.sensor_info[0].extrinsic,
                                  np.ones((4, 4)))


def test_extrinsics_supplied_as_file():
    _need(NOEXT)
    _need(EXTJ)
    ss = open_source(NOEXT, extrinsics_file=EXTJ)
    assert (ss.sensor_info[0].extrinsic != np.eye(4)).any()


def test_extrinsics_not_auto_loaded_from_source_dir():
    """A colocated extrinsics file is NOT applied automatically
    (ref: test_resolve_extrinsics.py:40)."""
    _need(WITHEXT)
    ss = open_source(WITHEXT)
    assert (ss.sensor_info[0].extrinsic == np.eye(4)).any()


# -- LidarScanSet API (ref: test_lidar_scan_set.py) ------------------------

def test_scan_set_bindings_surface():
    scans_in = [LidarScan(10, 10), LidarScan(10, 10), None,
                LidarScan(10, 10)]
    c = LidarScanSet(scans_in)
    assert [x for x in c] == scans_in
    assert (c[0].w, c[0].h) == (10, 10)
    assert c[2] is None and len(c) == 4
    c.add_field("zz", np.uint32, (10, 10, 10))
    assert c.has_field("zz")
    c.del_field("zz")
    assert not c.has_field("zz")
    c.add_field("aa", np.uint32, (10, 10, 10))
    c.add_field("cc", np.uint32, (10, 10, 10))
    c.add_field("bb", np.uint32, (10, 10, 10))
    assert c.fields == ["aa", "bb", "cc"]


def test_scan_set_assignment_and_empty_ctor():
    c = LidarScanSet([LidarScan(10, 10), None])
    c[0] = None
    assert len(c) == 2 and c[0] is None
    assert len(LidarScanSet()) == 0


# -- LidarScan ctor overloads (ref: test_data.py:125-135, client.pyi) -----

def test_lidar_scan_ctor_overloads():
    from ouster_sdk_tpu.core.field import FieldClass, FieldType
    from ouster_sdk_tpu.core.types import UDPProfileLidar

    s = LidarScan(1024, 32)            # positional = (h, w)
    assert (s.h, s.w) == (1024, 32)
    assert (LidarScan(w=512, h=16).h, LidarScan(h=16, w=512).w) == (16, 512)
    s = LidarScan(16, 512, UDPProfileLidar.RNG15_RFL8_NIR8)
    assert (s.h, s.w) == (16, 512)
    assert s.has_field("NEAR_IR") and not s.has_field("SIGNAL")
    ft = [FieldType("RANGE", np.uint32, (), FieldClass.PIXEL_FIELD)]
    s = LidarScan(512, 16, ft)         # field_types overload = (w, h, ...)
    assert (s.w, s.h) == (512, 16) and list(s.fields) == ["RANGE"]


# -- ichunked_before (ref: test_packet_iter.py) ----------------------------

def test_ichunked_single_chunk():
    it = ichunked_before(list(range(10)), lambda _: False)
    assert list(next(it)) == list(range(10))
    assert list(it) == []


def test_ichunked_chunk_per_item():
    it = ichunked_before(list(range(4)), lambda _: True)
    assert [list(c) for c in it] == [[0], [1], [2], [3]]


def test_ichunked_split_at_item():
    it = ichunked_before("abcdef", lambda c: c == "d")
    assert [list(c) for c in it] == [["a", "b", "c"], ["d", "e", "f"]]


def test_ichunked_pred_true_on_first():
    it = ichunked_before([0, 1, 2, 3], lambda c: c % 2 == 0)
    assert [list(c) for c in it] == [[0, 1], [2, 3]]


def test_ichunked_lazy():
    i = -1

    def mycount():
        nonlocal i
        for i in count():
            yield i

    it = ichunked_before(mycount(), lambda x: x % 3 == 0)
    assert next(next(it)) == i == 0   # not eagerly evaluated
    next(it)
    assert i == 3                      # advancing consumes to next split


def test_ichunked_map_to_lists():
    it = ichunked_before(count(), lambda i: i % 3 == 0)
    chunks = map(list, it)
    c0 = next(chunks)
    assert next(chunks) == [3, 4, 5]
    assert c0 == [0, 1, 2]


def test_ichunked_does_not_retain_chunks():
    class Object:
        pass

    objs = [Object() for _ in range(10)]
    consume = iter(objs.pop, objs[0])
    o3 = objs[-3]
    it = ichunked_before(consume, lambda o: o is o3)
    o2 = weakref.ref(objs[-2])
    next(next(it))
    assert o2() is not None
    next(it)
    assert o2() is None   # rest of first chunk deallocated


def test_ichunked_exhausting_chunk_ends_iterator():
    it = ichunked_before(list(range(10)), lambda _: False)
    list(next(it))
    with pytest.raises(StopIteration):
        next(it)
