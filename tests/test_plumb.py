"""plumb: gravity-aligned extrinsics from IMU data
(ref: plugins/source.py:719-830, sdk/util/pose_util.py:636)."""

import os
import re
import typing

import numpy as np
import pytest

from ouster_sdk_tpu.utils.pose_util import \
    get_rot_matrix_to_align_to_gravity

PCAP = "/root/reference/tests/pcaps/OS-2-128-U1_v2.3.0_1024x10.pcap"
REF_POSE_UTIL = "/root/reference/python/src/ouster/sdk/util/pose_util.py"


def _reference_fn():
    src = open(REF_POSE_UTIL).read()
    ns = {"np": np}
    ns.update({k: getattr(typing, k)
               for k in ("Union", "Optional", "List", "Tuple", "Sequence",
                         "Callable", "Iterator", "Dict", "Any")})
    for fname in ("normalize_vector", "get_rot_matrix_to_align_to_gravity"):
        m = re.search(rf"def {fname}.*?(?=\ndef |\Z)", src, re.S)
        exec(m.group(0), ns)
    return ns["get_rot_matrix_to_align_to_gravity"]


@pytest.mark.skipif(not os.path.exists(REF_POSE_UTIL),
                    reason="reference tree missing")
def test_gravity_alignment_matches_reference_math():
    ref = _reference_fn()
    rng = np.random.default_rng(3)
    for _ in range(20):
        a = rng.normal([0, 0, 1], 0.3)
        ours = get_rot_matrix_to_align_to_gravity(*a)
        theirs = np.asarray(ref(*a))
        np.testing.assert_array_equal(ours, theirs)
        # it is a rotation and it plumbs the vector
        np.testing.assert_allclose(ours @ ours.T, np.eye(3), atol=1e-12)
        up = ours @ (a / np.linalg.norm(a))
        np.testing.assert_allclose(up, [0, 0, 1], atol=1e-12)
        # yaw fixed: rotated +X stays in the XZ half-plane with y == 0
        fwd = ours @ np.array([1.0, 0, 0])
        assert abs(fwd[1]) < 1e-12


@pytest.mark.skipif(not os.path.exists(PCAP), reason="fixture missing")
def test_cli_plumb_applies_extrinsics():
    from click.testing import CliRunner

    from ouster_sdk_tpu.cli import cli

    r = CliRunner().invoke(cli, [
        "source", PCAP, "plumb", "slice", ":1", "stats"])
    assert r.exit_code == 0, r.output
    assert "Average ax" in r.output
    assert "Transformation Matrix" in r.output
    assert "frame_id" in r.output
