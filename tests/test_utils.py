"""pose_util, forward_slicer, osf_ops tests."""

import os

import numpy as np
import pytest

from ouster_sdk_tpu.utils.forward_slicer import ForwardSlicer
from ouster_sdk_tpu.utils.pose_util import (
    Trajectory,
    dewarp,
    exp_pose6,
    load_kitti_poses,
    log_pose,
    pose_interp,
    transform,
)

OSF = "/root/reference/tests/osfs/OS-1-128_v2.3.0_1024x10_lb_n3.osf"


def test_pose_roundtrip_and_transform():
    xi = np.array([0.1, -0.2, 0.3, 1.0, 2.0, 3.0])
    T = exp_pose6(xi)
    assert np.abs(log_pose(T) - xi).max() < 1e-4
    pts = np.random.default_rng(0).normal(size=(10, 3))
    out = transform(pts, T)
    back = transform(out, np.linalg.inv(T))
    assert np.abs(back - pts).max() < 1e-5


def test_trajectory_eval():
    ts = np.array([0, 1_000_000_000, 2_000_000_000])
    poses = np.stack([exp_pose6([0, 0, 0, i * 1.0, 0, 0]) for i in range(3)])
    traj = Trajectory(ts, poses)
    mid = traj.pose_at(500_000_000)
    assert np.abs(mid[0, 3] - 0.5) < 1e-3
    # extrapolated outside range along first/last interval (matches the
    # reference's interp_pose, verified vs the compiled pose_util oracle)
    lo = traj.pose_at(-1_000_000_000)
    hi = traj.pose_at(5_000_000_000)
    assert np.abs(lo[0, 3] - (-1.0)) < 1e-3
    assert np.abs(hi[0, 3] - 5.0) < 1e-3
    # vectorized
    out = traj.pose_at(ts)
    assert out.shape == (3, 4, 4)


def test_dewarp_shapes():
    pts = np.zeros((4, 8, 3))
    poses = np.stack([np.eye(4)] * 8)
    poses[:, 0, 3] = np.arange(8)
    out = dewarp(pts, poses)
    assert np.allclose(out[:, :, 0], np.arange(8)[None, :])


def test_kitti_io(tmp_path):
    p = str(tmp_path / "poses.txt")
    poses = np.stack([exp_pose6([0, 0, 0.1 * i, i, 0, 0])
                      for i in range(4)])
    with open(p, "w") as f:
        for T in poses:
            f.write(" ".join(str(v) for v in T[:3].reshape(-1)) + "\n")
    back = load_kitti_poses(p)
    assert back.shape == (4, 4, 4)
    assert np.abs(back - poses).max() < 1e-12


def _fwd_slice(data, key):
    # the reference usage pattern: normalize, hand slice() an iterator
    # positioned at k.start, reverse when the step is negative
    # (ref: python/tests/test_forward_slicer.py NormalizedSliceable)
    k = ForwardSlicer.normalize(key, len(data))
    result = ForwardSlicer.slice(iter(data[k.start:k.stop]), k)
    return result if k.step > 0 else list(reversed(result))


@pytest.mark.parametrize("start, stop, step", [
    (None, None, None), (None, 8, None), (3, None, None), (3, 8, 2),
    (0, 10, 3), (3, -1, 1), (-7, -2, 1), (8, 3, 1),
    (None, None, -1), (8, 3, -1), (8, 3, -3), (10, 0, -2),
    (-1, -7, -1), (-1, 0, -3), (3, 8, -1), (9, 0, -4),
])
def test_forward_slicer(start, stop, step):
    data = list(range(10))
    key = slice(start, stop, step)
    assert _fwd_slice(data, key) == data[key]


def test_forward_slicer_lazy_and_zero_step():
    data = list(range(10))
    k = ForwardSlicer.normalize(slice(2, 8, 2), 10)
    assert list(ForwardSlicer.slice_iter(iter(data[k.start:k.stop]),
                                         k)) == [2, 4, 6]
    with pytest.raises(ValueError):
        ForwardSlicer.normalize(slice(None, None, 0), 10)


@pytest.mark.skipif(not os.path.exists(OSF), reason="fixture missing")
def test_osf_ops(tmp_path):
    from ouster_sdk_tpu.io.osf_ops import (
        osf_get_sensor_metadata,
        osf_info,
        osf_slice,
    )

    info = osf_info(OSF)
    assert info["sensors"][0]["prod_line"].startswith("OS-1")
    assert sum(info["scan_messages"].values()) == 3

    out = str(tmp_path / "sliced.osf")
    n = osf_slice(OSF, out, start_index=1, end_index=2)
    assert n == 1
    assert sum(osf_info(out)["scan_messages"].values()) == 1

    metas = osf_get_sensor_metadata(OSF)
    assert len(metas) == 1 and "beam_intrinsics" in metas[0]
