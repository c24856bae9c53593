"""pose_util parity vs the reference's COMPILED dewarp/transform/
interp_pose (oracle pattern; subprocess-driven like the image-processing
oracle). Measured: dewarp/transform agree to machine precision; the SE(3)
interpolators agree to <4e-7 (our device path interpolates in f32); this
oracle exposed that the reference EXTRAPOLATES out-of-range trajectory
queries along the first/last interval — now matched by
ops/pose.interp_trajectory (clamp=False default)."""

import hashlib
import os
import subprocess
import tempfile

import pytest

REF = "/root/reference"
EIGEN_INC = "/opt/venv/lib/python3.12/site-packages/tensorflow/include"
SRCS = [os.path.join(REF, "ouster_client/src", f) for f in
        ("pose_util.cpp", "transform_homogeneous.cpp",
         "transform_quaternion.cpp", "transform_vector.cpp")]

_WRAP = r"""
#include <ouster/pose_util.h>
#include <ouster/lidar_scan.h>
#include <cstring>
#include <stdexcept>
using namespace ouster::sdk::core;

extern "C" int oracle_dewarp(const double* pts, long n, long w,
                             const double* poses, double* out) {
    try {
        Eigen::Map<const PointCloudXYZ<double>> P(pts, n, 3);
        Eigen::Map<const Poses> W(poses, w, 16);
        Eigen::Map<PointCloudXYZ<double>> O(out, n, 3);
        Eigen::Ref<PointCloudXYZ<double>> oref(O);
        dewarp<double>(oref, P, W);
        return 0;
    } catch (...) { return 1; }
}

extern "C" int oracle_transform(const double* pts, long n,
                                const double* pose16, double* out) {
    try {
        Eigen::Map<const PointCloudXYZ<double>> P(pts, n, 3);
        Eigen::Map<const Pose> T(pose16);
        Eigen::Map<PointCloudXYZ<double>> O(out, n, 3);
        Eigen::Ref<PointCloudXYZ<double>> oref(O);
        transform<double>(oref, P, T);
        return 0;
    } catch (...) { return 1; }
}

extern "C" int oracle_interp_two(const double* ts, long n, double t0,
                                 const double* x0_16, double t1,
                                 const double* x1_16, double* out) {
    try {
        std::vector<double> x(ts, ts + n);
        Matrix4dR a, b;
        std::memcpy(a.data(), x0_16, 16 * sizeof(double));
        std::memcpy(b.data(), x1_16, 16 * sizeof(double));
        auto res = interp_pose<double>(x, t0, a, t1, b);
        for (long i = 0; i < n; i++)
            std::memcpy(out + 16 * i, res[i].data(), 16 * sizeof(double));
        return 0;
    } catch (...) { return 1; }
}

extern "C" int oracle_interp_traj(const double* xi, long ni,
                                  const double* xk, long nk,
                                  const double* poses_row16, double* out) {
    try {
        Eigen::Map<const Eigen::VectorXd> XI(xi, ni), XK(xk, nk);
        Eigen::Map<const PosesT<double>> PK(poses_row16, nk, 16);
        PosesT<double> res = interp_pose<double, double>(XI, XK, PK);
        std::memcpy(out, res.data(), sizeof(double) * ni * 16);
        return 0;
    } catch (...) { return 1; }
}

// linker stubs for LidarScan-consuming overloads the oracle never calls
namespace ouster { namespace sdk { namespace core {
int LidarScan::get_first_valid_column() const {
    throw std::runtime_error("oracle stub");
}
int LidarScan::get_last_valid_column() const {
    throw std::runtime_error("oracle stub");
}
}}}
"""

_DRIVER = r'''
import ctypes, sys
import numpy as np

so, repo = sys.argv[1], sys.argv[2]
c = ctypes
lib = ctypes.CDLL(so)
lib.oracle_dewarp.restype = c.c_int
lib.oracle_dewarp.argtypes = [c.c_void_p, c.c_long, c.c_long, c.c_void_p,
                              c.c_void_p]
lib.oracle_transform.restype = c.c_int
lib.oracle_transform.argtypes = [c.c_void_p, c.c_long, c.c_void_p,
                                 c.c_void_p]
lib.oracle_interp_two.restype = c.c_int
lib.oracle_interp_two.argtypes = [c.c_void_p, c.c_long, c.c_double,
                                  c.c_void_p, c.c_double, c.c_void_p,
                                  c.c_void_p]
lib.oracle_interp_traj.restype = c.c_int
lib.oracle_interp_traj.argtypes = [c.c_void_p, c.c_long, c.c_void_p,
                                   c.c_long, c.c_void_p, c.c_void_p]

import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, repo)
from ouster_sdk_tpu.utils.pose_util import dewarp, transform, exp_pose6
from ouster_sdk_tpu.ops.pose import interp_pose_np, interp_trajectory


def ptr(a):
    return a.ctypes.data_as(c.c_void_p)


rng = np.random.default_rng(0)
w, hpts = 64, 16
n = w * hpts
pts = np.ascontiguousarray(rng.normal(0, 20, (n, 3)))
poses = np.stack([exp_pose6(np.concatenate(
    [rng.normal(0, 2, 3), rng.normal(0, 0.3, 3)])) for _ in range(w)])

out = np.zeros((n, 3))
assert lib.oracle_dewarp(ptr(pts), n, w,
                         ptr(np.ascontiguousarray(poses.reshape(w, 16))),
                         ptr(out)) == 0
d = np.abs(dewarp(pts, poses) - out).max()
assert d < 1e-12, f"dewarp {d}"

T = np.ascontiguousarray(exp_pose6(np.array([1.0, 2, 3, 0.1, 0.2, 0.3])))
out1 = np.zeros((n, 3))
assert lib.oracle_transform(ptr(pts), n, ptr(T), ptr(out1)) == 0
d = np.abs(transform(pts, T) - out1).max()
assert d < 1e-12, f"transform {d}"

ts = np.linspace(-0.5, 1.5, 33)
a = np.ascontiguousarray(np.eye(4))
b = np.ascontiguousarray(exp_pose6(np.array([4.0, 2, 1, 0.4, -0.2, 0.1])))
out2 = np.zeros((33, 16))
assert lib.oracle_interp_two(ptr(ts), 33, 0.0, ptr(a), 1.0, ptr(b),
                             ptr(out2)) == 0
ours2 = np.stack([interp_pose_np(t, a, b).reshape(16) for t in ts])
d = np.abs(ours2 - out2).max()
assert d < 1e-5, f"interp two {d}"

xk = np.array([0.0, 1.0, 2.5, 4.0])
pk = np.stack([exp_pose6(rng.normal(0, 0.5, 6)) for _ in range(4)])
xi = np.linspace(-1, 5, 41)  # incl. out-of-range extrapolation
out3 = np.zeros((41, 16))
assert lib.oracle_interp_traj(
    ptr(np.ascontiguousarray(xi)), 41, ptr(xk), 4,
    ptr(np.ascontiguousarray(pk.reshape(4, 16))), ptr(out3)) == 0
ours3 = np.asarray(interp_trajectory(xi, xk, pk)).reshape(41, 16)
d = np.abs(ours3 - out3).max()
assert d < 1e-5, f"interp traj {d}"
print("pose_util oracle: all within bounds")
'''


def test_pose_util_matches_compiled_reference(tmp_path):
    import sys

    if not (all(os.path.exists(s) for s in SRCS)
            and os.path.isdir(EIGEN_INC)):
        pytest.skip("reference sources / Eigen headers unavailable")
    key = hashlib.sha256(
        _WRAP.encode() + b"".join(open(s, "rb").read() for s in SRCS)
    ).hexdigest()[:16]
    so = os.path.join(tempfile.gettempdir(), f"pose_oracle_{key}.so")
    if not os.path.exists(so):
        wrap = so + ".cpp"
        with open(wrap, "w") as f:
            f.write(_WRAP)
        r = subprocess.run(
            ["g++", "-O2", "-std=c++14", "-shared", "-fPIC",
             "-Wl,--no-undefined", f"-I{EIGEN_INC}",
             f"-I{os.path.join(REF, 'ouster_client/include')}",
             f"-I{os.path.join(REF, 'ouster_client/include/optional-lite')}",
             wrap] + SRCS + ["-o", so],
            capture_output=True, text=True, timeout=300)
        if r.returncode != 0:
            pytest.skip(f"oracle build failed: {r.stderr[-400:]}")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    drv = tmp_path / "drive.py"
    drv.write_text(_DRIVER)
    r = subprocess.run([sys.executable, str(drv), so, repo],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "all within bounds" in r.stdout
