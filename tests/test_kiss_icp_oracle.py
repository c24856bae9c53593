"""KISS-ICP data-structure parity vs the reference's COMPILED
VoxelHashMap.cpp / VoxelUtils.cpp (oracle pattern, subprocess-driven).

Compiles the vendored kiss-icp sources verbatim
(ref: thirdparty/kiss-icp/cpp/kiss_icp/core/{VoxelHashMap,VoxelUtils}.cpp)
against a minimal tsl::robin_map shim (std::unordered_map with the same
API — iteration order is the only difference, and every comparison below
is order-independent) and checks:
  - VoxelDownsample: identical point SETS (first point per voxel)
  - VoxelHashMap::AddPoints + RemovePointsFarFromLocation: identical map
    contents per voxel (cap + map_resolution admission + >= pruning)
  - GetClosestNeighbor: identical neighbor/distance per query through
    the 27-voxel neighborhood scan
"""

import hashlib
import os
import subprocess
import tempfile

import pytest

REF = "/root/reference"
CORE = os.path.join(REF, "thirdparty/kiss-icp/cpp/kiss_icp/core")
SOPHUS = os.path.join(REF, "thirdparty/sophus")
EIGEN_INC = "/opt/venv/lib/python3.12/site-packages/tensorflow/include"

# tsl::robin_map API shim over std::unordered_map: the reference uses
# find/.value()/insert/erase/contains/reserve/size/clear/empty and
# range iteration; hash-map iteration ORDER is unspecified in both.
_ROBIN_SHIM = r"""
#pragma once
#include <unordered_map>
#include <utility>

namespace tsl {

template <class K, class V, class Hash = std::hash<K>>
class robin_map {
    using base_t = std::unordered_map<K, V, Hash>;
    base_t m_;

public:
    template <class BaseIt>
    struct iter {
        BaseIt it;
        bool operator==(const iter& o) const { return it == o.it; }
        bool operator!=(const iter& o) const { return it != o.it; }
        iter& operator++() { ++it; return *this; }
        decltype(auto) operator*() const { return *it; }
        decltype(auto) operator->() const { return it.operator->(); }
        decltype(auto) value() const { return (it->second); }
        BaseIt base() const { return it; }
    };
    using iterator = iter<typename base_t::iterator>;
    using const_iterator = iter<typename base_t::const_iterator>;

    iterator begin() { return {m_.begin()}; }
    iterator end() { return {m_.end()}; }
    const_iterator begin() const { return {m_.begin()}; }
    const_iterator end() const { return {m_.end()}; }
    const_iterator cbegin() const { return {m_.cbegin()}; }
    const_iterator cend() const { return {m_.cend()}; }
    iterator find(const K& k) { return {m_.find(k)}; }
    const_iterator find(const K& k) const { return {m_.find(k)}; }
    bool contains(const K& k) const { return m_.count(k) != 0; }
    using value_type = std::pair<K, V>;
    void insert(value_type p) { m_.insert(std::move(p)); }
    iterator erase(iterator it) { return {m_.erase(it.base())}; }
    void clear() { m_.clear(); }
    bool empty() const { return m_.empty(); }
    std::size_t size() const { return m_.size(); }
    void reserve(std::size_t n) { m_.reserve(n); }
};

}  // namespace tsl
"""

_WRAP = r"""
#include <cstring>
#include <vector>
#include <Eigen/Core>
#include "VoxelHashMap.hpp"
#include "VoxelUtils.hpp"

using kiss_icp::VoxelHashMap;

static std::vector<Eigen::Vector3d> to_vec(const double* p, long n) {
    std::vector<Eigen::Vector3d> v(n);
    for (long i = 0; i < n; ++i) v[i] = Eigen::Vector3d(p + 3 * i);
    return v;
}

extern "C" {

void* vhm_create(double vs, double md, unsigned cap) {
    return new VoxelHashMap(vs, md, cap);
}

void vhm_destroy(void* h) { delete static_cast<VoxelHashMap*>(h); }

void vhm_add_points(void* h, const double* pts, long n) {
    static_cast<VoxelHashMap*>(h)->AddPoints(to_vec(pts, n));
}

void vhm_remove_far(void* h, const double* origin) {
    static_cast<VoxelHashMap*>(h)->RemovePointsFarFromLocation(
        Eigen::Vector3d(origin));
}

long vhm_pointcloud(void* h, double* out, long max_n) {
    auto pc = static_cast<VoxelHashMap*>(h)->Pointcloud();
    long n = static_cast<long>(pc.size());
    if (n > max_n) return -1;
    for (long i = 0; i < n; ++i)
        std::memcpy(out + 3 * i, pc[i].data(), 3 * sizeof(double));
    return n;
}

void vhm_nn(void* h, const double* queries, long n, double* out_pts,
            double* out_dist) {
    auto* m = static_cast<VoxelHashMap*>(h);
    for (long i = 0; i < n; ++i) {
        auto res = m->GetClosestNeighbor(Eigen::Vector3d(queries + 3 * i));
        std::memcpy(out_pts + 3 * i, std::get<0>(res).data(),
                    3 * sizeof(double));
        out_dist[i] = std::get<1>(res);
    }
}

long kiss_voxel_downsample(const double* pts, long n, double vs,
                           double* out) {
    auto ds = kiss_icp::VoxelDownsample(to_vec(pts, n), vs);
    for (size_t i = 0; i < ds.size(); ++i)
        std::memcpy(out + 3 * i, ds[i].data(), 3 * sizeof(double));
    return static_cast<long>(ds.size());
}

}  // extern "C"
"""

_DRIVER = r'''
import ctypes, sys
import numpy as np

so, repo = sys.argv[1], sys.argv[2]
c = ctypes
lib = ctypes.CDLL(so)
lib.vhm_create.restype = c.c_void_p
lib.vhm_create.argtypes = [c.c_double, c.c_double, c.c_uint]
lib.vhm_destroy.argtypes = [c.c_void_p]
lib.vhm_add_points.argtypes = [c.c_void_p, c.c_void_p, c.c_long]
lib.vhm_remove_far.argtypes = [c.c_void_p, c.c_void_p]
lib.vhm_pointcloud.restype = c.c_long
lib.vhm_pointcloud.argtypes = [c.c_void_p, c.c_void_p, c.c_long]
lib.vhm_nn.argtypes = [c.c_void_p, c.c_void_p, c.c_long, c.c_void_p,
                       c.c_void_p]
lib.kiss_voxel_downsample.restype = c.c_long
lib.kiss_voxel_downsample.argtypes = [c.c_void_p, c.c_long, c.c_double,
                                      c.c_void_p]


def ptr(a):
    return a.ctypes.data_as(c.c_void_p)


rng = np.random.default_rng(7)
# clustered scene so voxels overflow the cap and the map_resolution
# admission actually rejects points
CLUSTERS = rng.uniform(-40, 40, (60, 3))
pts1 = np.ascontiguousarray(
    np.concatenate([cc + rng.normal(0, 0.8, (400, 3)) for cc in CLUSTERS]))
pts2 = np.ascontiguousarray(
    np.concatenate([cc + rng.normal(0, 0.8, (150, 3)) for cc in CLUSTERS])
    + np.array([1.5, -0.5, 0.2]))
queries = np.ascontiguousarray(
    np.concatenate([CLUSTERS + rng.normal(0, 1.2, CLUSTERS.shape),
                    rng.uniform(-45, 45, (200, 3))]))
origin = np.ascontiguousarray(np.array([25.0, 0.0, 0.0]))
VS, MD, CAP = 1.0, 30.0, 20

# phase 1: oracle outputs BEFORE importing jax/ouster
out = np.zeros((len(pts1), 3))
m = lib.kiss_voxel_downsample(ptr(pts1), len(pts1), 1.5, ptr(out))
ref_ds = out[:m].copy()

h = lib.vhm_create(VS, MD, CAP)
lib.vhm_add_points(h, ptr(pts1), len(pts1))
lib.vhm_add_points(h, ptr(pts2), len(pts2))
lib.vhm_remove_far(h, ptr(origin))
cap_out = np.zeros((len(pts1) + len(pts2), 3))
n_map = lib.vhm_pointcloud(h, ptr(cap_out), len(cap_out))
assert n_map > 0
ref_map = cap_out[:n_map].copy()
nn_pts = np.zeros_like(queries)
nn_d = np.zeros(len(queries))
lib.vhm_nn(h, ptr(queries), len(queries), ptr(nn_pts), ptr(nn_d))
lib.vhm_destroy(h)

# phase 2: compare against our implementation
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, repo)
from ouster_sdk_tpu.ops.downsample import voxel_downsample_first
from ouster_sdk_tpu.slam.kiss_icp import VoxelHashMap


def as_set(a):
    return set(map(tuple, np.round(a, 12)))


ours_ds = voxel_downsample_first(pts1, 1.5)
assert len(ours_ds) == len(ref_ds), (len(ours_ds), len(ref_ds))
assert as_set(ours_ds) == as_set(ref_ds), "VoxelDownsample sets differ"

vm = VoxelHashMap(VS, MD, CAP)
vm.add_points(pts1)
vm.add_points(pts2)
vm.remove_far_points(origin)
ours_map = vm.pointcloud()
assert len(ours_map) == n_map, (len(ours_map), n_map)
assert as_set(ours_map) == as_set(ref_map), "map contents differ"

mask, tgt = vm.closest_neighbors(queries, max_dist=np.inf)
# the oracle reports DBL_MAX when the 27-voxel scan finds nothing
ref_found = nn_d < 1e300
mismatch = 0
for i in range(len(queries)):
    if not ref_found[i]:
        assert not mask[i], f"query {i}: ours found, oracle did not"
        continue
    assert mask[i], f"query {i}: oracle found, ours did not"
    ours_d = np.linalg.norm(tgt[i] - queries[i])
    # allow exact-tie differences only: distances must agree to 1e-12
    assert abs(ours_d - nn_d[i]) < 1e-12, \
        f"query {i}: dist {ours_d} vs oracle {nn_d[i]}"
    if not np.allclose(tgt[i], nn_pts[i], atol=1e-12):
        mismatch += 1  # equal-distance tie broken differently
assert mismatch <= 2, f"{mismatch} non-tie neighbor mismatches"
print(f"kiss-icp oracle: downsample {len(ref_ds)} pts, map {n_map} pts, "
      f"{int(ref_found.sum())} NN queries all match")
'''


def test_kiss_icp_structures_match_compiled_reference(tmp_path):
    import sys

    if not (os.path.isdir(CORE) and os.path.isdir(EIGEN_INC)):
        pytest.skip("reference kiss-icp sources / Eigen unavailable")
    srcs = [os.path.join(CORE, "VoxelHashMap.cpp"),
            os.path.join(CORE, "VoxelUtils.cpp")]
    key = hashlib.sha256(
        (_WRAP + _ROBIN_SHIM).encode()
        + b"".join(open(s, "rb").read() for s in srcs)
    ).hexdigest()[:16]
    so = os.path.join(tempfile.gettempdir(), f"kiss_oracle_{key}.so")
    if not os.path.exists(so):
        inc = tmp_path / "inc" / "tsl"
        inc.mkdir(parents=True)
        (inc / "robin_map.h").write_text(_ROBIN_SHIM)
        wrap = so + ".cpp"
        with open(wrap, "w") as f:
            f.write(_WRAP)
        r = subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
             "-Wl,--no-undefined", f"-I{EIGEN_INC}", f"-I{CORE}",
             f"-I{tmp_path / 'inc'}", f"-I{SOPHUS}",
             wrap, *srcs, "-o", so],
            capture_output=True, text=True, timeout=300)
        if r.returncode != 0:
            pytest.skip(f"oracle build failed: {r.stderr[-600:]}")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    drv = tmp_path / "drive.py"
    drv.write_text(_DRIVER)
    r = subprocess.run([sys.executable, str(drv), so, repo],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, (r.stderr[-2000:] or r.stdout[-500:])
    assert "all match" in r.stdout
