"""AutoExposure / BeamUniformityCorrector parity vs the reference's
COMPILED image_processing.cpp (oracle pattern, like tests/
test_normals_conformance.py and test_xyzlut_oracle.py).

Both are stateful (exponential smoothing, update-every counters); the
tests run multi-frame sequences and assert exact equality. This oracle
exposed a real divergence: the reference's "linear fit" detrend in
compute_dark_count is an Eigen FullPivLU::solve of the overdetermined
[1, i] system — an exact solve of the two pivot rows, NOT least squares —
now replicated in ops/image_processing._full_piv_lu_solve.
"""

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np
import pytest

REF = "/root/reference"
SRC = os.path.join(REF, "ouster_client/src/image_processing.cpp")
EIGEN_INC = "/opt/venv/lib/python3.12/site-packages/tensorflow/include"

_WRAP = r"""
#include "ouster/image_processing.h"
#include <cstring>
using namespace ouster::sdk::core::image;
using RowArr = Eigen::Array<double, Eigen::Dynamic, Eigen::Dynamic,
                            Eigen::RowMajor>;

extern "C" void* ae_new(double lo, double hi, int update_every) {
    return new AutoExposure(lo, hi, update_every);
}
extern "C" void ae_apply(void* ae, double* img, long h, long w,
                         int update_state) {
    Eigen::Map<RowArr> m(img, h, w);
    Eigen::Ref<RowArr> ref(m);
    ((AutoExposure*)ae)->update(ref, update_state);
}
extern "C" void ae_free(void* ae) { delete (AutoExposure*)ae; }

extern "C" void* buc_new() { return new BeamUniformityCorrector(); }
extern "C" void buc_apply(void* b, double* img, long h, long w,
                          int update_state) {
    Eigen::Map<RowArr> m(img, h, w);
    Eigen::Ref<RowArr> ref(m);
    ((BeamUniformityCorrector*)b)->update(ref, update_state);
}
extern "C" void buc_free(void* b) { delete (BeamUniformityCorrector*)b; }
"""


def _build_oracle():
    if not (os.path.exists(SRC) and os.path.isdir(EIGEN_INC)):
        return None
    key = hashlib.sha256(_WRAP.encode() +
                         open(SRC, "rb").read()).hexdigest()[:16]
    so = os.path.join(tempfile.gettempdir(), f"imgproc_oracle_{key}.so")
    if not os.path.exists(so):
        wrap = so + ".cpp"
        with open(wrap, "w") as f:
            f.write(_WRAP)
        r = subprocess.run(
            ["g++", "-O2", "-std=c++14", "-shared", "-fPIC",
             "-Wl,--no-undefined", f"-I{EIGEN_INC}",
             f"-I{os.path.join(REF, 'ouster_client/include')}",
             f"-I{os.path.join(REF, 'ouster_client/include/optional-lite')}",
             wrap, SRC, "-o", so],
            capture_output=True, text=True, timeout=300)
        if r.returncode != 0:
            return None
    return so


_DRIVER = r'''
import ctypes, sys
import numpy as np

so = sys.argv[1]
c = ctypes
lib = ctypes.CDLL(so)
lib.ae_new.restype = c.c_void_p
lib.ae_new.argtypes = [c.c_double, c.c_double, c.c_int]
lib.ae_apply.argtypes = [c.c_void_p, c.c_void_p, c.c_long, c.c_long, c.c_int]
lib.ae_free.argtypes = [c.c_void_p]
lib.buc_new.restype = c.c_void_p
lib.buc_apply.argtypes = [c.c_void_p, c.c_void_p, c.c_long, c.c_long,
                          c.c_int]
lib.buc_free.argtypes = [c.c_void_p]

import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, sys.argv[2])
from ouster_sdk_tpu.ops.image_processing import (AutoExposure,
                                                 BeamUniformityCorrector)


def ptr(a):
    return a.ctypes.data_as(c.c_void_p)


rng = np.random.default_rng(0)
h, w = 64, 512

# AutoExposure: 8 stateful frames, exact equality
ours = AutoExposure()
ref = lib.ae_new(0.1, 0.1, 3)
for it in range(8):
    img = rng.gamma(2.0, 500.0, (h, w)) * (1 + 0.1 * it)
    img[rng.random((h, w)) < 0.1] = 0
    a = np.ascontiguousarray(img.copy()); b = img.copy()
    lib.ae_apply(ref, ptr(a), h, w, 1)
    ours(b)
    assert (a == b).all(), f"AE frame {it}: {np.abs(a-b).max()}"
# frozen-state application (viz pause path)
img = rng.gamma(2.0, 300.0, (h, w))
a = np.ascontiguousarray(img.copy()); b = img.copy()
lib.ae_apply(ref, ptr(a), h, w, 0)
ours(b, update_state=False)
assert (a == b).all(), "AE frozen-state"
lib.ae_free(ref)

# BeamUniformityCorrector: 10 stateful frames incl. masked columns
ours_b = BeamUniformityCorrector()
refb = lib.buc_new()
for it in range(10):
    img = rng.gamma(2.0, 500.0, (h, w)) + np.linspace(0, 200, h)[:, None]
    if it == 4:
        img[:, :100] = 0
    a = np.ascontiguousarray(img.copy()); b = img.copy()
    lib.buc_apply(refb, ptr(a), h, w, 1)
    ours_b(b)
    assert (a == b).all(), f"BUC frame {it}: {np.abs(a-b).max()}"
lib.buc_free(refb)
print("image-processing oracle: all exact")
'''


def test_image_processing_matches_compiled_reference(tmp_path):
    """Exact-equality oracle run (subprocess: the oracle .so and pytest's
    in-process extension set interact badly when co-loaded)."""
    import sys

    so = _build_oracle()
    if so is None:
        pytest.skip("reference sources / Eigen headers unavailable")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    drv = tmp_path / "drive.py"
    drv.write_text(_DRIVER)
    r = subprocess.run([sys.executable, str(drv), so, repo],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "all exact" in r.stdout
