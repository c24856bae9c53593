"""Driver entry-point regression tests.

Round-1 failure mode (VERDICT.md #1): the driver calls dryrun_multichip(8)
from a process whose JAX backend is already initialized with fewer devices
(one real TPU behind a tunnel).  The fix re-execs the dry run in a fresh
subprocess that forces an n-device virtual CPU platform before any backend
init; these tests pin that behavior.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_inprocess():
    """Plain call path — conftest already forced an 8-device CPU pool, but
    the subprocess re-exec must work regardless."""
    sys.path.insert(0, REPO)
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(4)


@pytest.mark.slow
def test_dryrun_multichip_after_small_backend_init():
    """Simulate the driver: parent initializes a 1-device backend first,
    then asks for an 8-device dry run."""
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) >= 1\n"  # backend initialized, small pool
        "import sys\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
    )
    env = dict(os.environ)
    # parent env has NO force_host flag -> 1 CPU device, like the driver's
    # single-TPU terminal
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip OK on 8 devices" in r.stdout


def test_entry_compiles():
    sys.path.insert(0, REPO)
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (128, 1024, 3)
