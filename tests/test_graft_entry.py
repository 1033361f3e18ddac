"""Regression tests for the driver entry points (__graft_entry__.py).

The r4 regression: dryrun_multichip asserted "need 8 devices, have 1"
because enable_compile_cache()'s backend auto-detect initialized the
host-pinned platform before the CPU-forcing config updates ran. These
tests run the dryrun in a subprocess with JAX_PLATFORMS pinned to a
non-cpu string to prove the forcing now wins regardless of host env.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_dryrun(extra_env):
    env = dict(os.environ)
    env.update(extra_env)
    # the dryrun must not rely on conftest's CPU forcing — drop pytest's
    # XLA_FLAGS device-count injection so only __graft_entry__ forces it
    env.pop("XLA_FLAGS", None)
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(4)\n" % REPO
    )
    return subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=1200)


@pytest.mark.slow
def test_dryrun_forces_cpu_under_pinned_platform():
    """JAX_PLATFORMS pinned to a bogus single-chip-style platform: the
    dryrun must still see 4 virtual CPU devices and complete all three
    checks (GSPMD step, shard_map step, sharded inference)."""
    r = _run_dryrun({"JAX_PLATFORMS": "definitely_not_cpu"})
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "mesh=(2,2)" in r.stdout
    assert "shard_map dp=4" in r.stdout
    assert "sharded inference" in r.stdout


@pytest.mark.slow
def test_dryrun_plain_env():
    """No special env: the documented driver invocation path."""
    r = _run_dryrun({})
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert r.stdout.count("OK") >= 3
