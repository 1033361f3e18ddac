"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes — this file is imported by
pytest before any test module.
"""

import os

# torch (libgomp) + XLA CPU thread pools deadlock on small hosts when both
# spin up OpenMP; pin to one thread before either library loads. (The
# reference needs the same workaround: /root/reference/test.py:16-17.)
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("KMP_BLOCKTIME", "0")

import jax  # noqa: E402

# Force the CPU backend: the machine env pins JAX_PLATFORMS=axon (the TPU
# tunnel), and only the config update reliably overrides it. 8 virtual CPU
# devices for multi-chip sharding tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

jax.config.update("jax_enable_x64", False)
# Full-f32 matmuls/convs in tests — the backend default rounds operands to
# bfloat16 (TPU-style), which breaks parity assertions against torch.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache across pytest runs (first-compile on this
# 1-CPU host is very slow). Uses the per-host-arch CPU dir — see
# diffmvs_tpu/utils/compile_cache.py for why CPU and TPU caches are split.
from diffmvs_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache("cpu")

# Force backend init BEFORE any test module imports torch: creating the XLA
# CPU client after torch (OpenMP) is loaded stalls for minutes on small hosts.
jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: benchmark-resolution tests (run with --run-slow "
        "or RUN_SLOW=1; several minutes each on this 1-CPU host)")


def pytest_addoption(parser):
    parser.addoption("--run-slow", action="store_true", default=False,
                     help="run tests marked slow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow (pass --run-slow or RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
