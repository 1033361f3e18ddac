"""Persistent-compile-cache setup shared by tests, bench and driver entry.

TPU programs cache under one shared dir (compiles are host-independent and
cold full-res compiles take 15-45 min, so the cache must survive host
migrations). XLA:CPU programs are AOT-compiled against the host's exact CPU
flags; after a VM migration every lookup of a stale entry logs a large
machine-feature-mismatch error and risks SIGILL, so the CPU cache dir is
keyed by a hash of /proc/cpuinfo flags — a new host simply starts cold.
"""

import hashlib
import os

TPU_CACHE_DIR = "/root/.cache/jax_comp"


def cpu_cache_dir() -> str:
    # Hash the stable CPU-identity lines, not just the flags line: LLVM
    # tuning features (prefer-no-gather/scatter etc.) are chosen per CPU
    # model/microcode, so two hosts with identical flags can still produce
    # incompatible AOT entries (observed: 236 mismatch errors on a migrated
    # VM with a flags-only key). Volatile lines (cpu MHz, bogomips) are
    # excluded so the key survives reboots.
    keys = ("vendor_id", "cpu family", "model", "model name", "stepping",
            "microcode", "flags")
    try:
        with open("/proc/cpuinfo") as f:
            block = f.read().split("\n\n", 1)[0]
        ident = "\n".join(l for l in block.splitlines()
                          if l.split(":")[0].strip() in keys)
        tag = hashlib.sha1(ident.encode()).hexdigest()[:10]
    except OSError:
        tag = "noflags"
    return f"/root/.cache/jax_comp_cpu_{tag}"


def enable_compile_cache(backend: str = "") -> str:
    """Point jax's persistent cache at the right dir; returns the dir.

    backend: "" = auto-detect from the initialized jax backend (platform
    "cpu" gets the per-host dir, anything else the shared TPU dir).
    """
    import jax

    if not backend:
        try:
            backend = jax.default_backend()
        except Exception:
            backend = "tpu"
    path = cpu_cache_dir() if backend == "cpu" else TPU_CACHE_DIR
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    return path
