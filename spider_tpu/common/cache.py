"""Persistent-compilation-cache setup, keyed by a machine fingerprint.

Round-4 driver bench failure mode (BENCH_r04.json): a flat /root/repo/.jax_cache
shared across machines made XLA:CPU try to load AOT executables compiled on a
different host — each load failed with a multi-KB machine-feature-mismatch
error on stderr (flooding the driver's tail window) and stalled the run.
Entries here are therefore namespaced by (jax version, arch, cpu flags): a
process on a different machine simply sees an empty cache and compiles fresh,
which is slower but silent and correct.
"""

import hashlib
import os
import platform

DEFAULT_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def machine_fingerprint() -> str:
    import jax

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line.strip()
                    break
    except OSError:
        pass
    key = f"{jax.__version__}|{platform.machine()}|{flags}"
    return hashlib.sha256(key.encode()).hexdigest()[:12]


def setup_compilation_cache(root: str = DEFAULT_ROOT,
                            min_compile_secs: float = 1.0) -> str:
    """Point jax's persistent cache at a per-machine subdir of `root`."""
    import jax

    path = os.path.join(root, machine_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
