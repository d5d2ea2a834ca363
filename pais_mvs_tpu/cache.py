"""Persistent-compilation-cache helpers.

JAX's persistent cache key does not fold the HOST's CPU feature set, and
XLA:CPU AOT executables are compiled for the machine that produced them.
A cache directory shared across heterogeneous hosts (this project's
working volume migrates between VMs) therefore serves executables using
ISA extensions the current host lacks — cpu_aot_loader warns, and
execution SIGILLs/segfaults (observed: an avx512/amx-built refine program
crashing a plain-avx512 host mid-test-suite). Key the directory by a
host-CPU fingerprint so each machine population is disjoint.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _cpu_fingerprint() -> str:
    """Stable short id of the host ISA: machine arch + CPU flags."""
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{platform.machine()}|{feats}".encode()
    return hashlib.blake2s(raw, digest_size=6).hexdigest()


def compile_cache_dir(base: str | None = None) -> str:
    """Machine-keyed persistent cache directory (created on demand)."""
    if base is None:
        base = os.path.join(os.path.expanduser("~"), ".cache",
                            "pais_mvs_tpu_jax")
    path = os.path.join(base, f"host-{_cpu_fingerprint()}")
    os.makedirs(path, exist_ok=True)
    return path


def enable_persistent_cache(base: str | None = None,
                            min_compile_secs: float = 5.0) -> None:
    """Point JAX's persistent cache at the machine-keyed directory.

    Respects an explicit ``jax_compilation_cache_dir`` already set by the
    caller/harness (same contract as the package's JAX_PLATFORMS handling).
    """
    import jax

    try:
        # CPU-only runs never engage the persistent cache: XLA:CPU AOT
        # deserialization is the segfault path (cross-host ISA mismatch,
        # and observed even same-host within one pytest run), and CPU
        # compiles are cheap. The cache exists for the slow axon remote
        # compiles. jax.config.jax_platforms is consulted (not the
        # backend) so this never triggers backend init — which hangs
        # when the tunnel is down. jax_platforms=None (a host with no
        # plugin forcing a platform list) defaults to the CPU backend,
        # so require an EXPLICIT non-cpu platform before enabling.
        plats = jax.config.jax_platforms
        if plats is None or not (set(plats.split(",")) - {"cpu"}):
            return
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir",
                              compile_cache_dir(base))
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              float(min_compile_secs))
    except Exception:
        pass
