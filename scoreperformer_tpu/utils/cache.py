"""Host-keyed persistent compile-cache directory.

XLA:CPU entries in jax's persistent compilation cache embed AOT machine code
specialized to the COMPILING host's CPU features. Deserializing them on a
different machine logs `cpu_aot_loader` feature-mismatch errors at best and
crashes at worst — observed in this project's CI: a cache written on an
AMX/AVX512 host segfaulted `compilation_cache.get_executable_and_time`
mid-test-suite on a host without those features. /tmp persists across
heterogeneous CI hosts here, so the cache directory must be keyed by a host
fingerprint: stale cross-host entries become unreachable and simply
recompile.
"""
from __future__ import annotations

import hashlib
import platform


def _host_fingerprint() -> str:
    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(line.strip())
                    break
    except OSError:
        pass
    try:
        import jax

        parts.append(jax.__version__)
    except Exception:
        pass
    # XLA:CPU AOT entries also embed compile OPTIONS (e.g. the axon
    # platform's +prefer-no-scatter/-gather): an entry written in a
    # TPU-platform session fails feature validation when loaded by a pure
    # JAX_PLATFORMS=cpu process on the SAME host. Key the directory by the
    # flag/platform environment as well so modes never share entries.
    import os

    parts.append(os.environ.get("XLA_FLAGS", ""))
    parts.append(os.environ.get("JAX_PLATFORMS", ""))
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:12]


def host_cache_dir(base: str = "/tmp/sp_jax_cache") -> str:
    """`base` suffixed with a (machine, cpu flags, jax version) fingerprint."""
    return f"{base}_{_host_fingerprint()}"


def enable_compile_cache(base: str = "/tmp/sp_jax_cache") -> str:
    """Point jax's persistent compile cache at the host-keyed directory."""
    import jax

    path = host_cache_dir(base)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return path
