"""Machine-keyed persistent XLA compilation cache.

XLA:CPU AOT executables embed the compile host's CPU feature set; loading
one on a different microarch makes the cpu_aot_loader warn of possible
SIGILL on every run.  Keying the cache directory by the host's CPU flags
keeps warm-start compile latency without ever crossing machines.
"""

import hashlib
import os


def machine_key() -> str:
    """Key the cache dir by host identity, not just the cpuinfo flags.

    Round-5 postmortem: two VM instances shared an identical
    /proc/cpuinfo flags line while XLA chose different target features
    (+prefer-no-gather/…), so the flags-only key COLLIDED and loading the
    other host's AOT executables crashed pytest workers with SIGILL.
    Hostname + jaxlib version makes the key per-VM: each fresh VM starts
    cold (correctness over warmth — the cache's value is within-session)."""
    import platform
    parts = [platform.node(), platform.processor()]
    try:
        import jaxlib
        parts.append(getattr(jaxlib, "__version__", ""))
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    parts.append(line)
                    break
    except OSError:
        pass
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:12]


def setup_compile_cache(root: str, min_compile_secs: float = 0.5,
                        suffix: str = "") -> str:
    """Point JAX's persistent compilation cache at `<root>/.jax_cache/<key>`.

    Must run before the first compilation.  Returns the cache dir.

    `suffix` segregates independent process populations (e.g. the pytest
    suite vs TPU bench processes): a worker aborted inside
    put_executable_and_time when both hammered one directory concurrently,
    and the populations share no entries anyway (backend is part of the
    entry key)."""
    import jax

    cache = os.path.join(root, ".jax_cache", machine_key() + suffix)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache
