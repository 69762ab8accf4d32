"""Machine-keyed persistent XLA compilation cache.

XLA:CPU AOT executables embed the compile host's CPU feature set; loading
one on a different microarch makes the cpu_aot_loader warn of possible
SIGILL on every run.  Keying the cache directory by the host's CPU flags
keeps warm-start compile latency without ever crossing machines.
"""

import hashlib
import os


def machine_key() -> str:
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


def setup_compile_cache(root: str, min_compile_secs: float = 0.5) -> str:
    """Point JAX's persistent compilation cache at `<root>/.jax_cache/<key>`.

    Must run before the first compilation.  Returns the cache dir."""
    import jax

    cache = os.path.join(root, ".jax_cache", machine_key())
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache
