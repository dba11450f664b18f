"""Persistent XLA compilation cache.

The jitted pipelines are large graphs (a full FTP forward pass compiles in
minutes on first trace); enabling JAX's persistent cache makes every
subsequent process start in seconds.  Call before the first compilation.

Cache entries are stored under a per-host subdirectory keyed by the CPU's
feature flags (``host-<sha1 of /proc/cpuinfo flags>``): XLA:CPU AOT
executables bake in the build host's vector ISA (AVX-512 etc.), so loading an
entry compiled on a different machine can SIGILL.  The repo's ``.jax_cache``
directory travels across round hosts with the checkout, which made the
8-device CPU dryrun spew "Compile machine features ... doesn't match ...
could lead to execution errors such as SIGILL" loader errors in round 3
(MULTICHIP_r03.json tail).  Keying by host fingerprint means a new host
starts a fresh cache instead of deserializing foreign code; TPU entries get
the same treatment (harmless — the chip is tunneled from one host at a time).
"""
import hashlib
import os
import platform as _platform


def host_fingerprint() -> str:
    """Stable 12-hex id of this host's CPU architecture + feature flags."""
    txt = _platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith(("flags", "features")):
                    txt += ":" + " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha1(txt.encode()).hexdigest()[:12]


def enable(path: str = None) -> None:
    import jax

    if path is None:
        path = os.environ.get(
            "VISTAF_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"))
    path = os.path.join(path, f"host-{host_fingerprint()}")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization only
