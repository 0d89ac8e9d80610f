"""Process-wide JAX configuration: persistent compilation cache.

First compiles of the big train/eval graphs cost minutes on a
remote-attached TPU; the on-disk executable cache makes every later
process start warm (verified working with the axon PJRT backend).
Called once from runner construction and the CLI.
"""
from __future__ import annotations

import os

_DONE = False


def setup_jax(cache_dir: str = "") -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax
    cache_dir = (cache_dir or os.getenv("SALT_TPU_COMPILE_CACHE")
                 or os.path.expanduser("~/.cache/salt_tpu_xla"))
    try:
        platform = jax.devices()[0].platform
        if platform == "cpu":
            # CPU AOT cache entries record the compile-time target
            # feature set, which follows the process's XLA_FLAGS; a
            # reload under different flags warns about possible SIGILL.
            # Keying the dir by the flags keeps reuse safe.
            # ... and by a host-CPU fingerprint: AOT entries also bake in
            # the compile host's CPU feature set, so reuse on a different
            # host (driver machines vary) risks SIGILL.
            import hashlib
            cpu = ""
            try:
                with open("/proc/cpuinfo") as f:
                    for line in f:
                        if line.startswith("flags"):
                            cpu = line
                            break
                        if line.startswith("model name") and not cpu:
                            cpu = line
            except OSError:
                pass
            tag = hashlib.sha1(
                (os.environ.get("XLA_FLAGS", "") + "|" + cpu)
                .encode()).hexdigest()[:12]
            cache_dir = os.path.join(cache_dir, f"cpu-{tag}")
        else:
            cache_dir = os.path.join(cache_dir, platform)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:   # cache support is best-effort
        pass
