"""Platform selection helper.

In this environment the axon TPU plugin registers itself so early that
the JAX_PLATFORMS *environment variable* is sometimes ignored; the
jax.config route still works until the backend initializes. Every CLI
calls :func:`apply_platform_env` before its first device query so
`JAX_PLATFORMS=cpu python train.py ...` behaves as expected.
"""

from __future__ import annotations

import os


def apply_platform_env():
    import jax

    # persistent XLA compilation cache: first compile of SSD300 is
    # ~30-60s; cached reruns of any CLI start in seconds. Opt out with
    # ODTPU_NO_COMPILE_CACHE=1.
    opt_out = os.environ.get("ODTPU_NO_COMPILE_CACHE", "").strip().lower()
    if opt_out not in ("1", "true", "yes"):
        cache = os.environ.get("ODTPU_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/odtpu-xla"))
        try:
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
        except Exception:
            pass

    plat = os.environ.get("JAX_PLATFORMS", "").strip()
    if not plat:
        return
    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass
    if plat == "cpu":
        n = os.environ.get("ODTPU_CPU_DEVICES", "")
        if n.isdigit():
            try:
                jax.config.update("jax_num_cpu_devices", int(n))
            except Exception:
                pass
