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
    plat = os.environ.get("JAX_PLATFORMS", "").strip()
    if not plat:
        return
    import jax
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
