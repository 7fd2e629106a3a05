"""Platform selection that actually takes effect.

With the remote-TPU (axon) plugin installed, a bare ``JAX_PLATFORMS=cpu``
environment variable does NOT stop jax from constructing the TPU client —
backend discovery still builds it, which serializes ~6-7 minutes of
tunnel setup into every CPU-only process (measured: `jax.devices()` takes
6m40s with the env var alone vs 2s after
``jax.config.update('jax_platforms', 'cpu')``). Every CLI/tool entry
point therefore mirrors the env var into the jax config BEFORE the first
backend touch. Same recipe as tests/conftest.py and
__graft_entry__._respawn_on_virtual_cpu_mesh.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    """Mirror JAX_PLATFORMS into jax.config before backend init (no-op
    when unset or when the backend is already initialized)."""
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        import jax
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # backend already initialized; the env var did its best
