"""Honor the JAX_PLATFORMS env var in CLI entrypoints.

In some TPU images a sitecustomize hook registers the accelerator backend in
every Python interpreter and the plain ``JAX_PLATFORMS`` environment variable
no longer selects the platform — ``jax.config.update("jax_platforms", ...)``
is the only switch that sticks. That breaks the standard pattern of running a
CLI under ``JAX_PLATFORMS=cpu`` (tests, CI, machines where the accelerator
tunnel is down). Every CLI main() in this package calls
:func:`apply_platform_env` before its first jax use so the env var behaves
the way users expect.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    """Force jax onto the platform named by ``$JAX_PLATFORMS``, if set.

    Must run before the backend is initialized (i.e. at the top of main(),
    before any jax array op). A no-op when the variable is unset or the
    config update is rejected because a backend is already live — in that
    case the process keeps whatever platform it already has.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:  # backend already initialized; keep it
        pass
