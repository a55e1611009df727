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


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Persist XLA compilations on disk so process restarts are warm.

    The first compile of the 28-step FLUX scan is ~6-8 minutes on TPU; with
    the persistent cache a serving restart (same shapes/config) replays the
    compiled executable in seconds. The reference has no analogue (torch
    eager); for a long-running service this is the cold-start lever.

    Directory resolution: explicit arg > ``$GIE_COMPILE_CACHE`` > the
    repo-local ``.jax_cache`` (shared with bench.py / profile scripts so CLI
    runs reuse bench-warmed executables). Safe to call multiple times and
    after backend init; failures are non-fatal.
    """
    try:
        import jax

        d = cache_dir or os.environ.get("GIE_COMPILE_CACHE")
        if not d:
            d = os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                ".jax_cache",
            )
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
