"""Make JAX_PLATFORMS reliable for CLI subprocesses.

On hosts where a site hook (e.g. an accelerator tunnel's sitecustomize)
imports and registers backends before user code runs, the JAX_PLATFORMS
environment variable alone does not reliably select the platform — the
config value must ALSO be set before the first device touch
(tests/conftest.py does this for pytest). Every ``python -m`` entry point
in this package calls :func:`honor_jax_platforms_env` first, so
subprocess-driven e2e tests (train CLI, preprocess CLI) that export
``JAX_PLATFORMS=cpu`` never silently initialize — or hang on — a remote
accelerator backend.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """Pin jax's platform config to $JAX_PLATFORMS if it is set.

    No-op when the variable is unset or devices were already initialized
    consistently; safe to call multiple times."""
    plats = os.environ.get("JAX_PLATFORMS")
    if not plats:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plats)
    except RuntimeError:
        # backends already initialized — too late to switch; leave as-is
        pass
