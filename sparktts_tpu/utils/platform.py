"""Backend platform selection for entry-point scripts.

Some environments force-register an accelerator platform from sitecustomize
and pin ``jax_platforms`` before user code runs, so the ``JAX_PLATFORMS`` env
var alone is ignored.  Entry points call :func:`apply_platform_env` FIRST —
before any jax API that initializes backends — to honor an explicit
``SPARKTTS_PLATFORM`` (or ``JAX_PLATFORMS``) choice, e.g. ``cpu`` for smoke
flows on machines whose accelerator is shared or tunneled.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def apply_platform_env() -> str | None:
    """Pin jax to $SPARKTTS_PLATFORM / $JAX_PLATFORMS if set.  Returns the
    platform applied (None = leave the default)."""
    enable_compile_cache()
    plat = os.environ.get("SPARKTTS_PLATFORM") or os.environ.get("JAX_PLATFORMS")
    if not plat:
        return None
    import jax

    try:
        jax.config.update("jax_platforms", plat)
        logger.info("pinned jax platform to %s", plat)
        return plat
    except Exception as e:  # backends already initialized
        logger.warning("could not pin platform %s: %s", plat, e)
        return None


def _default_cache_dir() -> str:
    # repo-local so it survives /tmp cleanup between host sessions; falls
    # back to /tmp when the package is installed somewhere read-only
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidate = os.path.join(root, ".jax_cache")
    parent_writable = os.access(root, os.W_OK)
    return candidate if parent_writable else "/tmp/jax_comp_cache"


def enable_compile_cache(default_dir: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache for this process.

    Cold-starting the full LLM program costs minutes of XLA compile; the
    persistent cache cuts repeat process launches (server restarts, CLI
    invocations) to a disk read.  Directory override: $SPARKTTS_COMPILE_CACHE
    (empty string disables).  Idempotent; safe before or after backend init.
    """
    cache_dir = os.environ.get(
        "SPARKTTS_COMPILE_CACHE", default_dir or _default_cache_dir()
    )
    if not cache_dir:
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        logger.warning("could not enable compile cache at %s: %s", cache_dir, e)
