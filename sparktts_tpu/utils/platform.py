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
