"""Multi-host (pod-slice) mesh construction.

Single-host meshes (`parallel/mesh.py`) cover one TPU board; pods add a DCN
dimension.  The recipe: `jax.distributed.initialize()` per host, then build a
mesh whose OUTER axis spans hosts (data-parallel over DCN — cheap collectives
only) and whose INNER axes stay within a host's ICI domain (tensor parallel —
bandwidth-hungry collectives ride ICI).  `qwen_param_specs` shardings apply
unchanged: 'tp' never crosses the host boundary by construction.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed.  On Cloud TPU pods the arguments are
    auto-detected from the metadata server; pass them explicitly elsewhere."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    logger.info(
        "distributed: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def make_multihost_mesh(tp: Optional[int] = None) -> Mesh:
    """(dp, tp) mesh over all global devices with tp confined to one host.

    dp = hosts × (local_devices // tp) spans DCN+ICI; tp spans ICI only.
    """
    local = jax.local_device_count()
    if tp is None:
        tp = 2 if local % 2 == 0 and local > 1 else 1
    assert local % tp == 0, f"tp={tp} must divide local devices {local}"
    # jax.devices() orders devices host-major, so reshaping (hosts*local/tp, tp)
    # keeps each tp group within one host's ICI domain
    devices = np.asarray(jax.devices()).reshape(-1, tp)
    return Mesh(devices, axis_names=("dp", "tp"))
