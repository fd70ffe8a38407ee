"""Device mesh construction.

TPU-native replacement for the reference's NCCL/MPI-based deployment mapping
(reference `runtime/triton_trtllm/scripts/convert_checkpoint.py:252-274`
Mapping(tp_size, pp_size) delegated to TensorRT-LLM).  Here the mapping is a
`jax.sharding.Mesh` with named axes; collectives are inserted by XLA from
sharding annotations (GSPMD), riding ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """2-D (dp, tp) mesh.  Defaults: tp = min(n, num_kv_heads-friendly 2) and
    dp = n // tp over all visible devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None:
        tp = 2 if n % 2 == 0 and n > 1 else 1
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp*tp={dp * tp} != devices={n}"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
