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
    pp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """3-D (dp, tp, pp) mesh.  Defaults: pp = 1, tp = 2 on even device counts,
    dp = n // (tp * pp) over all visible devices.

    'pp' shards the transformer's stacked layer dimension (inter-layer model
    parallelism — the reference exposes the same axis as TensorRT-LLM's
    --pp_size, `convert_checkpoint.py:25-28`).  The 0.5B model never needs it
    (PARITY.md §2.3); the axis exists so larger LMs drop in."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None:
        tp = 2 if (n // pp) % 2 == 0 and n // pp > 1 else 1
    if dp is None:
        dp = n // (tp * pp)
    assert dp * tp * pp == n, f"dp*tp*pp={dp * tp * pp} != devices={n}"
    arr = np.asarray(devices).reshape(dp, tp, pp)
    return Mesh(arr, axis_names=("dp", "tp", "pp"))


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
