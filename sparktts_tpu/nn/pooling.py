"""Statistics pooling layers: TAP / TSDP / TSTP / ASTP / MHASTP / MQMHASTP.

TPU rebuild of reference `sparktts/modules/speaker/pooling_layers.py:27-285`.
The shipped Spark-TTS checkpoint only uses ASTP-with-global-context (lives in
`nn/ecapa.py`); the rest complete the reference's pooling capability so any
`pooling_func` an ECAPA variant names is available.  Channels-last: all
inputs are (B, T, F) — the reference's (B, F, T) transposed.

The reference's 1x1 Conv1d attention stacks become plain linears over the
channel axis (identical math, MXU-friendly)."""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from sparktts_tpu.nn.ecapa import astp_apply, init_astp  # noqa: F401  (registry)
from sparktts_tpu.nn.layers import init_linear, linear_apply


# ---------------------------------------------------------------------------
# parameter-free pools (reference `pooling_layers.py:27-89`)
# ---------------------------------------------------------------------------


def tap_apply(x: jax.Array) -> jax.Array:
    """Temporal average pooling: (B, T, F) → (B, F)."""
    return jnp.mean(x, axis=1)


def tsdp_apply(x: jax.Array) -> jax.Array:
    """Temporal standard-deviation pooling (torch.var is unbiased)."""
    return jnp.sqrt(jnp.var(x, axis=1, ddof=1) + 1e-7)


def tstp_apply(x: jax.Array) -> jax.Array:
    """Temporal statistics pooling: mean ‖ std → (B, 2F) (x-vector style)."""
    return jnp.concatenate([tap_apply(x), tsdp_apply(x)], axis=-1)


# ---------------------------------------------------------------------------
# MHASTP (reference `pooling_layers.py:150-213`)
# ---------------------------------------------------------------------------


def init_mhastp(
    key,
    in_dim: int,
    layer_num: int = 2,
    head_num: int = 2,
    d_s: int = 1,
    bottleneck_dim: int = 64,
):
    """Multi-head attentive statistics pooling.  Per head: an MLP over each
    frame (1x1 convs in the reference) produces attention scores softmaxed
    over time."""
    assert in_dim % head_num == 0
    d_model = in_dim // head_num
    d_s = d_model if d_s > 1 else 1
    dims = [bottleneck_dim] * (layer_num + 1)
    dims[0], dims[-1] = d_model, d_s
    heads = []
    for h in range(head_num):
        keys = jax.random.split(jax.random.fold_in(key, h), layer_num)
        heads.append(
            [init_linear(keys[i], dims[i], dims[i + 1]) for i in range(layer_num)]
        )
    return {"heads": heads}


def mhastp_apply(p, x: jax.Array) -> jax.Array:
    """x: (B, T, F) → (B, 2F); heads attend over disjoint channel chunks."""
    head_num = len(p["heads"])
    chunks = jnp.split(x, head_num, axis=-1)
    outs: List[jax.Array] = []
    for head, chunk in zip(p["heads"], chunks):
        score = chunk
        for i, lin in enumerate(head):
            score = linear_apply(lin, score)
            if i < len(head) - 1:
                score = jnp.tanh(score)
        alpha = jax.nn.softmax(score, axis=1)  # over time
        mean = jnp.sum(alpha * chunk, axis=1)
        var = jnp.sum(alpha * chunk * chunk, axis=1) - mean**2
        std = jnp.sqrt(jnp.clip(var, min=1e-7))
        outs.append(jnp.concatenate([mean, std], axis=-1))
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# MQMHASTP (reference `pooling_layers.py:216-285`)
# ---------------------------------------------------------------------------


def init_mqmhastp(
    key,
    in_dim: int,
    layer_num: int = 2,
    query_num: int = 2,
    head_num: int = 8,
    d_s: int = 2,
    bottleneck_dim: int = 64,
):
    """Multi-query multi-head attentive statistics pooling."""
    return {
        "queries": [
            init_mhastp(
                jax.random.fold_in(key, q), in_dim, layer_num, head_num, d_s, bottleneck_dim
            )
            for q in range(query_num)
        ]
    }


def mqmhastp_apply(p, x: jax.Array) -> jax.Array:
    """x: (B, T, F) → (B, 2F * query_num)."""
    return jnp.concatenate([mhastp_apply(q, x) for q in p["queries"]], axis=-1)


# ---------------------------------------------------------------------------
# registry (reference selects by name via `getattr(pooling_layers, func)`,
# `ecapa_tdnn.py:178-180`)
# ---------------------------------------------------------------------------

POOLING_OUT_DIM = {
    "TAP": lambda d: d,
    "TSDP": lambda d: d,
    "TSTP": lambda d: 2 * d,
    "ASTP": lambda d: 2 * d,
    "MHASTP": lambda d: 2 * d,
    "MQMHASTP": lambda d, q=2: 2 * d * q,
}
