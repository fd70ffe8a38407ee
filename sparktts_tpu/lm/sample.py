"""Token sampling: temperature + top-k + top-p, HF-semantics.

Replaces the reference's HF LogitsProcessor chain (reference
`cli/SparkTTS.py:197-204`: do_sample, top_k=50, top_p=0.95, temperature=0.8).
The nucleus filter runs inside the top-k support (k is small and static), so
the full-vocab sort HF performs collapses to a k-element sort — the only
full-vocab op left is one `top_k` scan.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def sample_token(
    rng: jax.Array,
    logits: jax.Array,       # (B, V) fp32
    temperature: float | jax.Array,
    top_k: int,              # static
    top_p: float | jax.Array,
) -> jax.Array:
    """Returns sampled token ids (B,) int32.

    Chain order matches HF: temperature → top-k → top-p → categorical.
    top_k must be static (it sizes the sorted slice).  temperature == 0 is
    handled by `greedy_token` at the call site.
    """
    scaled = logits / temperature
    vals, idx = jax.lax.top_k(scaled, top_k)  # (B, k) descending

    # nucleus within the top-k support (HF TopPLogitsWarper semantics: keep
    # the smallest prefix with cumulative prob > top_p; first always kept)
    probs = jax.nn.softmax(vals, axis=-1)
    cum_exclusive = jnp.cumsum(probs, axis=-1) - probs
    keep = cum_exclusive < top_p
    keep = keep.at[:, 0].set(True)
    filtered = jnp.where(keep, vals, NEG_INF)

    choice = jax.random.categorical(rng, filtered, axis=-1)  # (B,)
    return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)


def greedy_token(logits: jax.Array) -> jax.Array:
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
