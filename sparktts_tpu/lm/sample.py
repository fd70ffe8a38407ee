"""Token sampling: temperature + top-k + top-p, HF-semantics.

Replaces the reference's HF LogitsProcessor chain (reference
`cli/SparkTTS.py:197-204`: do_sample, top_k=50, top_p=0.95, temperature=0.8).
The nucleus filter runs inside the top-k support (k is small and static), so
the full-vocab sort HF performs collapses to a k-element sort — the only
full-vocab op left is one `top_k` scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9

_CHUNK = 2048  # per-chunk width for the two-stage top-k utility


def topk_two_stage(x: jax.Array, k: int):
    """Exact top-k over a large last axis in two stages: per-chunk top-k then
    top-k over the chunk winners.  Exact because every global top-k element is
    necessarily in its own chunk's top-k.  (Measured neutral vs flat lax.top_k
    on v5e at V=166k — kept as a utility; the sampler uses the flat path.)"""
    b, v = x.shape
    c = max(_CHUNK, k)
    n = -(-v // c)
    pad = n * c - v
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=NEG_INF)
    xc = x.reshape(b, n, c)
    vals1, idx1 = jax.lax.top_k(xc, k)            # (B, n, k)
    vals1f = vals1.reshape(b, n * k)
    idx1f = idx1.reshape(b, n * k)
    vals2, pos = jax.lax.top_k(vals1f, k)          # (B, k) over chunk winners
    chunk = pos // k
    within = jnp.take_along_axis(idx1f, pos, axis=1)
    return vals2, chunk * c + within


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

    `rng` may be a single raw key (2,) — one gumbel draw over the whole
    batch, the classic path — or a PER-ROW raw key batch (B, 2): each row's
    draw then depends only on its own key, making a row's sample stream
    invariant to batch composition (requests with distinct seeds can share
    one program; see pipeline.generate_tokens_batch).
    """
    scaled = logits / temperature
    # measured on v5e: flat top_k over the 166k vocab is not the decode
    # bottleneck, and the two-stage variant compiled slower — keep it simple.
    # guided decoding can shrink the vocab axis below k — clamp (static).
    top_k = min(top_k, logits.shape[-1])
    vals, idx = jax.lax.top_k(scaled, top_k)  # (B, k) descending

    # nucleus within the top-k support (HF TopPLogitsWarper semantics: keep
    # the smallest prefix with cumulative prob > top_p; first always kept)
    probs = jax.nn.softmax(vals, axis=-1)
    cum_exclusive = jnp.cumsum(probs, axis=-1) - probs
    keep = cum_exclusive < top_p
    keep = keep.at[:, 0].set(True)
    filtered = jnp.where(keep, vals, NEG_INF)

    if rng.ndim == 2:  # per-row keys
        choice = jax.vmap(jax.random.categorical)(rng, filtered)  # (B,)
    else:
        choice = jax.random.categorical(rng, filtered, axis=-1)  # (B,)
    return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)


def greedy_token(logits: jax.Array) -> jax.Array:
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def warped_probs(
    logits: jax.Array,       # (B, V) fp32
    temperature: float | jax.Array,
    top_k: int,
    top_p: float | jax.Array,
) -> jax.Array:
    """The full (B, V) probability vector the temperature→top-k→top-p chain
    samples from (zero outside the warped support).  `sample_token` draws
    from exactly this distribution; speculative sampling needs it explicitly
    for its acceptance ratios."""
    b, v = logits.shape
    scaled = logits / temperature
    top_k = min(top_k, v)
    vals, idx = jax.lax.top_k(scaled, top_k)
    probs = jax.nn.softmax(vals, axis=-1)
    cum_exclusive = jnp.cumsum(probs, axis=-1) - probs
    keep = cum_exclusive < top_p
    keep = keep.at[:, 0].set(True)
    filtered = jnp.where(keep, vals, NEG_INF)
    kept = jax.nn.softmax(filtered, axis=-1)  # renormalized over survivors
    out = jnp.zeros((b, v), kept.dtype)
    return out.at[jnp.arange(b)[:, None], idx].set(kept)
