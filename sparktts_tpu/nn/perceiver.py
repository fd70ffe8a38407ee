"""Perceiver resampler: 32 learned latents cross-attend over ECAPA features.

TPU rebuild of reference `sparktts/modules/speaker/perceiver_encoder.py`
(Attend/Attention `:52-294`, PerceiverResampler `:297-350`).  Attention here
is a plain XLA softmax attention — the sequence is ~300 frames × 32 queries,
far below the regime where a Pallas flash kernel pays off.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sparktts_tpu.nn.layers import gelu, init_linear, l2norm_scale_apply, linear_apply


def init_attention(key, dim: int, dim_head: int, heads: int):
    k_q, k_kv, k_out = jax.random.split(key, 3)
    inner = dim_head * heads
    return {
        "to_q": init_linear(k_q, dim, inner, bias=False),
        "to_kv": init_linear(k_kv, dim, inner * 2, bias=False),
        "to_out": init_linear(k_out, inner, dim, bias=False),
    }


def attention_apply(p, x, context, heads: int):
    """Cross-attention with queries included in the context (reference
    `perceiver_encoder.py:280-294` with cross_attn_include_queries=True).

    x: (B, N, D) latents; context: (B, M, D) → (B, N, D).
    """
    ctx = jnp.concatenate([x, context], axis=1)
    q = linear_apply(p["to_q"], x)
    kv = linear_apply(p["to_kv"], ctx)
    k, v = jnp.split(kv, 2, axis=-1)

    b, n, inner = q.shape
    dim_head = inner // heads
    q = q.reshape(b, n, heads, dim_head).transpose(0, 2, 1, 3)
    k = k.reshape(b, -1, heads, dim_head).transpose(0, 2, 1, 3)
    v = v.reshape(b, -1, heads, dim_head).transpose(0, 2, 1, 3)

    scale = dim_head**-0.5
    sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
    return linear_apply(p["to_out"], out)


def init_feed_forward(key, dim: int, mult: int = 4):
    """GEGLU feed-forward (reference `perceiver_encoder.py:232-251`)."""
    k1, k2 = jax.random.split(key)
    inner = int(dim * mult * 2 / 3)
    return {"w1": init_linear(k1, dim, inner * 2), "w2": init_linear(k2, inner, dim)}


def feed_forward_apply(p, x):
    h = linear_apply(p["w1"], x)
    a, gate = jnp.split(h, 2, axis=-1)
    return linear_apply(p["w2"], gelu(gate) * a)


def init_perceiver_resampler(
    key,
    dim: int,
    dim_context: int,
    num_latents: int = 32,
    depth: int = 2,
    dim_head: int = 64,
    heads: int = 8,
    ff_mult: int = 4,
):
    keys = jax.random.split(key, depth * 2 + 2)
    p = {
        "latents": 0.02 * jax.random.normal(keys[0], (num_latents, dim)),
        "layers": [
            {
                "attn": init_attention(keys[2 + 2 * i], dim, dim_head, heads),
                "ff": init_feed_forward(keys[3 + 2 * i], dim, ff_mult),
            }
            for i in range(depth)
        ],
        "norm": {"gamma": jnp.ones((dim,))},
    }
    if dim_context != dim:
        p["proj_context"] = init_linear(keys[1], dim_context, dim)
    return p


def perceiver_resampler_apply(p, x, heads: int = 8):
    """x: (B, M, dim_context) → (B, num_latents, dim)
    (reference `perceiver_encoder.py:339-350`)."""
    if "proj_context" in p:
        x = linear_apply(p["proj_context"], x)
    b = x.shape[0]
    dim = p["latents"].shape[-1]
    latents = jnp.broadcast_to(p["latents"], (b, *p["latents"].shape))
    for layer in p["layers"]:
        latents = attention_apply(layer["attn"], latents, x, heads) + latents
        latents = feed_forward_apply(layer["ff"], latents) + latents
    # final RMSNorm: F.normalize(x) * sqrt(dim) * gamma (reference `:195-214`)
    return l2norm_scale_apply(p["norm"], latents, float(dim) ** 0.5)
