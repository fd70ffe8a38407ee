"""Weight-only int8 quantization for the LM.

Decode throughput on TPU is HBM-bandwidth-bound (every step streams all
weights once); int8 weights halve that traffic vs bf16.  Parity role: the
reference ships an int8 precision matrix through its ONNX export
(`export_sparktts_onnx.py:937-1050`) and TRT-LLM weight-only flags
(`convert_checkpoint.py:160-231`).

Scheme: symmetric per-output-channel scales.  Quantized linears store
{"w_q": int8 (in, out), "scale": f32 (out,)}; the scale is applied to the
matmul OUTPUT, so XLA never materializes a dequantized weight matrix.  The
embedding is quantized per-row (it is both the lookup table and, tied, the
logits projection — 300 MB of the 0.5B checkpoint).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_linear_int8(p: dict) -> dict:
    """{"w": (..., in, out), "b"?} → {"w_q", "scale", "b"?}.  Per-out-channel
    scales; handles both single (in, out) and stacked (L, in, out) weights."""
    w = jnp.asarray(p["w"], jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=-2) / 127.0  # (..., out)
    scale = jnp.where(scale == 0, 1.0, scale)
    w_q = jnp.clip(jnp.round(w / scale[..., None, :]), -127, 127).astype(jnp.int8)
    out = {"w_q": w_q, "scale": scale.astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_embedding_int8(w: jax.Array) -> dict:
    """(V, H) embedding → {"w_q": int8, "scale": (V, 1) f32} (per-row)."""
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0
    scale = jnp.where(scale == 0, 1.0, scale)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"w_q": w_q, "scale": scale.astype(jnp.float32)}


QUANT_KEYS = ("qkv", "o", "gateup", "down")


def quantize_qwen_int8(params: dict, quantize_embed: bool = True) -> dict:
    """Quantize every transformer linear (and optionally the embedding) of a
    `lm/qwen.py` params pytree (stacked-layer layout).  Norms stay as-is."""
    layers = params["layers"]
    qlayers = {"ln1": layers["ln1"], "ln2": layers["ln2"]}
    for k in QUANT_KEYS:
        qlayers[k] = quantize_linear_int8(layers[k])
    out = {"final_ln": params["final_ln"], "layers": qlayers}
    if quantize_embed and not isinstance(params["embed"], dict):
        out["embed"] = quantize_embedding_int8(params["embed"])
    else:
        # already-quantized embedding passes through (same guard as int4)
        out["embed"] = params["embed"]
    if "lm_head" in params:
        out["lm_head"] = quantize_linear_int8(params["lm_head"])
    return out


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Nibble-packed (in/2, out) int8 → (in, out) fp32 values.  THE single
    source of truth for the packing layout (even input rows in the low
    nibble, odd rows in the high nibble); every consumer — the XLA linear
    path, the constrained lm-head path, the Pallas kernel's test reference —
    goes through here so a layout change cannot silently diverge."""
    lo = ((packed << 4) >> 4).astype(jnp.float32)
    hi = (packed >> 4).astype(jnp.float32)
    return jnp.stack((lo, hi), axis=-2).reshape(
        *packed.shape[:-2], 2 * packed.shape[-2], packed.shape[-1]
    )


def quantize_linear_int4(p: dict, group: int = 128) -> dict:
    """{"w": (..., in, out)} → {"w_p4": int8 (..., in/2, out) nibble-packed,
    "gscale": (..., in/group, out)}.

    Weight-only int4 with GROUP-WISE scales along the contraction dim (plain
    per-channel int4's 15 levels lose too much).  Parity role: TRT-LLM's
    int4 weight-only flags (reference convert_checkpoint.py:160-231).  Two
    4-bit values pack into each int8 (native int4 arrays don't transfer
    through every backend); the matmul unpacks per group and applies the
    (G, out) scales to partial sums — no dequantized matrix materialized
    (`nn/layers.py`)."""
    w = jnp.asarray(p["w"], jnp.float32)
    d_in = w.shape[-2]
    assert d_in % group == 0 and group % 2 == 0, (d_in, group)
    g = d_in // group
    wg = w.reshape(*w.shape[:-2], g, group, w.shape[-1])
    scale = jnp.max(jnp.abs(wg), axis=-2) / 7.0           # (..., G, out)
    scale = jnp.where(scale == 0, 1.0, scale)
    w_q = jnp.clip(jnp.round(wg / scale[..., None, :]), -7, 7).astype(jnp.int32)
    w_q = w_q.reshape(w.shape)                            # (..., in, out)
    lo = w_q[..., 0::2, :] & 0xF
    hi = (w_q[..., 1::2, :] & 0xF) << 4
    out = {
        "w_p4": (lo | hi).astype(jnp.int8),
        "gscale": scale.astype(jnp.float32),
    }
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_qwen_int4(params: dict, group: int = 128) -> dict:
    """Int4 weight-only for every transformer linear; the embedding stays
    per-row int8 (a 15-level row over 896 dims degrades the tied logits too
    far, and guided decoding already shrinks its traffic)."""
    layers = params["layers"]
    qlayers = {"ln1": layers["ln1"], "ln2": layers["ln2"]}
    for k in QUANT_KEYS:
        qlayers[k] = quantize_linear_int4(layers[k], group)
    out = {"final_ln": params["final_ln"], "layers": qlayers}
    out["embed"] = (
        quantize_embedding_int8(params["embed"])
        if not isinstance(params["embed"], dict)
        else params["embed"]
    )
    if "lm_head" in params:
        out["lm_head"] = quantize_linear_int4(params["lm_head"], group)
    return out
