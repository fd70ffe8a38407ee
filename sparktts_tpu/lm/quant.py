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
    if quantize_embed:
        out["embed"] = quantize_embedding_int8(params["embed"])
    else:
        out["embed"] = params["embed"]
    if "lm_head" in params:
        out["lm_head"] = quantize_linear_int8(params["lm_head"])
    return out
