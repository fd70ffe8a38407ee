"""Weight-only int8 quantization for the BiCodec codec stack.

Parity role: the reference exports fp16 AND int8 variants of all six deployed
graphs (reference `export_sparktts_onnx.py:905-1050`); round 1 covered the LM
only (`lm/quant.py`).  This extends the same scheme — symmetric
per-out-channel scales applied to the matmul/conv OUTPUT, so no dequantized
kernel is ever materialized in HBM — to every linear, conv and transposed
conv in the codec.  The vocoder batch path is conv-heavy and HBM-bound at
small T, so int8 halves its weight traffic.

Kept full precision (quantization-sensitive or not weights at all):
  * FVQ / FSQ codebooks and snake alphas (lookup tables / activations)
  * norm params (gamma/beta/mean/var) and perceiver latent queries
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


#: pytree leaf-dict keys that are weight matrices/kernels to quantize
_SKIP_KEYS = {"codebook", "alpha", "gamma", "beta", "mean", "var", "latents"}


def quantize_weight_int8(w) -> dict:
    """(… , out) weight → {"w_q": int8, "scale": (out,) f32}.  The scale
    reduces over ALL axes but the last, which covers linears (in, out) and
    WIO conv kernels (K, Cin, Cout) alike."""
    w = jnp.asarray(w, jnp.float32)
    axes = tuple(range(w.ndim - 1))
    scale = jnp.max(jnp.abs(w), axis=axes) / 127.0
    scale = jnp.where(scale == 0, 1.0, scale)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"w_q": w_q, "scale": scale.astype(jnp.float32)}


def _is_weight_dict(node) -> bool:
    return isinstance(node, dict) and "w" in node and not isinstance(node["w"], dict)


def quantize_bicodec_int8(params):
    """Quantize every {"w", "b"?} leaf dict of a BiCodec params pytree.

    Works on any sub-tree too (e.g. just `params["decoder"]` for a
    vocoder-only int8 variant, mirroring the reference's per-graph precision
    choice)."""

    def walk(node):
        if _is_weight_dict(node):
            out = quantize_weight_int8(node["w"])
            if "b" in node:
                out["b"] = node["b"]
            return out
        if isinstance(node, dict):
            return {
                k: (v if k in _SKIP_KEYS else walk(v))
                for k, v in node.items()
            }
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def quantized_bytes(tree) -> int:
    """Rough parameter-memory footprint in bytes (for precision tables)."""
    total = 0

    def walk(node):
        nonlocal total
        if isinstance(node, dict):
            for v in node.values():
                walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)
        elif hasattr(node, "dtype"):
            total += int(np.prod(node.shape)) * node.dtype.itemsize

    walk(tree)
    return total
