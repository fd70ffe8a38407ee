"""Factorized vector quantizer (semantic token codebook).

TPU rebuild of reference `sparktts/modules/vq/factorized_vector_quantize.py`.
The nearest-code search is a single (B*T, D) x (D, K) matmul on the MXU; the
1x1 weight-normalized conv projections of the reference become plain linears
(weight norm folded at load).  Channels-last: latents are (B, T, D).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from sparktts_tpu.config import QuantizerConfig
from sparktts_tpu.nn.layers import init_linear, linear_apply


def init_fvq(key, cfg: QuantizerConfig):
    k_in, k_out, k_cb = jax.random.split(key, 3)
    p = {"codebook": jax.random.normal(k_cb, (cfg.codebook_size, cfg.codebook_dim))}
    if cfg.input_dim != cfg.codebook_dim:
        p["in_project"] = init_linear(k_in, cfg.input_dim, cfg.codebook_dim)
        p["out_project"] = init_linear(k_out, cfg.codebook_dim, cfg.input_dim)
    return p


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True) + eps)


def fvq_nearest_indices(p, z_e: jax.Array) -> jax.Array:
    """L2-normalized nearest-neighbor code search (reference
    `factorized_vector_quantize.py:169-187`).

    With both sides normalized, argmin distance == argmax cosine similarity,
    so a single matmul + argmax suffices (the ||e||^2 and ||c||^2 terms are
    constant 1).  z_e: (B, T, Dcb) → indices (B, T) int32.
    """
    enc = _l2_normalize(z_e.astype(jnp.float32))
    cb = _l2_normalize(p["codebook"].astype(jnp.float32))
    sim = jnp.einsum("btd,kd->btk", enc, cb, preferred_element_type=jnp.float32)
    return jnp.argmax(sim, axis=-1).astype(jnp.int32)


def fvq_tokenize(p, z: jax.Array) -> jax.Array:
    """z: (B, T, input_dim) encoder latents → (B, T) code indices
    (reference `factorized_vector_quantize.py:148-152`)."""
    z_e = linear_apply(p["in_project"], z) if "in_project" in p else z
    return fvq_nearest_indices(p, z_e)


def fvq_detokenize(p, indices: jax.Array) -> jax.Array:
    """(B, T) indices → (B, T, input_dim) quantized latents
    (reference `factorized_vector_quantize.py:154-158`)."""
    z_q = jnp.take(p["codebook"], indices, axis=0)
    if "out_project" in p:
        z_q = linear_apply(p["out_project"], z_q)
    return z_q


def fvq_forward(p, z: jax.Array) -> Dict[str, jax.Array]:
    """Inference forward: quantize and project out, plus usage stats
    (reference `factorized_vector_quantize.py:70-140`, eval path)."""
    z_e = linear_apply(p["in_project"], z) if "in_project" in p else z
    indices = fvq_nearest_indices(p, z_e)
    z_q = jnp.take(p["codebook"], indices, axis=0)
    if "out_project" in p:
        z_q = linear_apply(p["out_project"], z_q)

    codebook_size = p["codebook"].shape[0]
    onehot = jax.nn.one_hot(indices.reshape(-1), codebook_size, dtype=jnp.float32)
    avg_probs = jnp.mean(onehot, axis=0)
    perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))
    active_num = jnp.sum(jnp.sum(onehot, axis=0) > 0).astype(jnp.float32)

    return {
        "z_q": z_q,
        "indices": indices,
        "perplexity": perplexity,
        "active_num": active_num,
    }


def fvq_vq2emb(p, vq: jax.Array, out_proj: bool = True) -> jax.Array:
    """API parity with reference `factorized_vector_quantize.py:142-146`."""
    emb = jnp.take(p["codebook"], vq, axis=0)
    if out_proj and "out_project" in p:
        emb = linear_apply(p["out_project"], emb)
    return emb


def fvq_get_emb(p) -> jax.Array:
    """API parity with reference `factorized_vector_quantize.py:160-161`."""
    return p["codebook"]
