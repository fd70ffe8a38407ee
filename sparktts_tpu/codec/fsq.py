"""Finite scalar quantization + residual stack (global speaker tokens).

TPU rebuild of reference `sparktts/modules/fsq/finite_scalar_quantization.py`
and `residual_fsq.py`.  Quantization math runs in fp32 regardless of the
surrounding compute dtype, replicating the reference's force-f32 policy
(`finite_scalar_quantization.py:210-232`) so bf16 graphs produce identical
codes.  Levels/basis are static Python constants baked into the jitted graph.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparktts_tpu.nn.layers import init_linear, linear_apply


def _levels_np(levels: Sequence[int]) -> np.ndarray:
    return np.asarray(levels, dtype=np.int32)


def _basis_np(levels: Sequence[int]) -> np.ndarray:
    return np.cumprod(np.asarray([1] + list(levels[:-1]), dtype=np.int64)).astype(np.int32)


def fsq_bound(z: jax.Array, levels: Sequence[int], eps: float = 1e-3) -> jax.Array:
    """tanh bound with atanh shift for even levels (reference
    `finite_scalar_quantization.py:126-131`)."""
    lv = jnp.asarray(_levels_np(levels), dtype=jnp.float32)
    half_l = (lv - 1) * (1 + eps) / 2
    offset = jnp.where(lv % 2 == 0, 0.5, 0.0)
    shift = jnp.arctanh(offset / half_l)
    return jnp.tanh(z + shift) * half_l - offset


def fsq_quantize(z: jax.Array, levels: Sequence[int]) -> jax.Array:
    """Round-to-level, renormalized to [-1, 1] (reference `:133-137`).
    Runs in fp32, returns fp32 codes."""
    z = z.astype(jnp.float32)
    quantized = jnp.round(fsq_bound(z, levels))
    half_width = jnp.asarray(_levels_np(levels) // 2, dtype=jnp.float32)
    return quantized / half_width


def fsq_codes_to_indices(codes: jax.Array, levels: Sequence[int]) -> jax.Array:
    """Normalized codes → mixed-radix flat index (reference `:152-156`)."""
    lv = _levels_np(levels)
    half_width = jnp.asarray(lv // 2, dtype=jnp.float32)
    basis = jnp.asarray(_basis_np(levels), dtype=jnp.float32)
    zhat = codes * half_width + half_width
    return jnp.sum(zhat * basis, axis=-1).astype(jnp.int32)


def fsq_indices_to_codes(indices: jax.Array, levels: Sequence[int]) -> jax.Array:
    """Flat index → normalized codes (reference `:147-162`)."""
    lv = _levels_np(levels)
    basis = _basis_np(levels)
    idx = indices[..., None]
    level_indices = (idx // jnp.asarray(basis)) % jnp.asarray(lv)
    half_width = jnp.asarray(lv // 2, dtype=jnp.float32)
    return (level_indices.astype(jnp.float32) - half_width) / half_width


def fsq_forward(z: jax.Array, levels: Sequence[int]) -> Tuple[jax.Array, jax.Array]:
    """z: (..., len(levels)) → (codes same shape fp32, indices (...))."""
    codes = fsq_quantize(z, levels)
    indices = fsq_codes_to_indices(codes, levels)
    return codes, indices


# ---------------------------------------------------------------------------
# ResidualFSQ (reference `residual_fsq.py:48-280`)
# ---------------------------------------------------------------------------


def residual_fsq_scales(levels: Sequence[int], num_quantizers: int) -> np.ndarray:
    """Per-quantizer code scales: (levels - 1) ** -q (reference `:86-87`)."""
    lv = np.asarray(levels, dtype=np.float64)
    return np.stack([(lv - 1.0) ** (-q) for q in range(num_quantizers)]).astype(np.float32)


def init_residual_fsq(key, levels: Sequence[int], num_quantizers: int, dim: int):
    """Projections in/out of the codebook space.  dim != len(levels) implies
    Linear projections, as in the speaker encoder (latent_dim=128 → 6)."""
    codebook_dim = len(levels)
    p = {}
    if codebook_dim != dim:
        k_in, k_out = jax.random.split(key)
        p["project_in"] = init_linear(k_in, dim, codebook_dim)
        p["project_out"] = init_linear(k_out, codebook_dim, dim)
    return p


def residual_fsq_apply(
    p,
    x: jax.Array,
    levels: Sequence[int],
    num_quantizers: int,
) -> Tuple[jax.Array, jax.Array]:
    """x: (B, N, dim) → (quantized (B, N, dim), indices (B, N, Q) int32).

    Residual loop statically unrolled over Q (reference `:246-263`);
    quantization per-level in fp32.
    """
    orig_dtype = x.dtype
    if "project_in" in p:
        x = linear_apply(p["project_in"], x)
    x = x.astype(jnp.float32)

    scales = residual_fsq_scales(levels, num_quantizers)
    quantized_out = jnp.zeros_like(x)
    residual = x
    all_indices = []
    for q in range(num_quantizers):
        scale = jnp.asarray(scales[q])
        codes, indices = fsq_forward(residual / scale, levels)
        quantized = codes * scale
        residual = residual - quantized
        quantized_out = quantized_out + quantized
        all_indices.append(indices)

    if "project_out" in p:
        quantized_out = linear_apply(p["project_out"], quantized_out)
    return quantized_out.astype(orig_dtype), jnp.stack(all_indices, axis=-1)


def residual_fsq_output_from_indices(
    p,
    indices: jax.Array,
    levels: Sequence[int],
    num_quantizers: int,
) -> jax.Array:
    """indices: (B, N, Q) → (B, N, dim) summed scaled codes, projected out
    (reference `:112-199`)."""
    scales = residual_fsq_scales(levels, num_quantizers)
    total = None
    for q in range(num_quantizers):
        codes = fsq_indices_to_codes(indices[..., q], levels) * jnp.asarray(scales[q])
        total = codes if total is None else total + codes
    if "project_out" in p:
        w = p["project_out"].get("w")
        if w is not None:
            total = total.astype(w.dtype)
        total = linear_apply(p["project_out"], total)
    return total
