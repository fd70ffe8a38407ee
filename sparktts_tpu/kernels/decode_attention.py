"""Pallas dense-cache decode attention (TPU).

One kernel per layer fuses the decode attention core — scores, window mask,
online softmax, V-weighted accumulation — that the XLA path runs as a chain
of small fused kernels (einsum → mask/softmax → einsum) per layer
(`lm/qwen.py:_attention_block` decode branch).  The decode-step ablation
(BENCH_NOTES "Decode-step ablation") put that chain at ~0.17 ms/step across
the 24-layer stack at batch 1; the arithmetic is trivial (a few MFLOPs), so
the cost is kernel-boundary overhead this fusion removes.

Layout matches the LM's stacked scan-carry cache (L, B, S, n_kv, hd): the
layer index is scalar-prefetched and resolved in the BlockSpec index_map, so
no per-layer cache slice is materialized — each grid step DMAs one
(block_s, n_kv, hd) strip of keys+values into VMEM.  The valid-key window
[start[b], pos[b]] is the same index-compare mask the XLA path fuses into
its scores (left-padded prompts + current write position).

GQA handling mirrors `kernels/paged_attention.py`: q is reshaped to
(B, n_kv, group, hd), group rows padded to the fp32 sublane multiple, one
score tile per kv head in a static in-kernel loop, KV read exactly once.

HBM traffic follows the VALID window, not the cache capacity: the K/V
BlockSpec index_map clamps the S-block index into [start//block_s,
pos//block_s], so grid steps outside a slot's window resolve to the same
block index as their neighbor and Mosaic's pipeline skips the unchanged-block
DMA.  A serving engine sized for max_slots×cache_len therefore streams only
each slot's live context per step — an idle slot costs one block, not
cache_len.  Measured on v5e (best-of-5×200, b=8, cache 2048, 24-layer bf16
pool): 14.5 vs 17.1 us/layer-step with short live windows, 17.0 vs 19.0 even
at full windows; SPARKTTS_DECODE_KERNEL_CLAMP=0 restores the unclamped map.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _decode_kernel(
    start_ref,    # scalar prefetch: (B,) int32 — first valid key slot
    pos_ref,      # scalar prefetch: (B,) int32 — last valid key slot (incl.)
    layer_ref,    # scalar prefetch: (1,) int32 — cache layer plane
    q_ref,        # (1, n_kv, group_pad, d)
    k_ref,        # (1, 1, block_s, n_kv, d) — S-block selected by index_map
    v_ref,        # (1, 1, block_s, n_kv, d)
    o_ref,        # (1, n_kv, group_pad, d)
    m_scratch,    # (n_kv * group_pad, 128) fp32
    l_scratch,    # (n_kv * group_pad, 128) fp32
    acc_scratch,  # (n_kv * group_pad, d) fp32
    *,
    sm_scale: float,
    block_s: int,
    n_blocks: int,
    n_kv: int,
    group_pad: int,
):
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    start = start_ref[b]
    pos = pos_ref[b]

    # whole-block skip outside the valid window
    @pl.when((j * block_s <= pos) & ((j + 1) * block_s > start))
    def _run():
        col = jax.lax.broadcasted_iota(
            jnp.int32, (group_pad, block_s), 1
        ) + j * block_s
        key_ok = (col >= start) & (col <= pos)
        for h in range(n_kv):  # static unroll: one score tile per kv head
            q = q_ref[0, h].astype(jnp.float32)            # (g, d)
            k = k_ref[0, 0, :, h].astype(jnp.float32)      # (block_s, d)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )                                               # (g, block_s)
            if sm_scale != 1.0:
                s = s * sm_scale
            s = jnp.where(key_ok, s, MASK_VALUE)

            rows = slice(h * group_pad, (h + 1) * group_pad)
            m_prev = m_scratch[rows, :1]
            l_prev = l_scratch[rows, :1]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

            m_scratch[rows, :] = jnp.broadcast_to(m_next, (group_pad, 128))
            l_scratch[rows, :] = jnp.broadcast_to(l_next, (group_pad, 128))

            v = v_ref[0, 0, :, h].astype(jnp.float32)      # (block_s, d)
            acc_scratch[rows, :] = acc_scratch[rows, :] * alpha + jax.lax.dot(
                p, v, preferred_element_type=jnp.float32
            )

    @pl.when(j == n_blocks - 1)
    def _store():
        for h in range(n_kv):
            rows = slice(h * group_pad, (h + 1) * group_pad)
            l = l_scratch[rows, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, h] = (acc_scratch[rows, :] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "block_s", "interpret")
)
def dense_decode_attention(
    q: jax.Array,        # (B, Hq, D) — one decode token per sequence
    cache_k: jax.Array,  # (L, B, S, Hkv, D) stacked scan-carry cache
    cache_v: jax.Array,  # (L, B, S, Hkv, D)
    layer: jax.Array | int,
    start: jax.Array,    # (B,) int32 — first valid key slot (left-pad offset)
    pos: jax.Array,      # (B,) int32 — last valid key slot, inclusive
    sm_scale: float = 1.0,
    block_s: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Decode attention over the dense stacked cache; returns (B, Hq, D)."""
    b, hq, d = q.shape
    n_layers, _, s_len, hkv, _ = cache_k.shape
    group = hq // hkv
    block_s = min(block_s, s_len)
    assert s_len % block_s == 0, (s_len, block_s)
    n_blocks = s_len // block_s
    group_pad = max(8, ((group + 7) // 8) * 8)
    qg = q.reshape(b, hkv, group, d)
    if group_pad != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, group_pad - group), (0, 0)))

    kernel = functools.partial(
        _decode_kernel,
        sm_scale=sm_scale,
        block_s=block_s,
        n_blocks=n_blocks,
        n_kv=hkv,
        group_pad=group_pad,
    )
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    def _kv_index(bi, j, st, po, li):
        # clamp outside-window grid steps onto the window edge: consecutive
        # identical block indices make Mosaic skip the DMA, so dead cache
        # (beyond pos, before start, idle slots) is never streamed from HBM.
        # po < st (empty window) resolves to po's block; compute is skipped
        # by the in-kernel pl.when either way.
        # SPARKTTS_DECODE_KERNEL_CLAMP=0 disables (A/B lever, read at trace
        # time — set it before the first decode dispatch of the process).
        if os.environ.get("SPARKTTS_DECODE_KERNEL_CLAMP", "1") == "0":
            return (li[0], bi, j, 0, 0)
        jj = jnp.clip(j, st[bi] // block_s, po[bi] // block_s)
        return (li[0], bi, jj, 0, 0)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, n_blocks),
            in_specs=[
                pl.BlockSpec(
                    (1, hkv, group_pad, d), lambda b, j, *_: (b, 0, 0, 0)
                ),
                pl.BlockSpec((1, 1, block_s, hkv, d), _kv_index),
                pl.BlockSpec((1, 1, block_s, hkv, d), _kv_index),
            ],
            out_specs=pl.BlockSpec(
                (1, hkv, group_pad, d), lambda b, j, *_: (b, 0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((hkv * group_pad, 128), jnp.float32),
                pltpu.VMEM((hkv * group_pad, 128), jnp.float32),
                pltpu.VMEM((hkv * group_pad, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, group_pad, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        jnp.asarray(start, jnp.int32),
        jnp.asarray(pos, jnp.int32),
        layer_arr,
        qg,
        cache_k,
        cache_v,
    )

    return out[:, :, :group].reshape(b, hq, d)
