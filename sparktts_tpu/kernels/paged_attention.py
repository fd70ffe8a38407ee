"""Pallas paged-KV decode attention (TPU).

TPU-native equivalent of TensorRT-LLM's paged KV cache (reference
`runtime/triton_trtllm/run.sh:65` enables the paged-context/paged-KV engine;
SURVEY.md §2.2 row 1).  Instead of every slot owning a dense
(cache_len, n_kv, hd) strip, K/V live in a shared page pool and each slot
holds a small page table:

  * k_pages / v_pages: (L, n_kv, n_pages, page_size, hd) stacked pools in HBM
  * page_table: (B, pages_per_slot) int32 — page ids per slot, scalar-
    prefetched so each grid step's BlockSpec index_map DMAs exactly the page
    it needs into VMEM (no gather materialization, no per-layer pool slice)
  * lengths: (B,) — tokens valid per slot; whole pages past the length are
    compute-skipped

Memory for the serving engine drops from max_slots × cache_len to
pages-in-use, so slot count scales with actual load, not worst-case length.

Grid is (B, pages_per_slot): one step streams ONE page of BOTH kv heads
(block (1, n_kv, 1, page, hd)) — per-program overhead is what dominates at
decode shapes (measured on v5e), so blocks are as large as the page allows
and the engine defaults to 256-token pages.  GQA: q is reshaped to
(B, n_kv, group, hd), zero-padded to the sublane multiple, and each kv head's
score tile is computed in a static in-kernel loop — KV is read exactly once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _paged_kernel(
    page_table_ref,  # scalar prefetch: (B, pages_per_slot) int32
    lengths_ref,     # scalar prefetch: (B,) int32
    layer_ref,       # scalar prefetch: (1,) int32 — pool layer plane
    q_ref,           # (1, n_kv, group_pad, d)
    k_ref,           # (1, n_kv, 1, page_size, d) — page selected by index_map
    v_ref,           # (1, n_kv, 1, page_size, d)
    o_ref,           # (1, n_kv, group_pad, d)
    m_scratch,       # (n_kv * group_pad, 128) fp32
    l_scratch,       # (n_kv * group_pad, 128) fp32
    acc_scratch,     # (n_kv * group_pad, d) fp32
    *,
    sm_scale: float,
    page_size: int,
    pages_per_slot: int,
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

    length = lengths_ref[b]

    # whole-page skip beyond the slot's valid length
    @pl.when(j * page_size < length)
    def _run():
        col = jax.lax.broadcasted_iota(
            jnp.int32, (group_pad, page_size), 1
        ) + j * page_size
        key_ok = col < length
        for h in range(n_kv):  # static unroll: one score tile per kv head
            q = q_ref[0, h].astype(jnp.float32)          # (g, d)
            k = k_ref[0, h, 0].astype(jnp.float32)       # (p, d)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )                                             # (g, p)
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

            v = v_ref[0, h, 0].astype(jnp.float32)       # (p, d)
            acc_scratch[rows, :] = acc_scratch[rows, :] * alpha + jax.lax.dot(
                p, v, preferred_element_type=jnp.float32
            )

    @pl.when(j == pages_per_slot - 1)
    def _store():
        for h in range(n_kv):
            rows = slice(h * group_pad, (h + 1) * group_pad)
            l = l_scratch[rows, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, h] = (acc_scratch[rows, :] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "interpret")
)
def paged_decode_attention(
    q: jax.Array,           # (B, Hq, D) — one decode token per slot
    k_pages: jax.Array,     # (L, Hkv, n_pages, page_size, D) stacked pools
    v_pages: jax.Array,     # (L, Hkv, n_pages, page_size, D)
    page_table: jax.Array,  # (B, pages_per_slot) int32
    lengths: jax.Array,     # (B,) int32 — valid tokens per slot (incl. current)
    layer: jax.Array | int = 0,  # which layer plane of the stacked pools
    sm_scale: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """Decode attention over the paged KV pool; returns (B, Hq, D) in q.dtype.

    The pools carry ALL layers stacked (the LM threads them through its
    layer scan); `layer` is resolved inside the BlockSpec index_map, so no
    per-layer slice of the pool is ever materialized — each grid step DMAs
    exactly one page (all kv heads at once)."""
    b, hq, d = q.shape
    _, hkv, _, page_size, _ = k_pages.shape
    group = hq // hkv
    pages_per_slot = page_table.shape[1]
    # pad GQA group rows up to the fp32 sublane multiple
    group_pad = max(8, ((group + 7) // 8) * 8)
    qg = q.reshape(b, hkv, group, d)
    if group_pad != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, group_pad - group), (0, 0)))

    grid = (b, pages_per_slot)

    kernel = functools.partial(
        _paged_kernel,
        sm_scale=sm_scale,
        page_size=page_size,
        pages_per_slot=pages_per_slot,
        n_kv=hkv,
        group_pad=group_pad,
    )

    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    def _page_index(bi, j, pt, lens, li):
        last = jnp.maximum(lens[bi] - 1, 0) // page_size
        return (li[0], 0, pt[bi, jnp.minimum(j, last)], 0, 0)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, hkv, group_pad, d), lambda b, j, *_: (b, 0, 0, 0)
                ),
                # the page table drives the DMA: grid step (b, j) streams
                # page page_table[b, j] (every kv head) of layer li into VMEM.
                # j is clamped to the slot's LAST valid page so the
                # unallocated tail repeats that page's index and Mosaic skips
                # the unchanged-block DMA (the tail's trash-page id 0 would
                # otherwise cost one extra page stream per slot; compute for
                # tail steps is already skipped by the in-kernel pl.when).
                pl.BlockSpec((1, hkv, 1, page_size, d), _page_index),
                pl.BlockSpec((1, hkv, 1, page_size, d), _page_index),
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
        page_table.astype(jnp.int32),
        lengths.astype(jnp.int32),
        layer_arr,
        qg,
        k_pages,
        v_pages,
    )

    return out[:, :, :group].reshape(b, hq, d)


def reference_paged_attention(q, k_pages, v_pages, page_table, lengths, layer=0, sm_scale=1.0):
    """XLA gather reference for tests: same semantics, materializes the
    gathered per-slot KV."""
    b, hq, d = q.shape
    k_pages, v_pages = k_pages[layer], v_pages[layer]
    hkv, _, page_size, _ = k_pages.shape
    group = hq // hkv
    pages_per_slot = page_table.shape[1]
    s_max = pages_per_slot * page_size

    # (B, Hkv, S, D) gathered per slot
    k = jnp.take(k_pages, page_table, axis=1)  # (Hkv, B, pages, P, D)
    v = jnp.take(v_pages, page_table, axis=1)
    k = k.transpose(1, 0, 2, 3, 4).reshape(b, hkv, s_max, d)
    v = v.transpose(1, 0, 2, 3, 4).reshape(b, hkv, s_max, d)

    qg = q.reshape(b, hkv, group, d).astype(jnp.float32)
    scores = jnp.einsum("bkgd,bksd->bkgs", qg, k.astype(jnp.float32)) * sm_scale
    col = jnp.arange(s_max)[None, None, None, :]
    scores = jnp.where(col < lengths[:, None, None, None], scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgs,bksd->bkgd", probs, v.astype(jnp.float32))
    return out.reshape(b, hq, d).astype(q.dtype)
