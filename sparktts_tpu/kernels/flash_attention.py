"""Pallas flash attention (TPU) for the LM prefill path.

Replaces the reference's fused-attention inside TensorRT-LLM / torch SDPA
(SURVEY.md §2.2) with a TPU online-softmax kernel: the (T, S) score matrix is
never materialized; per-Q-tile running max/sum/accumulator live in VMEM
scratch and KV tiles stream through.  Handles:

  * causal masking with whole-tile skipping above the diagonal
  * left-padded prompts: per-batch first-valid-key index (`start`) passed via
    scalar prefetch, masked inside the tile
  * GQA: Q-head grid index maps onto its KV head (h // group) in the K/V
    BlockSpecs — KV heads are never materialized repeated

Interpret mode is used automatically off-TPU so the same code path is
unit-tested on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _flash_kernel(
    start_ref,       # scalar prefetch: (B,) first valid key slot per batch
    q_ref,           # (1, 1, bq, d)
    k_ref,           # (1, 1, bk, d)
    v_ref,           # (1, 1, bk, d)
    o_ref,           # (1, 1, bq, d)
    m_scratch,       # (bq, 128) fp32
    l_scratch,       # (bq, 128) fp32
    acc_scratch,     # (bq, d) fp32
    *,
    sm_scale: float,
    block_q: int,
    block_k: int,
    num_kv_tiles: int,
):
    b = pl.program_id(0)
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    # tile skip: run only if this KV tile intersects the allowed region —
    # not entirely in the causal future, and not entirely inside this batch
    # row's left padding (tiles before start[b] would compute then mask to
    # nothing)
    should_run = ((kv_idx * block_k) <= (q_idx * block_q + block_q - 1)) & (
        (kv_idx + 1) * block_k - 1 >= start_ref[b]
    )

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0].astype(jnp.float32)          # (bq, d)
        k = k_ref[0, 0].astype(jnp.float32)          # (bk, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                             # (bq, bk)
        if sm_scale != 1.0:
            s = s * sm_scale

        row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + q_idx * block_q
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kv_idx * block_k
        mask = (col <= row) & (col >= start_ref[b])
        s = jnp.where(mask, s, MASK_VALUE)

        m_prev = m_scratch[...][:, :1]                # (bq, 1)
        l_prev = l_scratch[...][:, :1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

        v = v_ref[0, 0].astype(jnp.float32)           # (bk, d)
        acc_scratch[...] = acc_scratch[...] * alpha + jax.lax.dot(
            p, v, preferred_element_type=jnp.float32
        )

    @pl.when(kv_idx == num_kv_tiles - 1)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "block_q", "block_k", "interpret")
)
def flash_attention_prefill(
    q: jax.Array,          # (B, Hq, T, D)
    k: jax.Array,          # (B, Hkv, S, D)
    v: jax.Array,          # (B, Hkv, S, D)
    start: jax.Array,      # (B,) int32: first valid key slot (left-pad offset)
    sm_scale: float = 1.0,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Causal left-pad-masked attention, output (B, Hq, T, D) in q.dtype."""
    b, hq, t, d = q.shape
    _, hkv, s, _ = k.shape
    group = hq // hkv
    block_q = min(block_q, t)
    block_k = min(block_k, s)
    assert t % block_q == 0 and s % block_k == 0, (t, s, block_q, block_k)
    num_kv_tiles = s // block_k

    grid = (b, hq, t // block_q, num_kv_tiles)

    kernel = functools.partial(
        _flash_kernel,
        sm_scale=sm_scale,
        block_q=block_q,
        block_k=block_k,
        num_kv_tiles=num_kv_tiles,
    )

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                # index maps receive the scalar-prefetch ref as a trailing arg
                pl.BlockSpec((1, 1, block_q, d), lambda b, h, qi, ki, *_: (b, h, qi, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda b, h, qi, ki, *_, group=group: (b, h // group, ki, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda b, h, qi, ki, *_, group=group: (b, h // group, ki, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b, h, qi, ki, *_: (b, h, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, t, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(start.astype(jnp.int32), q, k, v)


def reference_attention(q, k, v, start, sm_scale=1.0):
    """XLA reference for tests: same mask semantics."""
    b, hq, t, d = q.shape
    hkv = k.shape[1]
    group = hq // hkv
    s = k.shape[2]
    qg = q.reshape(b, hkv, group, t, d)
    scores = jnp.einsum("bkgtd,bksd->bkgts", qg.astype(jnp.float32), k.astype(jnp.float32))
    scores = scores * sm_scale
    row = jnp.arange(t)[:, None]
    col = jnp.arange(s)[None, :]
    mask = (col <= row)[None, None, None] & (col[None, :] >= start[:, None, None])[:, None, None]
    scores = jnp.where(mask, scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgts,bksd->bkgtd", probs, v.astype(jnp.float32))
    return out.reshape(b, hq, t, d).astype(q.dtype)
