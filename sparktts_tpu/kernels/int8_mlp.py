"""Fused int8 MLP matvec kernel for single-token decode.

Role: the decode-step ablation (BENCH_NOTES) attributes ~0.62 ms/token to
weight streaming at batch 1 — ~70% of the HBM roofline — and the MLP
(gate/up + down) carries ~88% of that traffic (13.1 of 14.9 MB/layer for
Qwen2.5-0.5B int8).  XLA executes gate/up-matmul → silu·mul → down-matmul as
separate fusions whose prologue/epilogue boundaries break the weight-stream
pipeline.  This kernel computes the whole MLP in ONE grid over
intermediate-dim blocks:

    per block i:  g_i = (x @ Wg[:, i]) * sg[i]        (dequant-free: int8
                  u_i = (x @ Wu[:, i]) * su[i]         weights cast to bf16
                  h_i = silu(g_i) * u_i                tile-local, scale on
                  acc += h_i @ Wd[i, :]                the small output)

so the three weight streams (gate tile, up tile, down tile) are DMA'd
exactly once each, back-to-back, double-buffered by the Pallas grid
pipeline, with the VPU/MXU work hidden under the DMA.  The per-out-channel
down-projection scale is applied by the caller (constant across blocks).

Equivalent TRT-LLM capability: fused gemm + SwiGLU epilogue kernels inside
the engine (reference `runtime/triton_trtllm/run.sh:21-33` builds with the
gemm plugin; the reference repo itself has no kernel code).

Numerics match the XLA int8 path (`nn/layers.py linear_apply` +
`lm/qwen.py mlp_block`) up to fp32-accumulation reorder: dots accumulate in
fp32, intermediate activations round to bf16 exactly as the unfused path
does.

Gated OFF by default (SPARKTTS_MLP_KERNEL=auto) until measured on the
target TPU — see `lm/qwen.py _mlp_kernel_mode`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mlp_kernel(x_ref, g_ref, u_ref, gs_ref, us_ref, d_ref, acc_ref):
    """One intermediate-dim block: gate/up matvec + SwiGLU + down partial.

    x_ref:  (R, K) bf16 — the decode activations (R = batch rows, small)
    g_ref:  (K, BI) int8 — gate weight tile
    u_ref:  (K, BI) int8 — up weight tile
    gs_ref: (1, BI) f32 — gate per-out-channel scales
    us_ref: (1, BI) f32 — up per-out-channel scales
    d_ref:  (BI, K) int8 — down weight tile
    acc_ref:(R, K) f32 — output accumulator (same block every grid step)
    """
    x = x_ref[:]
    dt = x.dtype
    g = jnp.dot(x, g_ref[:].astype(dt), preferred_element_type=jnp.float32)
    u = jnp.dot(x, u_ref[:].astype(dt), preferred_element_type=jnp.float32)
    # round to bf16 after the scale exactly like the unfused linear_apply,
    # then SwiGLU in bf16 exactly like the unfused mlp_block
    g = (g.astype(dt) * gs_ref[:].astype(dt)).astype(dt)
    u = (u.astype(dt) * us_ref[:].astype(dt)).astype(dt)
    # silu evaluated in f32 and rounded back: Mosaic's bf16 `logistic`
    # lowering miscompiles on v5e (f32 scalar broadcast into a bf16 vector
    # fails MLIR verification, jax 0.8.x), and XLA's own bf16 silu upcasts
    # internally anyway, so this matches the unfused path's numerics.
    h = (jax.nn.silu(g.astype(jnp.float32)).astype(dt) * u).astype(dt)
    part = jnp.dot(h, d_ref[:].astype(dt), preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_ref[:] = part

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        acc_ref[:] += part


def mlp_block_size(intermediate: int) -> int | None:
    """Largest supported block dividing the intermediate dim (None = shapes
    don't tile; caller falls back to the XLA path)."""
    return next((b for b in (512, 256, 128) if intermediate % b == 0), None)


@functools.partial(jax.jit, static_argnames=("block_i", "interpret"))
def int8_mlp_matvec(
    x: jax.Array,        # (R, K) bf16 activations, R small (decode rows)
    gu_q: jax.Array,     # (K, 2I) int8 fused gate|up weight
    gu_scale: jax.Array, # (2I,) f32 per-out-channel scales
    down_q: jax.Array,   # (I, K) int8 down weight
    down_scale: jax.Array,  # (K,) f32
    block_i: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """silu(x@Wg * sg) * (x@Wu * su) @ Wd * sd — one fused kernel pass.

    Returns (R, K) in x.dtype.  Requires I % block_i == 0; K and R are
    unconstrained (Mosaic pads sublanes).
    """
    r, k = x.shape
    two_i = gu_q.shape[1]
    i_dim = two_i // 2
    assert i_dim % block_i == 0, (i_dim, block_i)
    n_blocks = i_dim // block_i
    gs2 = gu_scale.reshape(1, two_i).astype(jnp.float32)

    acc = pl.pallas_call(
        _mlp_kernel,
        out_shape=jax.ShapeDtypeStruct((r, k), jnp.float32),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((r, k), lambda i: (0, 0)),              # x
            pl.BlockSpec((k, block_i), lambda i: (0, i)),        # gate tile
            pl.BlockSpec(
                (k, block_i), lambda i, _n=n_blocks: (0, _n + i)
            ),                                                   # up tile
            pl.BlockSpec((1, block_i), lambda i: (0, i)),        # gate scale
            pl.BlockSpec(
                (1, block_i), lambda i, _n=n_blocks: (0, _n + i)
            ),                                                   # up scale
            pl.BlockSpec((block_i, k), lambda i: (i, 0)),        # down tile
        ],
        out_specs=pl.BlockSpec((r, k), lambda i: (0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: acc carries
        ),
        interpret=interpret,
    )(x, gu_q, gu_q, gs2, gs2, down_q)
    return (acc.astype(x.dtype) * down_scale.astype(x.dtype)).astype(x.dtype)
