"""Pallas int4 weight-only matvec (TPU).

The XLA formulation of nibble-packed int4 (`nn/layers.py`) materializes the
unpacked bf16 weights in HBM every call — reading int8 + writing/reading
bf16 is ~5 bytes/weight, WORSE than plain int8 (measured 9× slower at decode
on v5e).  This kernel restores the 4-bit HBM footprint: each grid step DMAs
one packed (in/2, tile_out) int8 block into VMEM, unpacks with VPU shifts
IN REGISTERS, applies the group scales to per-group partial dots, and
accumulates the output tile.  Weights stream at 0.5 bytes/weight — half of
int8 — which is the decode bandwidth floor this kernel targets.

Layout contract matches lm/quant.quantize_linear_int4: even input rows in
the low nibble, odd rows in the high nibble, group-wise scales (G, out)
along the contraction dim.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _int4_matvec_kernel(
    x_lo_ref,    # (B_pad, in/2) — activations at even input rows
    x_hi_ref,    # (B_pad, in/2) — activations at odd input rows
    packed_ref,  # (in/2, tile_out) int8 — this step's weight tile
    scale_ref,   # (G, tile_out) fp32
    o_ref,       # (B_pad, tile_out)
    *,
    group: int,
    n_groups: int,
):
    # unpack without int8 shifts (Mosaic can't legalize arith.shli on i8):
    # widen to i32, mask the low nibble and sign-extend by compare, and take
    # the high nibble with an arithmetic right shift
    p32 = packed_ref[...].astype(jnp.int32)
    lo_u = p32 & 0xF
    lo = jnp.where(lo_u >= 8, lo_u - 16, lo_u).astype(jnp.float32)  # even rows
    hi = (p32 >> 4).astype(jnp.float32)                             # odd rows
    x_lo = x_lo_ref[...].astype(jnp.float32)
    x_hi = x_hi_ref[...].astype(jnp.float32)
    b = x_lo.shape[0]
    half = group // 2

    acc = jnp.zeros((b, p32.shape[1]), jnp.float32)
    for g in range(n_groups):  # static unroll over scale groups
        # group g covers input rows [g*group, (g+1)*group) = packed rows
        # [g*half, (g+1)*half); x arrives pre-de-interleaved to match
        w_lo = lo[g * half : (g + 1) * half, :]
        w_hi = hi[g * half : (g + 1) * half, :]
        part = jax.lax.dot(
            x_lo[:, g * half : (g + 1) * half], w_lo,
            preferred_element_type=jnp.float32,
        )
        part = part + jax.lax.dot(
            x_hi[:, g * half : (g + 1) * half], w_hi,
            preferred_element_type=jnp.float32,
        )
        acc = acc + part * scale_ref[g, :][None, :]
    o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_out", "interpret"))
def int4_matvec(
    x: jax.Array,       # (B, in)
    packed: jax.Array,  # (in/2, out) int8 nibble-packed
    gscale: jax.Array,  # (G, out) fp32
    tile_out: int = 1 << 30,  # auto: whole out dim, VMEM-budgeted
    interpret: bool = False,
) -> jax.Array:
    """x @ unpack(packed) * gscale, streaming weights at 4 bits.  Returns
    (B, out) in x.dtype."""
    b, d_in = x.shape
    half_in, d_out = packed.shape
    g = gscale.shape[0]
    group = d_in // g
    assert half_in * 2 == d_in and group % 2 == 0, (d_in, half_in, group)
    # per-program overhead dominates at decode shapes, so take the WHOLE out
    # dim per grid step, halving only until the packed block fits the VMEM
    # budget (the model's dims are even multiples of 128)
    budget_bytes = 4 << 20
    tile_out = min(tile_out, d_out)
    while (half_in * tile_out > budget_bytes or d_out % tile_out) and tile_out % 2 == 0:
        tile_out //= 2
    assert d_out % tile_out == 0, (d_out, tile_out)
    b_pad = max(8, ((b + 7) // 8) * 8)
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0)))

    # de-interleave once outside the kernel (x is tiny; Mosaic has no
    # in-kernel vector reshape)
    x_lo = x[:, 0::2]
    x_hi = x[:, 1::2]

    kernel = functools.partial(
        _int4_matvec_kernel, group=group, n_groups=g
    )
    out = pl.pallas_call(
        kernel,
        grid=(d_out // tile_out,),
        in_specs=[
            pl.BlockSpec((b_pad, half_in), lambda j: (0, 0)),
            pl.BlockSpec((b_pad, half_in), lambda j: (0, 0)),
            pl.BlockSpec((half_in, tile_out), lambda j: (0, j)),
            pl.BlockSpec((g, tile_out), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((b_pad, tile_out), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((b_pad, d_out), x.dtype),
        interpret=interpret,
    )(x_lo, x_hi, packed, gscale)
    return out[:b]


def reference_int4_matvec(x, packed, gscale):
    """XLA reference (the nn/layers.py formulation) for tests."""
    from sparktts_tpu.lm.quant import unpack_int4

    w = unpack_int4(packed)
    g = gscale.shape[0]
    group = w.shape[0] // g
    xg = x.astype(jnp.float32).reshape(*x.shape[:-1], g, group)
    wg = w.reshape(g, group, w.shape[-1])
    partial = jnp.einsum("...gi,gio->...go", xg, wg)
    return jnp.sum(partial * gscale, axis=-2).astype(x.dtype)
