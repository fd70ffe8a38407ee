"""Pallas fused DAC ResidualUnit (TPU) — the vocoder's bandwidth problem.

A WaveGenerator ResidualUnit is snake → dilated k7 conv → snake → 1x1 conv →
residual add (reference `sparktts/modules/blocks/layers.py:51-67`).  The XLA
formulation (`codec/wave_generator.py:_residual_unit_apply` over
`nn/layers.py:conv1d_apply`) runs the k7 conv as 7 shifted matmuls — on the
late decoder blocks (C=192 at T=80k, C=96 at T=160k for 10 s of audio) each
matmul re-reads the full activation from HBM and the elementwise snakes are
extra round trips, so one ResidualUnit moves ~10x its input size through HBM
while its arithmetic is a few ms of MXU at most.  This kernel runs the whole
unit in one pass: each grid step DMAs one (block_t, C) activation tile (plus
its dilation halo from the neighboring tiles), computes both snakes, all 7
taps and the 1x1 projection in VMEM with fp32 accumulation, and writes one
output tile — HBM traffic drops to read-once/write-once.

Halo handling: BlockSpec tiles cannot overlap, so x is passed THREE times
(prev/cur/next tile via clamped index maps — consecutive identical block
indices make Mosaic skip the duplicate DMA) and the kernel assembles the
(block_t + 2*halo, C) working strip in VMEM scratch, zeroing the halo at the
sequence edges to reproduce the conv's zero padding.  halo = 3*dilation
(dilations 1/3/9 → 3/9/27 rows).

Numerics: snakes evaluate in fp32 and round to the compute dtype at the same
points the XLA path rounds (post-snake, post-conv), matmuls accumulate fp32
on the MXU; bf16 outputs match the unfused path to bf16 round-off
(tests/test_vocoder_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _snake_f32(x, alpha):
    """x + sin^2(alpha x)/alpha in fp32 (reference `layers.py:33-39`)."""
    xf = x.astype(jnp.float32)
    a = alpha.astype(jnp.float32)
    s = jnp.sin(a * xf)
    return xf + s * s / (a + 1e-9)


def _residual_unit_kernel(
    x_prev,  # (1, block_t, C) — tile i-1 (clamped)
    x_cur,   # (1, block_t, C) — tile i
    x_next,  # (1, block_t, C) — tile i+1 (clamped)
    a1_ref,  # (1, C) snake1 alpha
    w1_ref,  # (7, C, C) dilated conv kernel
    b1_ref,  # (1, C)
    a2_ref,  # (1, C) snake2 alpha
    w2_ref,  # (C, C) 1x1 conv kernel
    b2_ref,  # (1, C)
    o_ref,   # (1, block_t, C)
    y_scr,   # (block_t + 2*halo, C) compute-dtype scratch (post-snake1)
    *,
    block_t: int,
    halo: int,
    dilation: int,
    n_t: int,
):
    i = pl.program_id(1)

    # assemble the haloed strip, already through snake1 (snake(0)=0, so
    # zeroing the sequence-edge halo before or after snake is equivalent)
    dt = y_scr.dtype
    y_scr[:halo] = _snake_f32(x_prev[0, block_t - halo :], a1_ref[0]).astype(dt)
    y_scr[halo : halo + block_t] = _snake_f32(x_cur[0], a1_ref[0]).astype(dt)
    y_scr[halo + block_t :] = _snake_f32(x_next[0, :halo], a1_ref[0]).astype(dt)

    @pl.when(i == 0)
    def _zero_left():
        y_scr[:halo] = jnp.zeros((halo, y_scr.shape[1]), dt)

    @pl.when(i == n_t - 1)
    def _zero_right():
        y_scr[halo + block_t :] = jnp.zeros((halo, y_scr.shape[1]), dt)

    # dilated k7 conv: output[t] = sum_k y[t + k*dil] @ w1[k]  (+ b1)
    acc = jnp.broadcast_to(
        b1_ref[0].astype(jnp.float32), (block_t, y_scr.shape[1])
    )
    for k in range(7):
        acc = acc + jax.lax.dot(
            y_scr[k * dilation : k * dilation + block_t],
            w1_ref[k],
            preferred_element_type=jnp.float32,
        )

    # snake2 → 1x1 conv → residual
    z = _snake_f32(acc, a2_ref[0]).astype(dt)
    out = jax.lax.dot(z, w2_ref[...], preferred_element_type=jnp.float32)
    out = out + b2_ref[0].astype(jnp.float32)
    o_ref[0] = (x_cur[0].astype(jnp.float32) + out).astype(o_ref.dtype)


def _residual_unit_carry_kernel(
    x_cur,   # (1, block_t, C) — tile min(i, n_t-1)
    a1_ref,  # (1, C)
    w1_ref,  # (7, C, C)
    b1_ref,  # (1, C)
    a2_ref,  # (1, C)
    w2_ref,  # (C, C)
    b2_ref,  # (1, C)
    o_ref,   # (1, block_t, C) — OUTPUT tile max(i-1, 0)
    strip,   # (2*halo + block_t, C) scratch: post-snake1 strip, carried
    y_scr,   # (block_t, C) scratch: snake1 of the current tile
    xp_scr,  # (block_t, C) scratch: RAW previous tile (residual add)
    *,
    block_t: int,
    halo: int,
    dilation: int,
    n_t: int,
):
    """Single-read variant: the grid runs n_t+1 sequential steps per batch
    row; each step snakes tile i and completes OUTPUT tile i-1, whose strip
    head/body were carried in VMEM scratch from the previous steps — x is
    read from HBM exactly once (the i=n_t step re-addresses tile n_t-1,
    which Mosaic's unchanged-block-index check skips)."""
    i = pl.program_id(1)
    dt = strip.dtype

    y_scr[...] = _snake_f32(x_cur[0], a1_ref[0]).astype(dt)

    @pl.when(i == 0)
    def _init_row():
        strip[:halo] = jnp.zeros((halo, strip.shape[1]), dt)
        o_ref[0] = jnp.zeros(o_ref.shape[1:], o_ref.dtype)  # overwritten at i=1

    @pl.when(i >= 1)
    def _emit_prev_tile():
        strip[halo + block_t :] = jnp.where(
            i == n_t, jnp.zeros((halo, strip.shape[1]), dt), y_scr[:halo]
        )
        acc = jnp.broadcast_to(
            b1_ref[0].astype(jnp.float32), (block_t, strip.shape[1])
        )
        for k in range(7):
            acc = acc + jax.lax.dot(
                strip[k * dilation : k * dilation + block_t],
                w1_ref[k],
                preferred_element_type=jnp.float32,
            )
        z = _snake_f32(acc, a2_ref[0]).astype(dt)
        out = jax.lax.dot(z, w2_ref[...], preferred_element_type=jnp.float32)
        out = out + b2_ref[0].astype(jnp.float32)
        o_ref[0] = (xp_scr[...].astype(jnp.float32) + out).astype(o_ref.dtype)
        strip[:halo] = strip[block_t : block_t + halo]  # tail h of y_{i-1}

    strip[halo : halo + block_t] = y_scr[...]
    xp_scr[...] = x_cur[0]


@functools.partial(
    jax.jit, static_argnames=("dilation", "block_t", "interpret", "variant")
)
def fused_residual_unit(
    p,
    x: jax.Array,  # (B, T, C)
    dilation: int,
    block_t: int = 0,
    interpret: bool = False,
    variant: str = "carry",
) -> jax.Array:
    """Fused snake→conv(k7,dil)→snake→conv(k1)→+x; same params pytree and
    semantics as `codec/wave_generator._residual_unit_apply`.  Unquantized
    params only (int8 codec trees take the XLA path).

    variant='carry' (default) reads x from HBM once, carrying the halo strip
    in VMEM across sequential grid steps; variant='tiles' passes prev/cur/
    next tiles per step (3x read traffic, no carried state)."""
    b, t, c = x.shape
    w1 = p["conv1"]["w"]
    dtype = w1.dtype  # conv compute dtype follows the weights (layers.py)
    x = x.astype(dtype)
    halo = 3 * dilation

    if block_t <= 0:
        # weights (7+1)*C*C must stay VMEM-resident; shrink tiles as C grows
        block_t = 512 if c <= 384 else 256
    block_t = max(halo, min(block_t, _round_up(t, 16)))
    block_t = _round_up(block_t, 16)
    t_pad = _round_up(t, block_t)
    if t_pad != t:
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    n_t = t_pad // block_t

    row = lambda v: v.reshape(1, -1).astype(dtype)  # noqa: E731
    param_specs = [
        pl.BlockSpec((1, c), lambda bi, i: (0, 0)),
        pl.BlockSpec((7, c, c), lambda bi, i: (0, 0, 0)),
        pl.BlockSpec((1, c), lambda bi, i: (0, 0)),
        pl.BlockSpec((1, c), lambda bi, i: (0, 0)),
        pl.BlockSpec((c, c), lambda bi, i: (0, 0)),
        pl.BlockSpec((1, c), lambda bi, i: (0, 0)),
    ]
    param_args = (
        row(p["snake1"]["alpha"]),
        w1.astype(dtype),
        row(p["conv1"]["b"]),
        row(p["snake2"]["alpha"]),
        p["conv2"]["w"][0].astype(dtype),
        row(p["conv2"]["b"]),
    )

    if variant == "carry":
        kernel = functools.partial(
            _residual_unit_carry_kernel,
            block_t=block_t,
            halo=halo,
            dilation=dilation,
            n_t=n_t,
        )
        out = pl.pallas_call(
            kernel,
            grid=(b, n_t + 1),
            in_specs=[
                pl.BlockSpec(
                    (1, block_t, c), lambda bi, i: (bi, jnp.minimum(i, n_t - 1), 0)
                ),
                *param_specs,
            ],
            out_specs=pl.BlockSpec(
                (1, block_t, c), lambda bi, i: (bi, jnp.maximum(i - 1, 0), 0)
            ),
            out_shape=jax.ShapeDtypeStruct((b, t_pad, c), dtype),
            scratch_shapes=[
                pltpu.VMEM((2 * halo + block_t, c), dtype),  # strip (carried)
                pltpu.VMEM((block_t, c), dtype),             # snake1(cur)
                pltpu.VMEM((block_t, c), dtype),             # raw prev tile
            ],
            compiler_params=pltpu.CompilerParams(
                # the strip scratch carries state across t-steps AND relies on
                # batch rows running in order (i==0 reinitializes per row)
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=interpret,
        )(x, *param_args)
        return out[:, :t]

    assert variant == "tiles", variant
    kernel = functools.partial(
        _residual_unit_kernel,
        block_t=block_t,
        halo=halo,
        dilation=dilation,
        n_t=n_t,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((1, block_t, c), lambda bi, i: (bi, jnp.maximum(i - 1, 0), 0)),
            pl.BlockSpec((1, block_t, c), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec(
                (1, block_t, c), lambda bi, i: (bi, jnp.minimum(i + 1, n_t - 1), 0)
            ),
            *param_specs,
        ],
        out_specs=pl.BlockSpec((1, block_t, c), lambda bi, i: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), dtype),
        scratch_shapes=[pltpu.VMEM((block_t + 2 * halo, c), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, x, x, *param_args)
    return out[:, :t]


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
