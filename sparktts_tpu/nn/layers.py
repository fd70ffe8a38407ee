"""Functional NN primitives (channels-last, TPU-friendly).

Every layer is a pair of functions: ``init_*`` builds a params pytree (nested
dicts of jnp arrays) and a matching ``*_apply`` that is pure and jit/vmap/pjit
compatible.  All sequence tensors are (B, T, C) — channels-last keeps XLA's
conv and matmul tiling on the MXU without layout transposes (the reference's
NCW torch layout is converted at checkpoint load).

Replaces torch primitives used throughout the reference modules
(`sparktts/modules/blocks/layers.py`, `vocos.py`): weight-normalized convs are
folded to plain convs at load time (reference folds them too at inference —
`bicodec.py:109` remove_weight_norm), BatchNorm is applied in inference form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    """Truncated normal in [-2std, 2std] (reference init, `vocos.py:319-322`)."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------


def init_linear(key, in_dim: int, out_dim: int, bias: bool = True, std: float = 0.02):
    kw, _ = jax.random.split(key)
    p = {"w": trunc_normal(kw, (in_dim, out_dim), std)}
    if bias:
        p["b"] = jnp.zeros((out_dim,))
    return p


def linear_apply(p, x):
    if "w_p4" in p:
        # weight-only int4 (nibble-packed int8) with group-wise scales along
        # the contraction dim (lm/quant.py).  Decode shapes (few rows) go
        # through the Pallas matvec kernel, which unpacks nibbles in VMEM so
        # weights stream at 4 bits (the XLA formulation below materializes
        # the unpacked bf16 matrix in HBM every call — measured 9x slower at
        # decode on v5e).  Wider shapes (prefill) amortize the one-off unpack
        # and stay on the XLA path.
        packed, s = p["w_p4"], p["gscale"]      # (in/2, out), (G, out)
        d_in = 2 * packed.shape[-2]
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        if rows <= 32 and jax.default_backend() == "tpu":
            from sparktts_tpu.kernels.int4_matmul import int4_matvec

            y = int4_matvec(x.reshape(rows, d_in), packed, s).reshape(
                *x.shape[:-1], packed.shape[-1]
            )
        else:
            from sparktts_tpu.lm.quant import unpack_int4

            g = s.shape[-2]
            group = d_in // g
            xg = x.reshape(*x.shape[:-1], g, group)
            wg = unpack_int4(packed).astype(x.dtype).reshape(g, group, -1)
            partial = jnp.einsum(
                "...gi,gio->...go", xg, wg, preferred_element_type=jnp.float32
            )
            y = jnp.sum(partial * s, axis=-2).astype(x.dtype)
    elif "w_q" in p:
        # weight-only int8: cast weights up to the activation dtype for the
        # MXU matmul, apply the per-out-channel scale to the OUTPUT (fusable,
        # never materializes a dequantized matrix)
        y = jnp.matmul(x, p["w_q"].astype(x.dtype)) * p["scale"].astype(x.dtype)
    else:
        # weights define the compute dtype (bf16 params → bf16 MXU matmul)
        y = jnp.matmul(x.astype(p["w"].dtype), p["w"])
    if "b" in p:
        y = y + p["b"]
    return y


# ---------------------------------------------------------------------------
# Conv1d (NWC).  Kernel layout: (K, Cin // groups, Cout) == lax 'WIO'.
# ---------------------------------------------------------------------------


def init_conv1d(
    key,
    in_channels: int,
    out_channels: int,
    kernel_size: int,
    groups: int = 1,
    bias: bool = True,
    std: float = 0.02,
):
    kw, _ = jax.random.split(key)
    p = {"w": trunc_normal(kw, (kernel_size, in_channels // groups, out_channels), std)}
    if bias:
        p["b"] = jnp.zeros((out_channels,))
    return p


def conv1d_apply(
    p,
    x,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
):
    """x: (B, T, C) → (B, T', Cout).  ``padding`` is symmetric, torch-style.

    Dense stride-1 convs run as K shifted matmuls — on TPU this keeps every
    FLOP on the MXU and composes without the layout thrash XLA's conv op
    exhibits when chained (measured 2-5x on the vocoder stack).  Grouped or
    strided convs use lax.conv_general_dilated.

    Weight-only int8 kernels ({"w_q": int8, "scale": (Cout,)}) apply the
    per-out-channel scale to the OUTPUT — conv is linear per out channel, so
    this is exact and never materializes a dequantized kernel in HBM.
    """
    quant = "w_q" in p
    w = p["w_q"] if quant else p["w"]
    # unquantized: weights define the compute dtype (bf16 params → bf16 MXU);
    # int8: the activation dtype does (the int8 kernel is cast up per use)
    dtype = x.dtype if quant else w.dtype
    x = x.astype(dtype)
    k = w.shape[0]
    if groups == 1 and stride == 1:
        t_out = x.shape[1] + 2 * padding - dilation * (k - 1)
        if t_out > 0:
            xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0))) if padding else x
            y = None
            for i in range(k):
                xi = jax.lax.dynamic_slice_in_dim(xp, i * dilation, t_out, 1)
                o = jnp.einsum("btc,cd->btd", xi, w[i].astype(dtype))
                y = o if y is None else y + o
            if quant:
                y = y * p["scale"].astype(dtype)
            if "b" in p:
                y = y + p["b"]
            return y
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if quant:
        y = y * p["scale"].astype(dtype)
    if "b" in p:
        y = y + p["b"]
    return y


def init_conv_transpose1d(
    key,
    in_channels: int,
    out_channels: int,
    kernel_size: int,
    groups: int = 1,
    bias: bool = True,
    std: float = 0.02,
):
    """Params stored pre-converted to the equivalent lhs-dilated forward conv:
    kernel (K, Cin // groups, Cout), spatially flipped relative to torch's
    ConvTranspose1d weight (the checkpoint converter performs the same
    flip/transpose on real weights)."""
    kw, _ = jax.random.split(key)
    p = {"w": trunc_normal(kw, (kernel_size, in_channels // groups, out_channels), std)}
    if bias:
        p["b"] = jnp.zeros((out_channels,))
    return p


def conv_transpose1d_apply(
    p,
    x,
    stride: int,
    padding: int = 0,
    output_padding: int = 0,
    groups: int = 1,
):
    """Torch-semantics ConvTranspose1d via an input-dilated conv.

    out_len = (in - 1) * stride - 2 * padding + kernel + output_padding, which
    is what the reference's WaveGenerator/SamplingBlock upsamplers rely on
    (reference `wave_generator.py:40-50`, `samper.py:44-56`).

    Dense (groups == 1) transposed convs use a subpixel/phase decomposition:
    ceil(K/s) shifted matmuls producing s*Cout channels, reshaped to time —
    no zero-dilated input, every MAC useful, 6x faster than the lhs-dilated
    conv on the vocoder's upsample layers (v5e measured).  Grouped convs fall
    back to lax with lhs_dilation (XLA has no output_padding; the asymmetric
    explicit padding reproduces it).
    """
    quant = "w_q" in p
    w = p["w_q"] if quant else p["w"]
    dtype = x.dtype if quant else w.dtype
    x = x.astype(dtype)
    k = w.shape[0]
    if groups == 1:
        return _conv_transpose1d_subpixel(p, x, stride, padding, output_padding)
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(dtype),
        window_strides=(1,),
        padding=[(lo, hi)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if quant:
        y = y * p["scale"].astype(dtype)
    if "b" in p:
        y = y + p["b"]
    return y


def _conv_transpose1d_subpixel(p, x, stride: int, padding: int, output_padding: int):
    """Phase-decomposed transposed conv.  The stored kernel is the flipped
    forward-conv WIO kernel; torch tap m corresponds to w[K-1-m].  Output
    position t = s*u + φ - p with φ = (t+p) mod s pulls taps m = φ + s*d from
    inputs x[u-d]."""
    quant = "w_q" in p
    w = p["w_q"].astype(x.dtype) if quant else p["w"]
    k, cin, cout = w.shape
    s = stride
    d_taps = -(-k // s)
    b, t, _ = x.shape

    mats = []
    zero = jnp.zeros((cin, cout), w.dtype)
    for d in range(d_taps):
        cols = []
        for phi in range(s):
            idx = k - 1 - phi - s * d
            cols.append(w[idx] if 0 <= idx < k else zero)
        mats.append(jnp.concatenate(cols, axis=1))  # (Cin, s*Cout)

    out_len = (t - 1) * s - 2 * padding + k + output_padding
    u_max = (out_len - 1 + padding) // s
    extra = max(0, u_max - (t - 1))
    xp = jnp.pad(x, ((0, 0), (d_taps - 1, extra), (0, 0)))
    u_count = t + extra
    y = None
    for d in range(d_taps):
        xd = jax.lax.dynamic_slice_in_dim(xp, d_taps - 1 - d, u_count, 1)
        o = jnp.einsum("btc,cd->btd", xd, mats[d])
        y = o if y is None else y + o
    y = y.reshape(b, u_count * s, cout)[:, padding : padding + out_len]
    if quant:
        y = y * p["scale"].astype(y.dtype)
    if "b" in p:
        y = y + p["b"]
    return y


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------


def init_layer_norm(dim: int):
    return {"gamma": jnp.ones((dim,)), "beta": jnp.zeros((dim,))}


def layer_norm_apply(p, x, eps: float = 1e-6):
    # Normalize in fp32 for bf16 safety, cast back.
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["gamma"] + p["beta"]).astype(orig_dtype)


def init_ada_layer_norm(key, condition_dim: int, dim: int):
    """AdaLayerNorm: scale/shift produced from a condition vector (reference
    `vocos.py:87-110`; note reference inits scale weight to ones)."""
    k1, k2 = jax.random.split(key)
    scale = init_linear(k1, condition_dim, dim)
    shift = init_linear(k2, condition_dim, dim)
    scale["w"] = jnp.ones((condition_dim, dim))
    # scale BIAS inits to 1 so a zero condition vector modulates as identity
    # instead of zeroing the activation (the FSQ mid-code global token decodes
    # to an exactly-zero d-vector, which would silence the whole waveform at
    # random init; trained checkpoints overwrite this via the converter)
    scale["b"] = jnp.ones((dim,))
    shift["w"] = jnp.zeros((condition_dim, dim))
    return {"scale": scale, "shift": shift}


def ada_layer_norm_apply(p, x, cond, eps: float = 1e-6):
    """x: (B, T, C); cond: (B, condition_dim)."""
    scale = linear_apply(p["scale"], cond)  # (B, C)
    shift = linear_apply(p["shift"], cond)
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale[:, None, :] + shift[:, None, :]).astype(orig_dtype)


def init_batch_norm(dim: int):
    """Inference-mode BatchNorm1d params (running stats baked in at load)."""
    return {
        "gamma": jnp.ones((dim,)),
        "beta": jnp.zeros((dim,)),
        "mean": jnp.zeros((dim,)),
        "var": jnp.ones((dim,)),
    }


def batch_norm_apply(p, x, eps: float = 1e-5):
    """x: (..., C) channels-last; uses running statistics (eval mode)."""
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["gamma"] + p["beta"]


def init_rms_norm(dim: int):
    return {"gamma": jnp.ones((dim,))}


def rms_norm_apply(p, x, eps: float = 1e-6):
    """Qwen-style RMSNorm (variance over last dim, fp32 internally)."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)).astype(orig_dtype) * p["gamma"]


def l2norm_scale_apply(p, x, scale: float):
    """Perceiver RMSNorm variant: F.normalize(x) * sqrt(dim) * gamma
    (reference `perceiver_encoder.py:195-214`)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    y = x / jnp.maximum(norm, 1e-12)
    return y * scale * p["gamma"]


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def gelu(x):
    """Exact (erf) GELU — torch nn.GELU default used by the reference."""
    return jax.nn.gelu(x, approximate=False)


def snake(x, alpha):
    """Snake activation x + sin^2(alpha x) / alpha (reference
    `layers.py:33-39`).  alpha: (C,) broadcast over (B, T, C)."""
    s = jnp.sin(alpha * x)
    return x + s * s / (alpha + 1e-9)


def init_snake(channels: int):
    return {"alpha": jnp.ones((channels,))}


def snake_apply(p, x):
    return snake(x, p["alpha"])


def leaky_relu(x, negative_slope: float = 0.2):
    return jnp.where(x >= 0, x, negative_slope * x)


# ---------------------------------------------------------------------------
# Embedding
# ---------------------------------------------------------------------------


def init_embedding(key, num_embeddings: int, dim: int, std: float = 0.02):
    return {"w": std * jax.random.normal(key, (num_embeddings, dim))}


def embedding_apply(p, ids):
    return jnp.take(p["w"], ids, axis=0)
