"""Qwen2.5 causal LM in JAX: prefill + single-token decode with a
preallocated KV cache.

TPU-native replacement for the reference's HF `model.generate` local path
(reference `cli/SparkTTS.py:197-204`) and its TensorRT-LLM serving engine
(reference `runtime/triton_trtllm/` — see SURVEY.md §2.2).  Design:

  * Left-padded prompts → every sequence's cache is aligned at the right
    edge of the prefill window, so decode steps append at one shared static
    position (single `dynamic_update_slice`); continuous batching uses the
    per-sequence scatter path instead (`_write_kv_at_layer` vector form).
  * KV cache is a pair of (L, B, S, n_kv, hd) arrays threaded through the
    layer scan as an aliasable CARRY — XLA updates it in place in HBM, no
    per-step cache copies.
  * GQA (14 query / 2 kv heads for 0.5B): kv heads broadcast inside einsum,
    never materialized repeated.
  * RoPE applied in fp32; logits in fp32; everything else follows the params
    dtype (bf16 in production).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparktts_tpu.config import QwenConfig
from sparktts_tpu.nn.layers import init_linear, linear_apply, rms_norm_apply


def _decode_kernel_mode() -> str:
    """Dense-decode attention implementation: 'xla' (einsum chain) or
    'kernel' (fused Pallas core, kernels/decode_attention.py).

    SPARKTTS_DECODE_KERNEL=1/0 forces; 'auto' (default) selects the kernel
    on real TPUs and the XLA path on CPU (interpret-mode Pallas is test-only
    — the kernel parity suite covers it explicitly).  Measured on v5e at
    production dims (BENCH_NOTES decode ablation + A/B): 1.083 → 0.960
    ms/token greedy (−11%), the attention-core kernel-boundary overhead the
    ablation attributed."""
    v = os.environ.get("SPARKTTS_DECODE_KERNEL", "auto").lower()
    if v in ("1", "true", "kernel"):
        return "kernel"
    if v in ("0", "false", "xla"):
        return "xla"
    # the tunneled axon relay ALSO reports default_backend() == "tpu" (its
    # PJRT platform name; verified in recorded BENCH_DATASET artifacts), so
    # this gate engages there; "== tpu" (not "!= cpu") keeps Mosaic kernels
    # off hypothetical GPU backends
    return "kernel" if jax.default_backend() == "tpu" else "xla"


class KVCache(NamedTuple):
    k: jax.Array  # (L, B, S, n_kv, hd)
    v: jax.Array  # (L, B, S, n_kv, hd)

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def aligned_cache_len(n: int) -> int:
    """Round a KV-cache length up to 64 so the fused decode-attention
    kernel's S-blocking applies (kernels/decode_attention.py requires
    S % block == 0 with block >= 64; an unaligned cache silently falls back
    to the XLA attention path).  Every cache-sizing site must use this —
    alignment lives here, not per call site."""
    return ((n + 63) // 64) * 64


def init_kv_cache(cfg: QwenConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.num_hidden_layers, batch, max_len, cfg.num_key_value_heads, cfg.head_dim)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_qwen(key, cfg: QwenConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.num_hidden_layers + 3)
    h = cfg.hidden_size
    q_dim = cfg.num_attention_heads * cfg.head_dim
    kv_dim = cfg.num_key_value_heads * cfg.head_dim

    layers = []
    for i in range(cfg.num_hidden_layers):
        ks = jax.random.split(keys[i], 7)
        layers.append(
            {
                "ln1": {"gamma": jnp.ones((h,))},
                # q/k/v fused into one column block, likewise gate/up: decode
                # is matvec-latency-bound, fewer bigger matmuls win
                "qkv": init_linear(ks[0], h, q_dim + 2 * kv_dim),
                "o": init_linear(ks[3], q_dim, h, bias=False),
                "ln2": {"gamma": jnp.ones((h,))},
                "gateup": init_linear(ks[4], h, 2 * cfg.intermediate_size, bias=False),
                "down": init_linear(ks[6], cfg.intermediate_size, h, bias=False),
            }
        )

    params = {
        "embed": 0.02 * jax.random.normal(keys[-1], (cfg.vocab_size, h)),
        # layers stored STACKED (leading dim L) so the forward pass is a
        # lax.scan over layers — the XLA program is one layer long instead of
        # 24 inlined copies (compile time) and weights stream layer-by-layer
        "layers": stack_layers(layers),
        "final_ln": {"gamma": jnp.ones((h,))},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = init_linear(keys[-2], h, cfg.vocab_size, bias=False)
    return jax.tree.map(lambda x: x.astype(dtype), params)


def stack_layers(layers: list) -> dict:
    """List of per-layer param dicts → one dict of (L, ...) stacked arrays."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *layers)


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------


def rope_frequencies(cfg: QwenConfig) -> np.ndarray:
    hd = cfg.head_dim
    return 1.0 / (cfg.rope_theta ** (np.arange(0, hd, 2, dtype=np.float64) / hd))


def apply_rope(x: jax.Array, positions: jax.Array, cfg: QwenConfig) -> jax.Array:
    """x: (B, T, n_heads, hd); positions: (B, T) int32.  HF 'neox' rotation
    (rotate_half over contiguous halves) in fp32."""
    inv_freq = jnp.asarray(rope_frequencies(cfg), dtype=jnp.float32)
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # (B, T, hd/2)
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x32 = x.astype(jnp.float32)
    x1, x2 = jnp.split(x32, 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _attention_block(
    layer,
    x: jax.Array,
    positions: jax.Array,
    cache_k: jax.Array,
    cache_v: jax.Array,
    layer_idx: jax.Array,
    write_pos: int | jax.Array,
    key_mask_bias: Optional[jax.Array],
    cfg: QwenConfig,
    flash_start: Optional[jax.Array] = None,
    decode_window: Optional[Tuple[jax.Array, jax.Array]] = None,
    allow_decode_kernel: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Shared attention for prefill (T>=1) and decode (T=1).

    allow_decode_kernel=False opts this call out of the fused Pallas decode
    kernel regardless of mode — REQUIRED for any module whose trace also
    contains a prefill-shaped attention (v5e miscompiles such modules; see
    kernels/decode_attention.py and lm/generate._decode_all).

    cache_k/v: (L, B, S, n_kv, hd) full stacked caches (aliasable scan carry);
    layer_idx selects the plane; new keys written at [write_pos, write_pos+T).
    key_mask_bias: (B, T, S) additive fp32 bias (0 valid / -inf invalid),
    already encoding causality and left-pad masking.  May be None when
    decode_window is given.

    flash_start: when given (prefill-from-zero only, T > 1), attention runs
    through the Pallas flash kernel over the freshly-computed K/V instead of
    the materialized-bias einsum path; `flash_start[b]` is the first non-pad
    slot (same semantics as the bias).

    decode_window: ((B,) start, scalar-or-(B,) pos) — T == 1 decode masking as
    an index compare fused into the scores, replacing the materialized
    (B, 1, S) fp32 bias (start[b] <= key slot <= pos is valid).
    """
    b, t, h = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    q, k, v = project_qkv(layer, x, positions, cfg)

    # cache_k/cache_v arrive as the FULL stacked caches (L, B, S, nkv, hd)
    # with `layer_idx` selecting this layer's plane: they live in the scan
    # carry so XLA aliases them in place across layers AND decode steps —
    # only the new token's K/V is written, nothing is copied per step.
    cache_k = _write_kv_at_layer(cache_k, k, layer_idx, write_pos)
    cache_v = _write_kv_at_layer(cache_v, v, layer_idx, write_pos)

    # largest Pallas tile that divides t (the kernel requires t % block == 0);
    # odd prompt buckets (non-multiple-of-8 t_pad) fall back to the dense path
    flash_block = next((bb for bb in (128, 64, 32, 16, 8) if t % bb == 0), None)
    if flash_start is not None and t > 1 and flash_block is not None:
        from sparktts_tpu.kernels.flash_attention import flash_attention_prefill

        out = flash_attention_prefill(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            flash_start,
            sm_scale=hd**-0.5,
            block_q=flash_block,
            block_k=flash_block,
            interpret=jax.default_backend() == "cpu",
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, t, nh * hd).astype(x.dtype)
        return linear_apply(layer["o"], out), cache_k, cache_v

    if (
        decode_window is not None
        and t == 1
        and allow_decode_kernel
        and _decode_kernel_mode() == "kernel"
    ):
        s_len = cache_k.shape[2]
        block_s = next((bb for bb in (512, 256, 128, 64) if s_len % bb == 0), None)
        if block_s is not None:
            from sparktts_tpu.kernels.decode_attention import dense_decode_attention

            start, pos = decode_window
            pos_b = jnp.broadcast_to(
                jnp.asarray(pos, jnp.int32), start.shape
            ).astype(jnp.int32)
            out = dense_decode_attention(
                q.reshape(b, nh, hd),
                cache_k,
                cache_v,
                layer_idx,
                start.astype(jnp.int32),
                pos_b,
                sm_scale=hd**-0.5,
                block_s=block_s,
                interpret=jax.default_backend() == "cpu",
            )
            out = out.reshape(b, 1, nh * hd).astype(x.dtype)
            return linear_apply(layer["o"], out), cache_k, cache_v

    ck = jax.lax.dynamic_index_in_dim(cache_k, layer_idx, 0, keepdims=False)
    cv = jax.lax.dynamic_index_in_dim(cache_v, layer_idx, 0, keepdims=False)
    group = nh // nkv
    qg = q.reshape(b, t, nkv, group, hd)
    scores = jnp.einsum(
        "btkgh,bskh->bkgts", qg, ck, preferred_element_type=jnp.float32
    ) * (hd**-0.5)
    if decode_window is not None:
        start, pos = decode_window
        k_idx = jnp.arange(ck.shape[1])  # (S,)
        valid = (k_idx[None, :] >= start[:, None]) & (
            k_idx[None, :] <= jnp.broadcast_to(pos, start.shape)[:, None]
        )  # (B, S)
        scores = jnp.where(valid[:, None, None, None, :], scores, -1e9)
    else:
        scores = scores + key_mask_bias[:, None, None, :, :]
    probs = jax.nn.softmax(scores, axis=-1).astype(cv.dtype)
    out = jnp.einsum("bkgts,bskh->btkgh", probs, cv)
    out = out.reshape(b, t, nh * hd).astype(x.dtype)
    return linear_apply(layer["o"], out), cache_k, cache_v


def _write_kv_at_layer(cache: jax.Array, new: jax.Array, layer_idx, write_pos) -> jax.Array:
    """Write new K/V (B, T, n_kv, hd) into the stacked cache (L, B, S, n_kv,
    hd) at plane `layer_idx`.

    write_pos scalar → one shared slot (aligned prefill/decode);
    write_pos (B,) vector → per-sequence scatter (continuous batching: every
    slot sits at its own sequence position; T must be 1)."""
    new = new.astype(cache.dtype)
    if isinstance(write_pos, jax.Array) and write_pos.ndim == 1:
        b = new.shape[0]
        return cache.at[layer_idx, jnp.arange(b), write_pos].set(new[:, 0])
    return jax.lax.dynamic_update_slice(
        cache, new[None], (layer_idx, 0, write_pos, 0, 0)
    )


def project_qkv(layer, x: jax.Array, positions: jax.Array, cfg: QwenConfig):
    """Fused QKV projection + RoPE, shared by the dense and paged decode
    paths.  x: (B, T, H) → q (B, T, nh, hd), k/v (B, T, nkv, hd)."""
    b, t, _ = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    qkv = linear_apply(layer["qkv"], x)
    q_dim, kv_dim = nh * hd, nkv * hd
    q = qkv[..., :q_dim].reshape(b, t, nh, hd)
    k = qkv[..., q_dim : q_dim + kv_dim].reshape(b, t, nkv, hd)
    v = qkv[..., q_dim + kv_dim :].reshape(b, t, nkv, hd)
    return apply_rope(q, positions, cfg), apply_rope(k, positions, cfg), v


def _mlp_kernel_mode() -> str:
    """Fused int8 MLP matvec for decode: 'xla' or 'kernel'
    (kernels/int8_mlp.py).  SPARKTTS_MLP_KERNEL=1/0 forces; 'auto'
    (default) currently selects XLA everywhere — the kernel is gated off
    until it has a measured win on the target TPU (flip here when it does;
    same protocol as the decode-attention kernel's rollout)."""
    v = os.environ.get("SPARKTTS_MLP_KERNEL", "auto").lower()
    if v in ("1", "true", "kernel"):
        return "kernel"
    return "xla"


def mlp_block(layer, x: jax.Array, decode_fused: bool = False) -> jax.Array:
    gu_p, down_p = layer["gateup"], layer["down"]
    if (
        decode_fused
        and "w_q" in gu_p
        and "w_q" in down_p
        # the kernel computes no biases on either projection — fall back to
        # XLA if a variant carries them rather than silently dropping one
        and "b" not in gu_p
        and "b" not in down_p
        # matvec regime only: weight streaming dominates to ~16 rows (one
        # VMEM-resident activation tile); larger batches amortize weights
        # and the plain MXU matmuls win
        and x.shape[0] * x.shape[1] <= 16
        and _mlp_kernel_mode() == "kernel"
    ):
        from sparktts_tpu.kernels.int8_mlp import int8_mlp_matvec, mlp_block_size

        block_i = mlp_block_size(down_p["w_q"].shape[0])
        if block_i is not None:
            b, t, h = x.shape
            y = int8_mlp_matvec(
                x.reshape(b * t, h),
                gu_p["w_q"],
                gu_p["scale"],
                down_p["w_q"],
                down_p["scale"],
                block_i=block_i,
                interpret=jax.default_backend() == "cpu",
            )
            return y.reshape(b, t, h)
    gu = linear_apply(gu_p, x)
    gate, up = jnp.split(gu, 2, axis=-1)
    return linear_apply(down_p, jax.nn.silu(gate) * up)


def qwen_forward(
    params,
    cfg: QwenConfig,
    input_ids: jax.Array,        # (B, T)
    positions: jax.Array,        # (B, T) RoPE positions
    cache: KVCache,
    write_pos: int | jax.Array,  # cache slot of input_ids[:, 0]
    key_mask_bias: Optional[jax.Array],  # (B, T, S) additive bias
    flash_start: Optional[jax.Array] = None,  # enable Pallas flash prefill
    decode_window: Optional[Tuple[jax.Array, jax.Array]] = None,
    vocab_slice: Optional[Tuple[int, int]] = None,
    extra_ids: Tuple[int, ...] = (),
    logits_last_only: bool = False,
    scan_unroll: int = 1,
    allow_decode_kernel: bool = True,
) -> Tuple[jax.Array, KVCache]:
    """Token ids → logits (B, T, V) and updated cache.

    The transformer stack runs as a lax.scan over the stacked layer params —
    one compiled layer body regardless of depth.  The KV caches travel in the
    scan CARRY (not as per-layer outputs) so XLA aliases them in place across
    layers and across decode steps — no whole-cache copies per token.

    decode_window: optional ((B,) start, scalar pos) valid-key window for
    T == 1 decode — the mask is an index compare fused into the attention
    einsum, no (B, 1, S) fp32 bias materialized per step (pass
    key_mask_bias=None then).

    vocab_slice/extra_ids: optional static constraint on the OUTPUT vocabulary
    (guided decoding).  Logits are computed only over embedding rows
    [lo, hi) plus `extra_ids`, returned in that packed order — for a TTS task
    the legal emission set is ~8k semantic tokens + EOS out of a 166k vocab,
    so this cuts the logits matmul and the sampler's top-k to <8%% of the
    full-vocab cost (the reference samples the full vocab and regex-drops
    illegal tokens afterwards, cli/SparkTTS.py:213-228).

    logits_last_only: compute logits for the final position only (prefill
    needs just the next-token distribution; skips a (B, T, V) materialize).

    scan_unroll: unroll factor for the layer scan — each scan-iteration
    boundary on TPU costs scalar-core sequencing + a fresh weight-slice DMA
    prologue; unrolling N layers per iteration amortizes that at N× the
    layer-body compile size.  Measured on v5e at decode shapes
    (scripts/bench_decode_step.py): unroll=2/4 are 18-27% SLOWER than
    unroll=1 — the larger body breaks XLA's weight-stream double buffering
    (two layers' weights must be VMEM-resident at once), which costs more
    than the boundary saves.  Default 1 is the production setting; the knob
    stays for attribution experiments.
    """
    x = embed_lookup(params, input_ids)

    def layer_step(carry, layer):
        x, ck_all, cv_all, li = carry
        residual = x
        y = rms_norm_apply(layer["ln1"], x, eps=cfg.rms_norm_eps)
        attn_out, ck_all, cv_all = _attention_block(
            layer, y, positions, ck_all, cv_all, li, write_pos, key_mask_bias, cfg,
            flash_start=flash_start, decode_window=decode_window,
            allow_decode_kernel=allow_decode_kernel,
        )
        x = residual + attn_out
        y = rms_norm_apply(layer["ln2"], x, eps=cfg.rms_norm_eps)
        # the fused MLP kernel follows the decode-attention kernel's module
        # hazard rule: decode-shaped modules only (see allow_decode_kernel)
        x = x + mlp_block(
            layer, y,
            decode_fused=(
                decode_window is not None
                and input_ids.shape[1] == 1
                and allow_decode_kernel
            ),
        )
        return (x, ck_all, cv_all, li + 1), None

    (x, new_k, new_v, _), _ = jax.lax.scan(
        layer_step,
        (x, cache.k, cache.v, jnp.zeros((), jnp.int32)),
        params["layers"],
        unroll=scan_unroll,
    )

    if logits_last_only:
        x = x[:, -1:]
    x = rms_norm_apply(params["final_ln"], x, eps=cfg.rms_norm_eps)
    if cfg.tie_word_embeddings:
        logits = lm_logits(params, x, vocab_slice=vocab_slice, extra_ids=extra_ids)
    else:
        logits = head_logits(params, x, vocab_slice=vocab_slice, extra_ids=extra_ids)
    return logits, KVCache(k=new_k, v=new_v)


def embed_lookup(params, input_ids: jax.Array) -> jax.Array:
    """Embedding lookup; supports int8 per-row-quantized tables (lm/quant.py).
    Compute dtype follows the (unquantized) norm params."""
    emb = params["embed"]
    if isinstance(emb, dict):
        dt = params["final_ln"]["gamma"].dtype
        rows = jnp.take(emb["w_q"], input_ids, axis=0).astype(dt)
        return rows * jnp.take(emb["scale"], input_ids, axis=0).astype(dt)
    return jnp.take(emb, input_ids, axis=0)


def _select_vocab_rows(w: jax.Array, vocab_slice, extra_ids):
    """Static row selection for constrained logits: rows [lo, hi) then the
    `extra_ids` rows, concatenated (w is (V, ...))."""
    lo, hi = vocab_slice
    rows = jax.lax.slice_in_dim(w, lo, hi, axis=0)
    if extra_ids:
        ex = jnp.take(w, jnp.asarray(extra_ids, jnp.int32), axis=0)
        rows = jnp.concatenate([rows, ex], axis=0)
    return rows


def lm_logits(
    params,
    x: jax.Array,
    vocab_slice: Optional[Tuple[int, int]] = None,
    extra_ids: Tuple[int, ...] = (),
) -> jax.Array:
    """Tied-embedding logits in fp32; int8 tables apply the per-row scale to
    the matmul output (no dequantized table materialized).  With vocab_slice,
    only rows [lo, hi) + extra_ids participate (guided decoding)."""
    emb = params["embed"]
    if isinstance(emb, dict):
        w, scale = emb["w_q"], emb["scale"][:, 0]
    else:
        w, scale = emb, None
    if vocab_slice is not None:
        w = _select_vocab_rows(w, vocab_slice, extra_ids)
        if scale is not None:
            scale = _select_vocab_rows(scale, vocab_slice, extra_ids)
    logits = jnp.einsum(
        "bth,vh->btv", x, w.astype(x.dtype), preferred_element_type=jnp.float32
    )
    return logits if scale is None else logits * scale


def head_logits(
    params,
    x: jax.Array,
    vocab_slice: Optional[Tuple[int, int]] = None,
    extra_ids: Tuple[int, ...] = (),
) -> jax.Array:
    """Untied lm_head logits in fp32 with optional vocab constraint (the head
    weight is (H, V): selection transposes row-selection onto columns)."""
    head = params["lm_head"]
    if vocab_slice is None:
        return linear_apply(head, x).astype(jnp.float32)
    if "w_p4" in head:
        # int4 nibble-packed head: the vocab lives on the OUT (column) axis
        # of the packed (H/2, V) table, so slice the constrained columns
        # FIRST and dequantize only those — params are traced jit arguments,
        # so a full-table dequant would materialize the whole (H, V) fp32
        # matrix at RUNTIME (hundreds of MB per invocation), not at compile
        # time.
        from sparktts_tpu.lm.quant import unpack_int4

        packed, gs = head["w_p4"], head["gscale"]   # (in/2, out), (G, out)
        lo, hi = vocab_slice
        cols_p = [packed[:, lo:hi]]
        cols_g = [gs[:, lo:hi]]
        if extra_ids:
            ex = jnp.asarray(extra_ids, jnp.int32)
            cols_p.append(jnp.take(packed, ex, axis=1))
            cols_g.append(jnp.take(gs, ex, axis=1))
        packed_s = jnp.concatenate(cols_p, axis=1) if len(cols_p) > 1 else cols_p[0]
        gs_s = jnp.concatenate(cols_g, axis=1) if len(cols_g) > 1 else cols_g[0]
        w_sel = unpack_int4(packed_s)               # (H, V_sel)
        group = w_sel.shape[0] // gs_s.shape[-2]
        w_sel = w_sel * jnp.repeat(gs_s, group, axis=-2)
        w, scale = w_sel.T, None
    elif "w_q" in head:
        w = _select_vocab_rows(head["w_q"].T, vocab_slice, extra_ids)
        scale = _select_vocab_rows(head["scale"].reshape(-1), vocab_slice, extra_ids)
    else:
        w, scale = _select_vocab_rows(head["w"].T, vocab_slice, extra_ids), None
    logits = jnp.einsum(
        "bth,vh->btv", x, w.astype(x.dtype), preferred_element_type=jnp.float32
    )
    if scale is not None:
        logits = logits * scale
    if "b" in head:
        logits = logits + _select_vocab_rows(head["b"], vocab_slice, extra_ids)
    return logits


# ---------------------------------------------------------------------------
# masks / positions for the left-padded layout
# ---------------------------------------------------------------------------


def prefill_inputs(prompt_mask: jax.Array, max_cache_len: int):
    """prompt_mask: (B, T_pad) bool, True on real (non-pad) tokens, prompts
    left-padded.  Returns (positions (B, T_pad), key_mask_bias (B, T_pad, S))."""
    b, t = prompt_mask.shape
    positions = jnp.maximum(jnp.cumsum(prompt_mask.astype(jnp.int32), axis=1) - 1, 0)
    q_idx = jnp.arange(t)[None, :, None]             # query cache slot
    k_idx = jnp.arange(max_cache_len)[None, None, :]  # key cache slot
    causal = k_idx <= q_idx                           # (1, T, S)
    # keys valid when inside the prefill window AND not a left-pad token
    pad_ok = jnp.pad(prompt_mask, ((0, 0), (0, max_cache_len - t)))[:, None, :]
    bias = jnp.where(causal & pad_ok, 0.0, -1e9).astype(jnp.float32)
    return positions, bias


