"""int8 weight-only quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from sparktts_tpu.config import QwenConfig
from sparktts_tpu.lm.generate import generate
from sparktts_tpu.lm.qwen import init_kv_cache, init_qwen, prefill_inputs, qwen_forward
from sparktts_tpu.lm.quant import quantize_linear_int8, quantize_qwen_int8
from sparktts_tpu.nn.layers import init_linear, linear_apply

CFG = QwenConfig(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    eos_token_id=0,
    pad_token_id=1,
)


def test_quantized_linear_close_to_fp():
    p = init_linear(jax.random.PRNGKey(0), 64, 128, std=0.5)
    q = quantize_linear_int8(p)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
    y_fp = linear_apply(p, x)
    y_q = linear_apply(q, x)
    # int8 per-channel: relative error well under 1%
    rel = np.abs(np.asarray(y_q - y_fp)).mean() / (np.abs(np.asarray(y_fp)).mean() + 1e-9)
    assert rel < 0.01, rel


def test_quantized_qwen_logits_close():
    params = init_qwen(jax.random.PRNGKey(0), CFG)
    qparams = quantize_qwen_int8(params)
    ids = jnp.asarray(np.random.default_rng(0).integers(5, 250, size=(1, 8)), jnp.int32)
    cache = init_kv_cache(CFG, 1, 16, jnp.float32)
    mask = jnp.ones((1, 8), bool)
    pos, bias = prefill_inputs(mask, 16)
    logits_fp, _ = qwen_forward(params, CFG, ids, pos, cache, 0, bias)
    cache2 = init_kv_cache(CFG, 1, 16, jnp.float32)
    logits_q, _ = qwen_forward(qparams, CFG, ids, pos, cache2, 0, bias)
    # top-1 agreement on most positions (random net, loose but meaningful)
    top_fp = np.asarray(jnp.argmax(logits_fp, -1))
    top_q = np.asarray(jnp.argmax(logits_q, -1))
    assert (top_fp == top_q).mean() >= 0.7


def test_quantized_generate_runs():
    params = init_qwen(jax.random.PRNGKey(0), CFG)
    qparams = quantize_qwen_int8(params)
    ids = jnp.asarray(np.random.default_rng(1).integers(5, 250, size=(2, 8)), jnp.int32)
    tokens, lengths = generate(
        qparams,
        CFG,
        ids,
        jnp.ones((2, 8), bool),
        jax.random.PRNGKey(0),
        max_new_tokens=4,
        cache_len=16,
        eos_ids=(),
        pad_id=1,
        greedy=True,
    )
    assert tokens.shape == (2, 4)
    assert np.all(np.asarray(tokens) >= 0)


def test_quantized_memory_halved():
    params = init_qwen(jax.random.PRNGKey(0), CFG, dtype=jnp.bfloat16)
    qparams = quantize_qwen_int8(params)

    def nbytes(t):
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(t))

    assert nbytes(qparams) < 0.75 * nbytes(params)


def test_int4_weight_only_close_to_fp():
    """Group-wise int4: logits stay close to fp32 and greedy generation over
    a short horizon matches (tiny model, small vocab)."""
    from sparktts_tpu.lm.quant import quantize_qwen_int4

    params = init_qwen(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    qparams = quantize_qwen_int4(params, group=16)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(10, CFG.vocab_size, size=(2, 10)), jnp.int32)
    pos, bias = prefill_inputs(jnp.ones((2, 10), bool), 16)
    cache = init_kv_cache(CFG, 2, 16, jnp.float32)
    cache2 = init_kv_cache(CFG, 2, 16, jnp.float32)
    logits_fp, _ = qwen_forward(params, CFG, ids, pos, cache, 0, bias)
    logits_q4, _ = qwen_forward(qparams, CFG, ids, pos, cache2, 0, bias)
    # int4 is lossier than int8; correlation must stay near-perfect
    a = np.asarray(logits_fp).reshape(-1)
    b = np.asarray(logits_q4).reshape(-1)
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99, corr


def test_int4_generate_runs_and_is_guided_compatible():
    from sparktts_tpu.lm.generate import generate
    from sparktts_tpu.lm.quant import quantize_qwen_int4

    params = init_qwen(jax.random.PRNGKey(1), CFG, dtype=jnp.float32)
    qparams = quantize_qwen_int4(params, group=16)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(10, CFG.vocab_size, size=(1, 8)), jnp.int32)
    toks, lengths = generate(
        qparams, CFG, ids, jnp.ones((1, 8), bool), jax.random.PRNGKey(0),
        max_new_tokens=8, cache_len=24, eos_ids=(), pad_id=0,
        vocab_slice=(8, 40), extra_ids=(5,),
    )
    t = np.asarray(toks)[0]
    assert all(8 <= x < 40 or x == 5 for x in t)


def test_int4_untied_head_guided_decoding():
    """head_logits must handle the nibble-packed int4 head under a vocab
    constraint (untied-embeddings config)."""
    import dataclasses

    from sparktts_tpu.lm.generate import generate
    from sparktts_tpu.lm.quant import quantize_qwen_int4

    cfg = dataclasses.replace(CFG, tie_word_embeddings=False)
    params = init_qwen(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    qparams = quantize_qwen_int4(params, group=16)
    assert "w_p4" in qparams["lm_head"]
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(10, cfg.vocab_size, size=(1, 8)), jnp.int32)
    toks, _ = generate(
        qparams, cfg, ids, jnp.ones((1, 8), bool), jax.random.PRNGKey(0),
        max_new_tokens=6, cache_len=24, eos_ids=(), pad_id=0,
        greedy=True, vocab_slice=(8, 40), extra_ids=(5,),
    )
    t = np.asarray(toks)[0]
    assert all(8 <= x < 40 or x == 5 for x in t)

    # guided greedy must agree with the dense int4 argmax over the slice
    from sparktts_tpu.lm.qwen import head_logits, init_kv_cache, prefill_inputs, qwen_forward

    cache = init_kv_cache(cfg, 1, 24, jnp.float32)
    pos, bias = prefill_inputs(jnp.ones((1, 8), bool), 24)
    full, _ = qwen_forward(qparams, cfg, ids, pos, cache, 0, bias)
    masked = np.full(cfg.vocab_size, -np.inf)
    masked[8:40] = np.asarray(full)[0, -1, 8:40]
    masked[5] = np.asarray(full)[0, -1, 5]
    assert int(t[0]) == int(np.argmax(masked))


def test_constrained_int4_head_slices_before_dequant():
    """The guided-decoding int4 head path must dequantize ONLY the
    constrained columns (params are traced, so a full-table dequant would
    materialize (H, V) fp32 at runtime) and match the full-dequant result."""
    from sparktts_tpu.lm.quant import quantize_linear_int4, unpack_int4
    from sparktts_tpu.lm.qwen import head_logits

    rng = np.random.default_rng(0)
    H, V = 32, 64
    w = jnp.asarray(rng.standard_normal((H, V)), jnp.float32)
    head_q = quantize_linear_int4({"w": w}, group=8)
    x = jnp.asarray(rng.standard_normal((1, 1, H)), jnp.float32)

    packed, gs = head_q["w_p4"], head_q["gscale"]
    w_full = unpack_int4(packed)
    w_full = w_full * jnp.repeat(gs, w_full.shape[0] // gs.shape[-2], axis=-2)
    lo, hi, extras = 10, 30, (40, 3)
    ref_rows = jnp.concatenate(
        [w_full.T[lo:hi], jnp.take(w_full.T, jnp.asarray(extras), axis=0)], 0
    )
    ref = jnp.einsum("bth,vh->btv", x, ref_rows)
    got = head_logits({"lm_head": head_q}, x, vocab_slice=(lo, hi), extra_ids=extras)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_int8_quantize_passes_through_quantized_embed():
    """Re-quantizing a tree whose embedding is already int8 must pass the
    dict through (same guard the int4 path has) instead of crashing."""
    from sparktts_tpu.lm.quant import quantize_qwen_int8

    params = init_qwen(jax.random.PRNGKey(0), CFG)
    once = quantize_qwen_int8(params)
    twice_embed_src = dict(params)
    twice_embed_src["embed"] = once["embed"]  # already-quantized embedding
    out = quantize_qwen_int8(twice_embed_src)
    assert out["embed"] is once["embed"]
