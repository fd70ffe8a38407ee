"""Qwen LM parity vs HF transformers (tiny random model): prefill logits,
left-padded batches, KV-cache decode, and bit-faithful greedy generation
(SURVEY.md §7.3: greedy token sequences must match the reference exactly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sparktts_tpu import checkpoint as CKPT
from sparktts_tpu.config import QwenConfig
from sparktts_tpu.lm.generate import decode_step, generate, prefill
from sparktts_tpu.lm.qwen import init_kv_cache, prefill_inputs, qwen_forward

VOCAB = 128
EOS = 5
PAD = 3


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import Qwen2Config as HFConfig
    from transformers import Qwen2ForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=VOCAB,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rope_theta=1000000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=True,
        attention_dropout=0.0,
    )
    model = Qwen2ForCausalLM(hf_cfg).eval()
    cfg = QwenConfig(
        vocab_size=VOCAB,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        eos_token_id=EOS,
        pad_token_id=PAD,
    )
    params = CKPT.convert_qwen(CKPT.torch_state_to_numpy(model), cfg)
    return model, cfg, params


def test_prefill_logits_match_hf(hf_pair):
    model, cfg, params = hf_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(10, VOCAB, size=(2, 12)).astype(np.int32)

    with torch.no_grad():
        ref = model(torch.from_numpy(ids).long()).logits.numpy()

    cache = init_kv_cache(cfg, 2, 32, jnp.float32)
    mask = jnp.ones((2, 12), bool)
    positions, bias = prefill_inputs(mask, 32)
    logits, _ = qwen_forward(params, cfg, jnp.asarray(ids), positions, cache, 0, bias)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=1e-3, atol=1e-3)


def test_left_padded_prefill_matches_unpadded(hf_pair):
    _, cfg, params = hf_pair
    rng = np.random.default_rng(1)
    ids = rng.integers(10, VOCAB, size=(1, 8)).astype(np.int32)

    cache = init_kv_cache(cfg, 1, 24, jnp.float32)
    mask = jnp.ones((1, 8), bool)
    pos, bias = prefill_inputs(mask, 24)
    logits_ref, _ = qwen_forward(params, cfg, jnp.asarray(ids), pos, cache, 0, bias)

    # left-pad by 4 junk tokens
    padded = np.concatenate([np.full((1, 4), PAD, np.int32), ids], axis=1)
    mask_p = jnp.asarray(np.concatenate([np.zeros((1, 4), bool), np.ones((1, 8), bool)], axis=1))
    cache2 = init_kv_cache(cfg, 1, 24, jnp.float32)
    pos_p, bias_p = prefill_inputs(mask_p, 24)
    logits_p, _ = qwen_forward(params, cfg, jnp.asarray(padded), pos_p, cache2, 0, bias_p)

    np.testing.assert_allclose(
        np.asarray(logits_p[:, 4:]), np.asarray(logits_ref), rtol=1e-4, atol=1e-4
    )


def test_greedy_generate_matches_hf(hf_pair):
    model, cfg, params = hf_pair
    rng = np.random.default_rng(2)
    ids = rng.integers(10, VOCAB, size=(1, 6)).astype(np.int32)
    max_new = 12

    with torch.no_grad():
        out = model.generate(
            torch.from_numpy(ids).long(),
            max_new_tokens=max_new,
            do_sample=False,
            eos_token_id=None,
            pad_token_id=PAD,
        )
    ref_new = out[0, 6:].numpy()

    tokens, lengths = generate(
        params,
        cfg,
        jnp.asarray(ids),
        jnp.ones((1, 6), bool),
        jax.random.PRNGKey(0),
        max_new_tokens=max_new,
        cache_len=32,
        eos_ids=(),
        pad_id=PAD,
        greedy=True,
    )
    np.testing.assert_array_equal(np.asarray(tokens[0]), ref_new)


def test_generate_stops_at_eos(hf_pair):
    """Force a params hack: make EOS the argmax everywhere by biasing embed —
    instead simply check the loop respects eos when greedy decoding happens to
    produce it; use a crafted logit bias via a tiny vocab scan."""
    _, cfg, params = hf_pair
    rng = np.random.default_rng(3)
    ids = rng.integers(10, VOCAB, size=(2, 5)).astype(np.int32)
    tokens, lengths = generate(
        params,
        cfg,
        jnp.asarray(ids),
        jnp.ones((2, 5), bool),
        jax.random.PRNGKey(1),
        max_new_tokens=16,
        cache_len=32,
        eos_ids=tuple(range(VOCAB)),  # every token is EOS → stop after 1
        pad_id=PAD,
        greedy=True,
    )
    assert np.all(np.asarray(lengths) == 1)
    # everything after the first token is pad
    assert np.all(np.asarray(tokens[:, 1:]) == PAD)


def test_batched_sampled_generate_shapes(hf_pair):
    _, cfg, params = hf_pair
    rng = np.random.default_rng(4)
    b, t = 3, 10
    ids = rng.integers(10, VOCAB, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), bool)
    mask[1, :4] = False  # left-padded shorter prompt
    ids[1, :4] = PAD
    tokens, lengths = generate(
        params,
        cfg,
        jnp.asarray(ids),
        jnp.asarray(mask),
        jax.random.PRNGKey(2),
        max_new_tokens=8,
        cache_len=32,
        temperature=0.8,
        top_k=50,
        top_p=0.95,
        eos_ids=(EOS,),
        pad_id=PAD,
    )
    assert tokens.shape == (b, 8)
    assert np.all(np.asarray(lengths) <= 8)


def test_flash_prefill_generate_matches_bias_path(hf_pair):
    """generate with the Pallas flash prefill (interpret on CPU) must match
    the materialized-bias path token-for-token in greedy mode."""
    _, cfg, params = hf_pair
    rng = np.random.default_rng(7)
    b, t = 2, 64
    ids = rng.integers(10, VOCAB, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), bool)
    mask[1, :10] = False
    ids[1, :10] = PAD
    kwargs = dict(max_new_tokens=6, cache_len=t + 6, eos_ids=(), pad_id=PAD, greedy=True)
    tok_ref, _ = generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask), jax.random.PRNGKey(0), **kwargs
    )
    tok_flash, _ = generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask), jax.random.PRNGKey(0),
        use_flash=True, **kwargs
    )
    np.testing.assert_array_equal(np.asarray(tok_ref), np.asarray(tok_flash))


def test_mid_sequence_eos_stops_one_row(hf_pair):
    """A specific EOS terminates ONE row of the batch mid-sequence while the
    other row keeps generating (the old test used eos_ids=range(VOCAB), which
    only proved the loop stops when everything is EOS)."""
    _, cfg, params = hf_pair
    rng = np.random.default_rng(21)
    t = 8
    ids = rng.integers(10, VOCAB, size=(2, t)).astype(np.int32)
    mask = jnp.ones((2, t), bool)
    n = 10

    # sampled path (deterministic per key) — tiny greedy models degenerate to
    # one repeated token, which leaves no usable mid-sequence EOS candidate
    eos = None
    for seed in range(8):
        key = jax.random.PRNGKey(seed)
        free_run, _ = generate(
            params, cfg, jnp.asarray(ids), mask, key,
            max_new_tokens=n, cache_len=t + n, temperature=1.0, top_k=VOCAB,
            eos_ids=(), pad_id=PAD, cache_dtype=jnp.float32,
        )
        free_run = np.asarray(free_run)
        # an EOS id whose FIRST occurrence in row 0 is mid-sequence and that
        # never appears in row 1
        for k in range(1, n - 1):
            cand = int(free_run[0, k])
            if cand not in free_run[1] and cand not in free_run[0, :k] and cand != PAD:
                eos, k_hit = cand, k
                break
        if eos is not None:
            break
    assert eos is not None, f"no usable eos candidate in {free_run}"

    toks, lengths = generate(
        params, cfg, jnp.asarray(ids), mask, key,
        max_new_tokens=n, cache_len=t + n, temperature=1.0, top_k=VOCAB,
        eos_ids=(eos,), pad_id=PAD, cache_dtype=jnp.float32,
    )
    toks, lengths = np.asarray(toks), np.asarray(lengths)
    # row 0 stops right after its EOS (EOS included, HF semantics)
    assert lengths[0] == k_hit + 1
    np.testing.assert_array_equal(toks[0, : k_hit + 1], free_run[0, : k_hit + 1])
    assert (toks[0, k_hit + 1 :] == PAD).all()
    # row 1 is unaffected and runs to the budget
    assert lengths[1] == n
    np.testing.assert_array_equal(toks[1], free_run[1])


def test_guided_full_cover_slice_matches_unconstrained(hf_pair):
    """A vocab_slice covering the whole vocab must reproduce the
    unconstrained greedy token sequence exactly (index mapping identity)."""
    _, cfg, params = hf_pair
    rng = np.random.default_rng(11)
    ids = rng.integers(10, VOCAB, size=(2, 7)).astype(np.int32)
    mask = jnp.ones((2, 7), bool)
    kwargs = dict(max_new_tokens=8, cache_len=16, eos_ids=(), pad_id=PAD, greedy=True)
    ref, _ = generate(params, cfg, jnp.asarray(ids), mask, jax.random.PRNGKey(0), **kwargs)
    got, _ = generate(
        params, cfg, jnp.asarray(ids), mask, jax.random.PRNGKey(0),
        vocab_slice=(0, VOCAB), **kwargs
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_guided_decode_emits_only_allowed_ids(hf_pair):
    """With vocab_slice + extra_ids, every emitted token is in the allowed
    set, and greedy picks the argmax over exactly that set."""
    _, cfg, params = hf_pair
    rng = np.random.default_rng(12)
    lo, hi = 40, 72
    ids = rng.integers(10, VOCAB, size=(1, 6)).astype(np.int32)
    mask = jnp.ones((1, 6), bool)
    toks, lengths = generate(
        params, cfg, jnp.asarray(ids), mask, jax.random.PRNGKey(3),
        max_new_tokens=10, cache_len=20, eos_ids=(EOS,), pad_id=PAD,
        greedy=True, vocab_slice=(lo, hi), extra_ids=(EOS,),
    )
    toks, n = np.asarray(toks)[0], int(np.asarray(lengths)[0])
    allowed = set(range(lo, hi)) | {EOS}
    assert all(int(t) in allowed for t in toks[:n])

    # cross-check the first guided greedy token against a full-vocab forward
    # masked down to the allowed set
    cache = init_kv_cache(cfg, 1, 20, jnp.float32)
    pos, bias = prefill_inputs(mask, 20)
    logits, _ = qwen_forward(params, cfg, jnp.asarray(ids), pos, cache, 0, bias)
    full = np.asarray(logits[0, -1])
    masked = np.full_like(full, -np.inf)
    masked[lo:hi] = full[lo:hi]
    masked[EOS] = full[EOS]
    assert int(toks[0]) == int(np.argmax(masked))


def test_guided_sampled_decode_respects_constraint(hf_pair):
    """Sampling (temperature/top-k/top-p) through the constrained path also
    only emits allowed ids, across a batch with left-padding."""
    _, cfg, params = hf_pair
    rng = np.random.default_rng(13)
    b, t = 3, 9
    ids = rng.integers(10, VOCAB, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), bool)
    mask[2, :3] = False
    ids[2, :3] = PAD
    lo, hi = 16, 48
    toks, lengths = generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask), jax.random.PRNGKey(5),
        max_new_tokens=12, cache_len=t + 12, temperature=1.0, top_k=20, top_p=0.9,
        eos_ids=(EOS,), pad_id=PAD, vocab_slice=(lo, hi), extra_ids=(EOS,),
    )
    toks, lengths = np.asarray(toks), np.asarray(lengths)
    allowed = set(range(lo, hi)) | {EOS}
    for i in range(b):
        assert all(int(x) in allowed for x in toks[i, : lengths[i]])


def test_decode_window_matches_bias_path(hf_pair):
    """The index-compare decode mask (decode_window) must be numerically
    identical to the materialized fp32 bias it replaced."""
    _, cfg, params = hf_pair
    rng = np.random.default_rng(14)
    b, t, s = 2, 6, 16
    ids = rng.integers(10, VOCAB, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), bool)
    mask[1, :2] = False
    cache = init_kv_cache(cfg, b, s, jnp.float32)
    pos, bias = prefill_inputs(jnp.asarray(mask), s)
    _, cache = qwen_forward(params, cfg, jnp.asarray(ids), pos, cache, 0, bias)

    start = jnp.asarray([0, 2], jnp.int32)
    cache_pos = jnp.asarray(t, jnp.int32)
    next_tok = jnp.asarray([[7], [9]], jnp.int32)
    positions = jnp.asarray([[t], [t - 2]], jnp.int32)

    # legacy bias path
    k_idx = jnp.arange(s)[None, None, :]
    legacy = jnp.where(
        (k_idx >= start[:, None, None]) & (k_idx <= cache_pos), 0.0, -1e9
    ).astype(jnp.float32)
    logits_bias, _ = qwen_forward(params, cfg, next_tok, positions, cache, t, legacy)
    logits_win, _ = qwen_forward(
        params, cfg, next_tok, positions, cache, t, None,
        decode_window=(start, cache_pos),
    )
    np.testing.assert_allclose(
        np.asarray(logits_bias), np.asarray(logits_win), rtol=1e-6, atol=1e-6
    )
