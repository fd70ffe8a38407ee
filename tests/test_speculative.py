"""Speculative decoding: the greedy invariant — output must be bit-identical
to vanilla greedy `generate` of the target, for ANY draft (perfect draft,
random draft, early-exit self-speculative draft)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparktts_tpu.config import QwenConfig
from sparktts_tpu.lm.generate import generate
from sparktts_tpu.lm.qwen import init_qwen
from sparktts_tpu.lm.speculative import (
    draft_config,
    draft_from_layers,
    speculative_generate_greedy,
)

VOCAB = 96
EOS = 5
PAD = 3

CFG = QwenConfig(
    vocab_size=VOCAB,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=4,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    eos_token_id=EOS,
    pad_token_id=PAD,
)


@pytest.fixture(scope="module")
def target():
    return init_qwen(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def _vanilla(params, ids, mask, max_new, eos_ids=()):
    toks, lengths = generate(
        params, CFG, jnp.asarray(ids), jnp.asarray(mask), jax.random.PRNGKey(0),
        max_new_tokens=max_new, cache_len=ids.shape[1] + max_new + 8,
        eos_ids=eos_ids, pad_id=PAD, greedy=True,
    )
    return np.asarray(toks), np.asarray(lengths)


def _spec(params, draft, dcfg, ids, mask, max_new, k=4, eos_ids=(), **kw):
    toks, lengths, acc = speculative_generate_greedy(
        params, draft, CFG, dcfg, jnp.asarray(ids), jnp.asarray(mask),
        max_new_tokens=max_new, cache_len=ids.shape[1] + max_new + 8, k=k,
        eos_ids=eos_ids, pad_id=PAD, **kw,
    )
    return np.asarray(toks), np.asarray(lengths), int(acc)


def test_perfect_draft_accepts_everything(target):
    rng = np.random.default_rng(0)
    ids = rng.integers(10, VOCAB, size=(1, 8)).astype(np.int32)
    mask = np.ones((1, 8), bool)
    ref, ref_len = _vanilla(target, ids, mask, 16)
    got, got_len, acc = _spec(target, target, CFG, ids, mask, 16, k=4)
    np.testing.assert_array_equal(ref, got)
    np.testing.assert_array_equal(ref_len, got_len)
    # draft == target: every proposal is accepted (k-1 per round)
    assert acc >= 16 // 4 * 3


def test_random_draft_still_exact(target):
    """The invariant: a draft with completely different weights changes only
    the speed, never the output."""
    draft = init_qwen(jax.random.PRNGKey(42), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = rng.integers(10, VOCAB, size=(1, 8)).astype(np.int32)
    mask = np.ones((1, 8), bool)
    ref, ref_len = _vanilla(target, ids, mask, 16)
    got, got_len, acc = _spec(target, draft, CFG, ids, mask, 16, k=4)
    np.testing.assert_array_equal(ref, got)
    np.testing.assert_array_equal(ref_len, got_len)


def test_self_speculative_early_exit_draft(target):
    draft = draft_from_layers(target, 2)
    dcfg = draft_config(CFG, 2)
    rng = np.random.default_rng(2)
    ids = rng.integers(10, VOCAB, size=(1, 8)).astype(np.int32)
    mask = np.ones((1, 8), bool)
    ref, _ = _vanilla(target, ids, mask, 20)
    got, _, acc = _spec(target, draft, dcfg, ids, mask, 20, k=3)
    np.testing.assert_array_equal(ref, got)


def test_batched_left_padded_exact(target):
    draft = draft_from_layers(target, 2)
    dcfg = draft_config(CFG, 2)
    rng = np.random.default_rng(3)
    b, t = 3, 10
    ids = rng.integers(10, VOCAB, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), bool)
    mask[1, :4] = False
    ids[1, :4] = PAD
    ref, ref_len = _vanilla(target, ids, mask, 12)
    got, got_len, _ = _spec(target, draft, dcfg, ids, mask, 12, k=3)
    np.testing.assert_array_equal(ref, got)
    np.testing.assert_array_equal(ref_len, got_len)


def test_eos_semantics_match_vanilla(target):
    """Pick an EOS id that actually fires mid-stream in the greedy output and
    check per-row termination matches vanilla exactly."""
    draft = init_qwen(jax.random.PRNGKey(7), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    ids = rng.integers(10, VOCAB, size=(2, 6)).astype(np.int32)
    mask = np.ones((2, 6), bool)
    free, _ = _vanilla(target, ids, mask, 14)
    eos = None
    for cand in free[0][2:]:
        if cand != PAD:
            eos = int(cand)
            break
    assert eos is not None
    ref, ref_len = _vanilla(target, ids, mask, 14, eos_ids=(eos,))
    got, got_len, _ = _spec(target, draft, CFG, ids, mask, 14, k=4, eos_ids=(eos,))
    np.testing.assert_array_equal(ref, got)
    np.testing.assert_array_equal(ref_len, got_len)


def test_guided_constraint_path(target):
    draft = draft_from_layers(target, 2)
    dcfg = draft_config(CFG, 2)
    rng = np.random.default_rng(5)
    ids = rng.integers(10, VOCAB, size=(1, 8)).astype(np.int32)
    mask = np.ones((1, 8), bool)
    lo, hi = 20, 60
    ref, ref_len = generate(
        target, CFG, jnp.asarray(ids), jnp.asarray(mask), jax.random.PRNGKey(0),
        max_new_tokens=12, cache_len=8 + 12 + 8, eos_ids=(EOS,), pad_id=PAD,
        greedy=True, vocab_slice=(lo, hi), extra_ids=(EOS,),
    )
    got, got_len, _ = _spec(
        target, draft, dcfg, ids, mask, 12, k=3, eos_ids=(EOS,),
        vocab_slice=(lo, hi), extra_ids=(EOS,),
    )
    np.testing.assert_array_equal(np.asarray(ref), got)
    np.testing.assert_array_equal(np.asarray(ref_len), got_len)


def test_sampled_topk1_is_deterministic_and_exact(target):
    """With top_k=1 the sampling chain is argmax — stochastic speculative
    decode must then equal vanilla generate exactly, for any draft."""
    from sparktts_tpu.lm.speculative import speculative_generate

    draft = init_qwen(jax.random.PRNGKey(9), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(6)
    ids = rng.integers(10, VOCAB, size=(2, 8)).astype(np.int32)
    mask = np.ones((2, 8), bool)
    ref, ref_len = generate(
        target, CFG, jnp.asarray(ids), jnp.asarray(mask), jax.random.PRNGKey(0),
        max_new_tokens=12, cache_len=8 + 12 + 8, temperature=1.0, top_k=1,
        top_p=1.0, eos_ids=(EOS,), pad_id=PAD,
    )
    got, got_len, _ = speculative_generate(
        target, draft, CFG, CFG, jnp.asarray(ids), jnp.asarray(mask),
        jax.random.PRNGKey(123), max_new_tokens=12, cache_len=8 + 12 + 8,
        k=4, temperature=1.0, top_k=1, top_p=1.0, eos_ids=(EOS,), pad_id=PAD,
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    np.testing.assert_array_equal(np.asarray(ref_len), np.asarray(got_len))


def test_sampled_distribution_matches_vanilla(target):
    """Distribution equality: over many seeds, the marginal distribution of
    the first sampled token must match vanilla generate's (total-variation
    distance within sampling noise)."""
    from collections import Counter

    from sparktts_tpu.lm.speculative import draft_from_layers, speculative_generate

    draft = draft_from_layers(target, 2)
    dcfg = draft_config(CFG, 2)
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(10, VOCAB, size=(1, 6)).astype(np.int32))
    mask = jnp.ones((1, 6), bool)
    n = 1200
    kw = dict(max_new_tokens=3, cache_len=6 + 3 + 8, temperature=1.0,
              top_k=8, top_p=0.9, eos_ids=(), pad_id=PAD)

    van, spec = Counter(), Counter()
    for s in range(n):
        t, _ = generate(
            target, CFG, ids, mask, jax.random.PRNGKey(s), **kw
        )
        van[int(np.asarray(t)[0, 1])] += 1  # position 1: first SAMPLED token
        t2, _, _ = speculative_generate(
            target, draft, CFG, dcfg, ids, mask, jax.random.PRNGKey(10_000 + s),
            k=3, **kw,
        )
        spec[int(np.asarray(t2)[0, 1])] += 1

    support = set(van) | set(spec)
    tv = 0.5 * sum(abs(van[x] / n - spec[x] / n) for x in support)
    assert tv < 0.1, f"total-variation distance too high: {tv} (van={van}, spec={spec})"


# ---------------------------------------------------------------------------
# Adversarial non-degenerate coverage: random tiny models collapse to a
# constant greedy token (prompt copying), which made the original exactness
# tests vacuous for the rejection path.  A hand-built "cycler" model emits
# token (i + shift) after consuming i — non-constant, fully predictable — and
# a shift-2 draft against a shift-1 target disagrees at EVERY position.
# ---------------------------------------------------------------------------

CYC_H = 32  # hidden == vocab: identity embedding


def _cycler_params(shift: int):
    from sparktts_tpu.lm.distill import make_cycler_teacher

    return make_cycler_teacher(CYC_H, shift=shift)[0]


def _cycler_cfg():
    from sparktts_tpu.lm.distill import make_cycler_teacher

    return make_cycler_teacher(CYC_H)[1]


def test_cycler_vanilla_is_nonconstant_cycle():
    cfg = _cycler_cfg()
    params = _cycler_params(1)
    ids = jnp.asarray([[4, 9, 2]], jnp.int32)
    toks, _ = generate(
        params, cfg, ids, jnp.ones((1, 3), bool), jax.random.PRNGKey(0),
        max_new_tokens=8, cache_len=24, eos_ids=(), pad_id=0, greedy=True,
        cache_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(toks)[0], [3, 4, 5, 6, 7, 8, 9, 10])


def test_rejecting_draft_exactness_nonconstant():
    """Shift-2 draft vs shift-1 target: every proposal is rejected, so every
    round exercises the bonus-token path — output must still be the exact
    target cycle (this catches the rejected-draft-token emission bug)."""
    cfg = _cycler_cfg()
    target = _cycler_params(1)
    for shift, min_acc in ((2, 0), (1, 1)):
        draft = _cycler_params(shift)
        toks, lengths, acc = speculative_generate_greedy(
            target, draft, cfg, cfg,
            jnp.asarray([[4, 9, 2]], jnp.int32), jnp.ones((1, 3), bool),
            max_new_tokens=8, cache_len=24, k=3, eos_ids=(), pad_id=0,
        )
        np.testing.assert_array_equal(
            np.asarray(toks)[0], [3, 4, 5, 6, 7, 8, 9, 10],
            err_msg=f"shift={shift}",
        )
        if shift == 2:
            assert int(acc) == 0  # every draft rejected
        else:
            assert int(acc) >= 4  # perfect draft accepts


def test_rejecting_draft_batched_mixed_acceptance():
    """Rows with different acceptance (perfect draft row vs always-rejected
    row can't be mixed — the draft is shared — so mix prompts with different
    phases) still advance consistently and stay exact."""
    cfg = _cycler_cfg()
    target = _cycler_params(1)
    draft = _cycler_params(2)
    ids = jnp.asarray([[4, 9, 2], [0, 7, 20]], jnp.int32)
    toks, lengths, _ = speculative_generate_greedy(
        target, draft, cfg, cfg, ids, jnp.ones((2, 3), bool),
        max_new_tokens=6, cache_len=24, k=4, eos_ids=(), pad_id=0,
    )
    np.testing.assert_array_equal(np.asarray(toks)[0], [3, 4, 5, 6, 7, 8])
    np.testing.assert_array_equal(np.asarray(toks)[1], [21, 22, 23, 24, 25, 26])


def test_rejecting_draft_sampled_topk1_exact():
    """Stochastic path under top_k=1 with an always-rejecting draft must
    also reproduce the exact cycle (residual sampling collapses to argmax)."""
    from sparktts_tpu.lm.speculative import speculative_generate

    cfg = _cycler_cfg()
    target = _cycler_params(1)
    draft = _cycler_params(2)
    toks, _, _ = speculative_generate(
        target, draft, cfg, cfg,
        jnp.asarray([[4, 9, 2]], jnp.int32), jnp.ones((1, 3), bool),
        jax.random.PRNGKey(7), max_new_tokens=8, cache_len=24, k=3,
        temperature=1.0, top_k=1, top_p=1.0, eos_ids=(), pad_id=0,
    )
    np.testing.assert_array_equal(np.asarray(toks)[0], [3, 4, 5, 6, 7, 8, 9, 10])
