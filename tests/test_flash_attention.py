"""Flash attention kernel parity vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparktts_tpu.kernels.flash_attention import (
    flash_attention_prefill,
    reference_attention,
)


@pytest.mark.parametrize(
    "b,hq,hkv,t,d,block",
    [
        (1, 4, 2, 128, 64, 128),
        (2, 4, 2, 256, 64, 128),
        (1, 2, 2, 128, 32, 64),   # MHA case, smaller blocks
        (2, 8, 2, 128, 64, 64),   # GQA group 4
    ],
)
def test_flash_matches_reference(b, hq, hkv, t, d, block):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, t, d), jnp.float32)
    k = jax.random.normal(kk, (b, hkv, t, d), jnp.float32)
    v = jax.random.normal(kv, (b, hkv, t, d), jnp.float32)
    start = jnp.asarray(np.random.default_rng(0).integers(0, t // 2, size=(b,)), jnp.int32)

    scale = d**-0.5
    out = flash_attention_prefill(
        q, k, v, start, sm_scale=scale, block_q=block, block_k=block, interpret=True
    )
    ref = reference_attention(q, k, v, start, sm_scale=scale)
    # compare only non-pad query rows (row >= start[b]); pad rows are junk in
    # both implementations and never read downstream
    valid = (np.arange(t)[None, :] >= np.asarray(start)[:, None])  # (b, t)
    mask = np.broadcast_to(valid[:, None, :, None], out.shape)
    np.testing.assert_allclose(
        np.asarray(out)[mask], np.asarray(ref)[mask], rtol=2e-3, atol=2e-3
    )


def test_flash_fully_masked_rows_are_finite():
    """Rows before `start` (left-pad queries) see no valid keys below the
    diagonal only when start > row; ensure output stays finite."""
    b, hq, hkv, t, d = 1, 2, 2, 128, 64
    q = jnp.ones((b, hq, t, d))
    k = jnp.ones((b, hkv, t, d))
    v = jnp.ones((b, hkv, t, d))
    start = jnp.asarray([64], jnp.int32)  # first 64 queries have zero valid keys
    out = flash_attention_prefill(q, k, v, start, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


def test_flash_falls_back_on_odd_prompt_bucket():
    """A t_pad no Pallas tile divides (e.g. 100) must fall back to the dense
    attention path instead of crashing the kernel's divisibility assert —
    prompt_bucket is a public pipeline arg, so any value must work."""
    from sparktts_tpu.config import QwenConfig
    from sparktts_tpu.lm.generate import generate
    from sparktts_tpu.lm.qwen import init_qwen

    cfg = QwenConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, eos_token_id=0, pad_token_id=1,
    )
    params = init_qwen(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    t = 100  # not a multiple of 8 — no flash tile fits
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(5, 120, size=(1, t)), jnp.int32)
    mask = jnp.ones((1, t), bool)
    kwargs = dict(max_new_tokens=4, cache_len=t + 4, eos_ids=(), pad_id=1,
                  greedy=True, cache_dtype=jnp.float32)
    toks_flash, _ = generate(params, cfg, ids, mask, jax.random.PRNGKey(1),
                             use_flash=True, **kwargs)
    toks_ref, _ = generate(params, cfg, ids, mask, jax.random.PRNGKey(1), **kwargs)
    np.testing.assert_array_equal(np.asarray(toks_flash), np.asarray(toks_ref))
