"""Parity of the fused Pallas dense-decode attention kernel vs the XLA
einsum path it replaces (interpret mode on CPU; same kernel runs compiled
on TPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sparktts_tpu.kernels.decode_attention import dense_decode_attention  # noqa: E402


def _xla_reference(q, ck, cv, start, pos, sm_scale):
    """The production XLA decode branch (lm/qwen.py _attention_block)."""
    b, hq, d = q.shape
    hkv = ck.shape[2]
    group = hq // hkv
    qg = q.reshape(b, 1, hkv, group, d)
    scores = jnp.einsum(
        "btkgh,bskh->bkgts", qg, ck, preferred_element_type=jnp.float32
    ) * sm_scale
    k_idx = jnp.arange(ck.shape[1])
    valid = (k_idx[None, :] >= start[:, None]) & (k_idx[None, :] <= pos[:, None])
    scores = jnp.where(valid[:, None, None, None, :], scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1).astype(cv.dtype)
    out = jnp.einsum("bkgts,bskh->btkgh", probs, cv)
    return out.reshape(b, hq, d)


@pytest.mark.parametrize(
    "b,s_len,block_s,starts,poss",
    [
        (1, 256, 64, [0], [0]),            # single valid key
        (1, 256, 64, [3], [200]),          # window straddling blocks
        (2, 512, 128, [0, 37], [511, 64]), # full window + short window
        (3, 128, 128, [5, 0, 90], [100, 127, 90]),  # single-block grid
    ],
)
def test_kernel_matches_xla_path(b, s_len, block_s, starts, poss):
    hq, hkv, d, n_layers = 14, 2, 64, 3
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, d), jnp.float32)
    cache_k = jax.random.normal(kk, (n_layers, b, s_len, hkv, d), jnp.float32)
    cache_v = jax.random.normal(kv, (n_layers, b, s_len, hkv, d), jnp.float32)
    start = jnp.asarray(starts, jnp.int32)
    pos = jnp.asarray(poss, jnp.int32)
    sm_scale = d ** -0.5

    for layer in (0, n_layers - 1):
        got = dense_decode_attention(
            q, cache_k, cache_v, layer, start, pos,
            sm_scale=sm_scale, block_s=block_s, interpret=True,
        )
        want = _xla_reference(
            q, cache_k[layer], cache_v[layer], start, pos, sm_scale
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )


def test_kernel_bf16_cache():
    """Production dtype: bf16 cache + bf16 q, fp32 accumulation inside."""
    b, s_len, hq, hkv, d = 2, 256, 14, 2, 64
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, d), jnp.float32).astype(jnp.bfloat16)
    ck = jax.random.normal(kk, (1, b, s_len, hkv, d), jnp.float32).astype(jnp.bfloat16)
    cv = jax.random.normal(kv, (1, b, s_len, hkv, d), jnp.float32).astype(jnp.bfloat16)
    start = jnp.asarray([0, 10], jnp.int32)
    pos = jnp.asarray([100, 255], jnp.int32)
    got = dense_decode_attention(
        q, ck, cv, 0, start, pos, sm_scale=d**-0.5, block_s=64, interpret=True
    )
    want = _xla_reference(
        q.astype(jnp.float32), ck[0].astype(jnp.float32), cv[0].astype(jnp.float32),
        start, pos, d**-0.5,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_generate_with_kernel_matches_xla(monkeypatch):
    """End-to-end: greedy generate with SPARKTTS_DECODE_KERNEL=1 (interpret
    on CPU) emits the same tokens as the XLA decode path."""
    from sparktts_tpu.config import tiny_test_config
    from sparktts_tpu.lm.generate import generate
    from sparktts_tpu.lm.qwen import init_qwen

    cfg = tiny_test_config().llm
    params = init_qwen(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(5, cfg.vocab_size - 6, size=(2, 16)),
        jnp.int32,
    )
    mask = jnp.ones((2, 16), bool)
    kwargs = dict(
        max_new_tokens=8, cache_len=64, eos_ids=(), pad_id=1, greedy=True,
        cache_dtype=jnp.float32,
    )

    monkeypatch.delenv("SPARKTTS_DECODE_KERNEL", raising=False)
    ref, _ = generate(params, cfg, ids, mask, jax.random.PRNGKey(1), **kwargs)

    monkeypatch.setenv("SPARKTTS_DECODE_KERNEL", "1")
    # the mode is read at trace time — drop the cached program so the
    # second call re-traces under the new env
    jax.clear_caches()
    got, _ = generate(params, cfg, ids, mask, jax.random.PRNGKey(1), **kwargs)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
