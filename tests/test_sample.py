"""Sampling tests: two-stage top-k exactness, nucleus semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from sparktts_tpu.lm.sample import sample_token, topk_two_stage


def test_two_stage_topk_exact():
    rng = np.random.default_rng(0)
    for v in (166000, 20000, 4096):
        x = jnp.asarray(rng.standard_normal((3, v)), jnp.float32)
        v2, i2 = topk_two_stage(x, 50)
        v1, i1 = jax.lax.top_k(x, 50)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=0, atol=0)
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))


def test_sample_token_respects_top_k_support():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((4, 20000)), jnp.float32)
    # sampled ids must be inside the exact top-50 of each row
    top50 = np.asarray(jax.lax.top_k(logits, 50)[1])
    for seed in range(5):
        toks = np.asarray(sample_token(jax.random.PRNGKey(seed), logits, 0.8, 50, 0.95))
        for b in range(4):
            assert toks[b] in top50[b]


def test_sample_token_top_p_collapses_to_argmax():
    # one dominant logit + tiny top_p → always pick the argmax
    logits = jnp.zeros((2, 20000)).at[:, 123].set(50.0)
    for seed in range(3):
        toks = np.asarray(sample_token(jax.random.PRNGKey(seed), logits, 1.0, 50, 0.1))
        assert (toks == 123).all()
