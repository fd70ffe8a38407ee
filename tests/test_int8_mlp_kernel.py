"""Fused int8 MLP matvec kernel (kernels/int8_mlp.py) vs the unfused XLA
int8 path it replaces (`linear_apply` + `mlp_block`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sparktts_tpu.kernels.int8_mlp import int8_mlp_matvec, mlp_block_size
from sparktts_tpu.lm.quant import quantize_linear_int8
from sparktts_tpu.nn.layers import init_linear, linear_apply


def _mlp_params(key, k, i):
    kg, kd = jax.random.split(key)
    gu = quantize_linear_int8(
        jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), init_linear(kg, k, 2 * i, bias=False)
        )
    )
    down = quantize_linear_int8(
        jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), init_linear(kd, i, k, bias=False)
        )
    )
    return gu, down


def _xla_mlp(gu, down, x):
    g_u = linear_apply(gu, x)
    gate, up = jnp.split(g_u, 2, axis=-1)
    return linear_apply(down, jax.nn.silu(gate) * up)


@pytest.mark.parametrize("r,k,i,block", [(1, 128, 512, 256), (4, 64, 256, 128)])
def test_kernel_matches_xla_path(r, k, i, block):
    key = jax.random.PRNGKey(0)
    gu, down = _mlp_params(key, k, i)
    x = jax.random.normal(jax.random.PRNGKey(1), (r, k), jnp.bfloat16)
    ref = np.asarray(_xla_mlp(gu, down, x), np.float32)
    out = np.asarray(
        int8_mlp_matvec(
            x, gu["w_q"], gu["scale"], down["w_q"], down["scale"],
            block_i=block, interpret=True,
        ),
        np.float32,
    )
    assert out.shape == ref.shape
    # same math up to fp32-accumulation order across intermediate blocks
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)


def test_block_size_menu():
    assert mlp_block_size(4864) == 256   # Qwen2.5-0.5B intermediate dim
    assert mlp_block_size(512) == 512
    assert mlp_block_size(100) is None   # unalignable → XLA fallback


def test_decode_forward_with_kernel_matches_xla(monkeypatch):
    """qwen_forward decode step with SPARKTTS_MLP_KERNEL=1 stays close to
    the XLA path (interpret-mode Pallas on CPU)."""
    from sparktts_tpu.config import QwenConfig
    from sparktts_tpu.lm.quant import quantize_qwen_int8
    from sparktts_tpu.lm.qwen import init_kv_cache, init_qwen, qwen_forward

    cfg = QwenConfig(
        hidden_size=64, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=512, tie_word_embeddings=True,
    )
    params = quantize_qwen_int8(
        init_qwen(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16),
        quantize_embed=False,
    )
    ids = jnp.array([[7]], jnp.int32)
    pos = jnp.array([[3]], jnp.int32)
    start = jnp.zeros((1,), jnp.int32)

    def run():
        cache = init_kv_cache(cfg, 1, 64)
        logits, _ = qwen_forward(
            params, cfg, ids, pos, cache, 3, None,
            decode_window=(start, jnp.asarray(3)),
        )
        return np.asarray(logits, np.float32)

    monkeypatch.setenv("SPARKTTS_MLP_KERNEL", "0")
    ref = run()
    monkeypatch.setenv("SPARKTTS_MLP_KERNEL", "1")
    out = run()
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.1)
