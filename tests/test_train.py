"""LM training-step tests: loss decreases on a fixed batch (overfit sanity)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sparktts_tpu.config import QwenConfig
from sparktts_tpu.lm.train import init_train_state, lm_loss, make_optimizer, train_step

CFG = QwenConfig(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_key_value_heads=2,
    head_dim=16,
)


def test_loss_decreases_when_overfitting():
    from sparktts_tpu.lm.qwen import init_qwen

    params = init_qwen(jax.random.PRNGKey(0), CFG)
    optimizer = make_optimizer(learning_rate=1e-2)
    state = init_train_state(params, optimizer)

    ids = jnp.asarray(np.random.default_rng(0).integers(2, 120, size=(2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), bool)
    step = jax.jit(functools.partial(train_step, cfg=CFG, optimizer=optimizer))

    first_loss = float(lm_loss(params, CFG, ids, mask))
    for _ in range(20):
        state, loss = step(state, input_ids=ids, loss_mask=mask)
    final_loss = float(loss)
    assert final_loss < first_loss * 0.7, (first_loss, final_loss)
    assert np.isfinite(final_loss)


def test_loss_mask_excludes_positions():
    from sparktts_tpu.lm.qwen import init_qwen

    params = init_qwen(jax.random.PRNGKey(1), CFG)
    ids = jnp.asarray(np.random.default_rng(1).integers(2, 120, size=(1, 12)), jnp.int32)
    full = float(lm_loss(params, CFG, ids, jnp.ones((1, 12), bool)))
    # masking everything but two positions changes the loss
    part_mask = jnp.zeros((1, 12), bool).at[0, 5:7].set(True)
    part = float(lm_loss(params, CFG, ids, part_mask))
    assert np.isfinite(full) and np.isfinite(part)
    assert abs(full - part) > 1e-6
