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


def test_train_state_save_restore_resumes(tmp_path):
    """Checkpoint/resume: save mid-training, restore, continue — the resumed
    run must match an uninterrupted run step-for-step (same data order)."""
    from sparktts_tpu.lm.qwen import init_qwen
    from sparktts_tpu.lm.train import (
        init_train_state,
        load_train_state,
        make_optimizer,
        save_train_state,
        train_step,
    )

    params = init_qwen(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    optimizer = make_optimizer(1e-3)
    rng = np.random.default_rng(0)
    batches = [
        jnp.asarray(rng.integers(1, CFG.vocab_size, size=(2, 12)), jnp.int32)
        for _ in range(6)
    ]
    mask = jnp.ones((2, 12), bool)
    step = jax.jit(functools.partial(train_step, cfg=CFG, optimizer=optimizer))

    # uninterrupted run
    ref = init_train_state(params, optimizer)
    for b in batches:
        ref, ref_loss = step(ref, input_ids=b, loss_mask=mask)

    # interrupted at step 3, saved, restored, resumed
    st = init_train_state(params, optimizer)
    for b in batches[:3]:
        st, _ = step(st, input_ids=b, loss_mask=mask)
    save_train_state(tmp_path / "ckpt", st)
    restored = load_train_state(tmp_path / "ckpt", optimizer)
    assert restored is not None and int(restored.step) == 3
    for b in batches[3:]:
        restored, res_loss = step(restored, input_ids=b, loss_mask=mask)

    assert int(restored.step) == int(ref.step) == 6
    np.testing.assert_allclose(float(res_loss), float(ref_loss), rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(ref.params), jax.tree.leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-6)
    assert load_train_state(tmp_path / "missing", optimizer) is None


def test_train_state_restore_nonalphabetical_opt_state(tmp_path):
    """Orbax restores namedtuples as SORTED-key dicts; the loader must match
    leaves by field NAME, not flatten order (a state whose fields aren't
    alphabetical breaks naive zip-unflatten)."""
    from typing import NamedTuple

    import optax

    from sparktts_tpu.lm.qwen import init_qwen
    from sparktts_tpu.lm.train import (
        init_train_state,
        load_train_state,
        save_train_state,
    )

    class Weird(NamedTuple):  # deliberately non-alphabetical field order
        zeta: object
        alpha: object

    def weird_transform():
        def init_fn(params):
            return Weird(
                zeta=jax.tree.map(lambda p: jnp.full_like(p, 7.0), params),
                alpha=jax.tree.map(jnp.zeros_like, params),
            )

        def update_fn(updates, state, params=None):
            return updates, state

        return optax.GradientTransformation(init_fn, update_fn)

    params = init_qwen(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    optimizer = weird_transform()
    st = init_train_state(params, optimizer)
    save_train_state(tmp_path / "w", st)
    restored = load_train_state(tmp_path / "w", optimizer)
    # zeta must come back as the 7s, alpha as the zeros — name-matched
    z = jax.tree.leaves(restored.opt_state.zeta)[0]
    a = jax.tree.leaves(restored.opt_state.alpha)[0]
    assert float(np.asarray(z).reshape(-1)[0]) == 7.0
    assert float(np.asarray(a).reshape(-1)[0]) == 0.0
