"""LM training step (fine-tuning the speech-token LLM).

The reference ships no training code (SURVEY.md §0), but a production TTS
stack needs to fine-tune the token LM on new speakers/domains; this provides
the standard next-token cross-entropy step as a pjit-able pure function with
the same TP/DP shardings as inference (`parallel/shardings.py`).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from sparktts_tpu.config import QwenConfig
from sparktts_tpu.lm.qwen import init_kv_cache, prefill_inputs, qwen_forward


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def make_optimizer(learning_rate: float = 1e-4, weight_decay: float = 0.01) -> optax.GradientTransformation:
    return optax.adamw(learning_rate, weight_decay=weight_decay)


def init_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params), step=jnp.zeros((), jnp.int32))


def lm_loss(params, cfg: QwenConfig, input_ids: jax.Array, loss_mask: jax.Array) -> jax.Array:
    """Next-token cross entropy.  input_ids (B, T); loss_mask (B, T) True on
    positions whose *prediction* counts (speech-token region)."""
    b, t = input_ids.shape
    cache = init_kv_cache(cfg, b, t, jnp.float32)
    mask = jnp.ones((b, t), bool)
    positions, bias = prefill_inputs(mask, t)
    logits, _ = qwen_forward(params, cfg, input_ids, positions, cache, 0, bias)
    logits = logits[:, :-1]
    targets = input_ids[:, 1:]
    m = loss_mask[:, 1:].astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def train_step(
    state: TrainState,
    cfg: QwenConfig,
    optimizer: optax.GradientTransformation,
    input_ids: jax.Array,
    loss_mask: jax.Array,
) -> Tuple[TrainState, jax.Array]:
    """One SGD step.  Pure; jit/pjit with params sharded per
    `qwen_param_specs` and batch per `batch_spec` — gradients follow the
    param shardings, XLA inserts the dp psum / tp collectives."""
    loss, grads = jax.value_and_grad(lm_loss)(state.params, cfg, input_ids, loss_mask)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params=params, opt_state=opt_state, step=state.step + 1), loss


def save_train_state(ckpt_dir, state: TrainState) -> None:
    """Persist the full training state (params + optimizer moments + step)
    for resumable fine-tuning — the checkpoint/resume capability the
    inference-only reference lacks (SURVEY.md §5.4)."""
    from sparktts_tpu.checkpoint import save_param_cache

    save_param_cache(ckpt_dir, {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    })


def load_train_state(ckpt_dir, optimizer: optax.GradientTransformation):
    """Restore a saved training state; None if absent.  The optimizer is
    only used to rebuild the opt_state pytree structure (orbax restores raw
    arrays)."""
    from sparktts_tpu.checkpoint import load_param_cache

    raw = load_param_cache(ckpt_dir)
    if raw is None:
        return None
    # orbax restores namedtuples as dicts with SORTED keys; pairing sorted
    # leaves with the optax namedtuple structure is only safe when field
    # names happen to be alphabetical.  Re-sort the reference structure's
    # leaf order the same way orbax serialized them: flatten the restored
    # dict-tree and the reference tree both as path-sorted leaves.
    ref = optimizer.init(raw["params"])
    ref_paths = jax.tree_util.tree_flatten_with_path(ref)[0]
    raw_paths = dict(
        (tuple(str(k) for k in path), leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(raw["opt_state"])[0]
    )

    def norm(path):
        out = []
        for k in path:
            s_ = str(k)
            # namedtuple attr '.mu' vs restored dict key "['mu']"
            out.append(s_.strip(".[]'\""))
        return tuple(out)

    raw_by_norm = {norm(p_): v for p_, v in raw_paths.items()}
    leaves = [raw_by_norm[norm(p_)] for p_, _ in ref_paths]
    opt_state = jax.tree.unflatten(jax.tree.structure(ref), leaves)
    return TrainState(
        params=raw["params"],
        opt_state=opt_state,
        step=jnp.asarray(raw["step"], jnp.int32),
    )
