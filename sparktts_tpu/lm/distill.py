"""Draft-model self-distillation for speculative decoding.

PAPERS.md (arxiv 2410.21951, 2410.13839) accelerate AR TTS with a drafter;
this provides the missing piece when no external data exists: distill a small
draft LM on sequences SAMPLED FROM THE TARGET itself, then plug it into
`lm/speculative.py` (whose exactness guarantee means a better draft only
raises the acceptance rate — never changes outputs).

The reference stack has no training or drafting machinery at all (SURVEY.md
§0); this composes the repo's own `lm/train.py` step with `lm/generate.py`.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparktts_tpu.config import QwenConfig
from sparktts_tpu.lm.generate import generate
from sparktts_tpu.lm.qwen import init_qwen
from sparktts_tpu.lm.train import init_train_state, make_optimizer, train_step


def sample_target_corpus(
    target_params,
    cfg: QwenConfig,
    rng: jax.Array,
    n_seqs: int,
    prompt_len: int,
    gen_len: int,
    temperature: float = 1.0,
    top_k: int = 50,
    top_p: float = 1.0,
    greedy: bool = False,
    vocab_slice: Tuple[int, int] | None = None,
    extra_ids: Tuple[int, ...] = (),
) -> np.ndarray:
    """(n_seqs, prompt_len + gen_len) sequences: random prompts continued by
    the target model — the draft's training data."""
    r1, r2 = jax.random.split(rng)
    lo, hi = (0, cfg.vocab_size) if vocab_slice is None else vocab_slice
    prompts = jax.random.randint(r1, (n_seqs, prompt_len), lo, hi, jnp.int32)
    mask = jnp.ones((n_seqs, prompt_len), bool)
    toks, _ = generate(
        target_params, cfg, prompts, mask, r2,
        max_new_tokens=gen_len, cache_len=prompt_len + gen_len,
        temperature=temperature, top_k=top_k, top_p=top_p,
        eos_ids=(), pad_id=0, greedy=greedy,
        vocab_slice=vocab_slice, extra_ids=extra_ids,
    )
    return np.concatenate([np.asarray(prompts), np.asarray(toks)], axis=1)


def distill_draft(
    target_params,
    cfg: QwenConfig,
    draft_cfg: QwenConfig,
    steps: int = 200,
    batch: int = 8,
    prompt_len: int = 4,
    gen_len: int = 28,
    corpus_seqs: int = 256,
    learning_rate: float = 3e-3,
    seed: int = 0,
    greedy_teacher: bool = True,
    vocab_slice: Tuple[int, int] | None = None,
    extra_ids: Tuple[int, ...] = (),
    draft_params: Optional[dict] = None,
    temperature: float = 1.0,
):
    """Train a draft LM to imitate the target on target-generated sequences.
    Returns (draft_params, loss_curve) where loss_curve is the per-step CE
    (next-token, generated region only — the prompt is random noise).  A
    curve, not a scalar: a healthy run DESCENDS; a flat-zero curve means the
    teacher corpus is degenerate (see corpus_stats), which is a property of
    the teacher, not a training failure."""
    rng = jax.random.PRNGKey(seed)
    r_corpus, r_init, r_order = jax.random.split(rng, 3)
    corpus = sample_target_corpus(
        target_params, cfg, r_corpus, corpus_seqs, prompt_len, gen_len,
        greedy=greedy_teacher, temperature=temperature,
        vocab_slice=vocab_slice, extra_ids=extra_ids,
    )
    if draft_params is None:
        draft_params = init_qwen(r_init, draft_cfg, dtype=jnp.float32)

    optimizer = make_optimizer(learning_rate)
    state = init_train_state(draft_params, optimizer)
    step_fn = jax.jit(functools.partial(train_step, cfg=draft_cfg, optimizer=optimizer))

    t = corpus.shape[1]
    loss_mask = np.zeros((batch, t), bool)
    loss_mask[:, prompt_len:] = True  # learn only the target's continuations
    loss_mask = jnp.asarray(loss_mask)

    order = np.asarray(
        jax.random.randint(r_order, (steps, batch), 0, corpus.shape[0], jnp.int32)
    )
    losses = []
    for i in range(steps):
        ids = jnp.asarray(corpus[order[i]])
        state, loss = step_fn(state, input_ids=ids, loss_mask=loss_mask)
        losses.append(float(loss))
    return state.params, losses


def corpus_stats(corpus: np.ndarray, prompt_len: int) -> dict:
    """Degeneracy diagnostics for a teacher corpus: a greedy teacher with
    random weights typically collapses onto one token, which makes the
    distillation task trivially easy (loss -> 0) while proving nothing about
    the draft.  top_token_share near 1.0 means exactly that — and because a
    random teacher often collapses onto a DIFFERENT constant per prompt
    (global token stats then look diverse), constant_seq_share reports the
    fraction of sequences whose generated region is a single repeated token."""
    gen = corpus[:, prompt_len:]
    flat = gen.reshape(-1)
    uniq, counts = np.unique(flat, return_counts=True)
    per_seq_constant = (gen == gen[:, :1]).all(axis=1)
    return {
        "unique_tokens": int(uniq.size),
        "top_token_share": round(float(counts.max()) / flat.size, 4),
        "constant_seq_share": round(float(per_seq_constant.mean()), 4),
        "gen_tokens": int(flat.size),
    }


def make_cycler_teacher(h: int = 32, shift: int = 1):
    """Hand-built deterministic teacher whose greedy map is token i -> i+shift
    (mod h): non-constant, fully predictable, unlearnable by luck.  Hidden ==
    vocab with identity embedding; attention zeroed; the MLP's saturated gate
    adds (e_{i+shift} - e_i)/h to the residual.  The canonical NON-degenerate
    distillation target (random tiny transformers collapse to per-prompt
    constants — see corpus_stats.constant_seq_share); shared by
    tests/test_speculative.py and the bench sanity task."""
    eye = jnp.eye(h, dtype=jnp.float32)
    w_u = jnp.roll(eye, shift, axis=1) - eye  # e_i -> e_{i+shift} - e_i
    layer = {
        "ln1": {"gamma": jnp.ones((h,))},
        "qkv": {"w": jnp.zeros((h, 2 * 4 + 2 * 1 * 4)), "b": jnp.zeros((2 * 4 + 2 * 1 * 4,))},
        "o": {"w": jnp.zeros((2 * 4, h))},
        "ln2": {"gamma": jnp.ones((h,))},
        "gateup": {"w": jnp.concatenate([10.0 * jnp.ones((h, h)), w_u], axis=1)},
        "down": {"w": eye / (10.0 * h)},
    }
    params = {
        "embed": eye,
        "layers": jax.tree.map(lambda x: x[None], layer),
        "final_ln": {"gamma": jnp.ones((h,))},
    }
    cfg = QwenConfig(
        vocab_size=h, hidden_size=h, intermediate_size=h,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
        head_dim=4, eos_token_id=h - 1, pad_token_id=0,
    )
    return params, cfg


def measure_acceptance(
    target_params,
    draft_params,
    cfg: QwenConfig,
    draft_cfg: QwenConfig,
    n_prompts: int = 8,
    prompt_len: int = 4,
    gen_len: int = 32,
    k: int = 4,
    seed: int = 0,
    vocab_slice: Tuple[int, int] | None = None,
    extra_ids: Tuple[int, ...] = (),
) -> float:
    """Greedy speculative acceptance rate: accepted drafts / emitted tokens
    (0 = every proposal rejected; (k-1)/k = perfect draft)."""
    from sparktts_tpu.lm.speculative import speculative_generate_greedy

    rng = jax.random.PRNGKey(seed)
    accepted = emitted = 0
    for i in range(n_prompts):
        rng, r = jax.random.split(rng)
        lo, hi = (0, cfg.vocab_size) if vocab_slice is None else vocab_slice
        ids = jax.random.randint(r, (1, prompt_len), lo, hi, jnp.int32)
        _, lengths, acc = speculative_generate_greedy(
            target_params, draft_params, cfg, draft_cfg,
            ids, jnp.ones((1, prompt_len), bool),
            max_new_tokens=gen_len, cache_len=prompt_len + gen_len + k, k=k,
            eos_ids=(), pad_id=0, vocab_slice=vocab_slice, extra_ids=extra_ids,
        )
        accepted += int(acc)
        emitted += int(np.asarray(lengths).sum())
    return accepted / max(emitted, 1)
