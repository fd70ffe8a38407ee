"""Autoregressive generation: jitted prefill + while-loop decode.

The whole generate pass — prefill, every decode step, sampling, EOS tracking —
is ONE jitted XLA program per (batch, T_pad, max_new_tokens) bucket.  This
replaces the reference's per-token Python round-trip through HF `generate`
(reference `cli/SparkTTS.py:197-204`) and the TRT-LLM engine on the serving
side.  The loop exits early once every sequence hits EOS (`lax.while_loop`),
so short utterances don't pay for the 3000-token budget.

Separate `prefill`/`decode_step` entry points are exposed for the streaming
server, which interleaves decode with vocoder calls (SURVEY.md §3.5).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from sparktts_tpu.config import QwenConfig
from sparktts_tpu.lm.qwen import (
    KVCache,
    aligned_cache_len,
    init_kv_cache,
    prefill_inputs,
    qwen_forward,
)
from sparktts_tpu.lm.sample import greedy_token, sample_token


class GenState(NamedTuple):
    """Carry for the decode loop / streaming server."""

    cache: KVCache
    cur_token: jax.Array   # (B,) last sampled token
    step: jax.Array        # scalar int32, tokens generated so far
    done: jax.Array        # (B,) bool
    rng: jax.Array
    start: jax.Array       # (B,) first valid cache slot (left-pad offset)
    prompt_len: jax.Array  # (B,) true prompt lengths


def _split_rng(rng: jax.Array):
    """`jax.random.split` for either a single raw key (2,) or a per-row raw
    key batch (B, 2).  Per-row keys give every batch row an independent
    sample stream keyed only by its own seed, so requests with distinct
    seeds can ride one compiled program (and a row's output is invariant to
    the rest of the batch)."""
    if rng.ndim == 2:
        ks = jax.vmap(lambda k: jax.random.split(k, 2))(rng)  # (B, 2, 2)
        return ks[:, 0], ks[:, 1]
    rng, sub = jax.random.split(rng)
    return rng, sub


def packed_allowed_mask(vocab_slice, extra_ids, allow_slice, allow_extras):
    """(W,) bool over the PACKED guided-decoding logit axis (slice rows then
    extras): True where the packed row's full-vocab id lies in
    [allow_slice[0], allow_slice[1]) or in allow_extras.

    Used to narrow a superset constraint per sequence: the continuous engines
    compile ONE program with the control-mode superset slice, and clone-mode
    slots mask it down to semantic+EOS so their sampling distribution matches
    the offline clone path (reference `cli/SparkTTS.py:213-220` output
    grammar).  All arguments are static — the mask is a compile-time
    constant."""
    import numpy as np  # trace-time only

    lo, hi = vocab_slice
    ids = np.arange(lo, hi, dtype=np.int64)
    if extra_ids:
        ids = np.concatenate([ids, np.asarray(extra_ids, np.int64)])
    a_lo, a_hi = allow_slice
    allowed = (ids >= a_lo) & (ids < a_hi)
    if allow_extras:
        allowed |= np.isin(ids, np.asarray(allow_extras, np.int64))
    return jnp.asarray(allowed)


def _expand_constrained(idx: jax.Array, vocab_slice, extra_ids) -> jax.Array:
    """Map a packed constrained-logits index (slice rows then extras) back to
    a full-vocab token id."""
    if vocab_slice is None:
        return idx
    lo, hi = vocab_slice
    width = hi - lo
    if not extra_ids:
        return idx + lo
    lut = jnp.asarray(extra_ids, jnp.int32)
    ex = lut[jnp.clip(idx - width, 0, len(extra_ids) - 1)]
    return jnp.where(idx < width, idx + lo, ex)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "top_k", "greedy", "use_flash", "vocab_slice", "extra_ids"),
    donate_argnums=(4,),  # the cache is consumed — alias it into the output
)
def prefill(
    params,
    cfg: QwenConfig,
    input_ids: jax.Array,    # (B, T_pad) left-padded
    prompt_mask: jax.Array,  # (B, T_pad) bool
    cache: KVCache,
    rng: jax.Array,
    temperature: float,
    top_k: int,
    top_p: float,
    greedy: bool = False,
    use_flash: bool = False,
    vocab_slice: Tuple[int, int] | None = None,
    extra_ids: Tuple[int, ...] = (),
) -> GenState:
    """Run the prompt through the model, sample the first new token.

    vocab_slice/extra_ids constrain sampling to embedding rows [lo, hi) plus
    the listed ids (guided decoding — see qwen_forward)."""
    t_pad = input_ids.shape[1]
    positions, bias = prefill_inputs(prompt_mask, cache.max_len)
    flash_start = None
    if use_flash:
        flash_start = t_pad - jnp.sum(prompt_mask.astype(jnp.int32), axis=1)
    logits, cache = qwen_forward(
        params, cfg, input_ids, positions, cache, 0, bias, flash_start=flash_start,
        vocab_slice=vocab_slice, extra_ids=extra_ids, logits_last_only=True,
    )
    last_logits = logits[:, -1]

    rng, sub = _split_rng(rng)
    if greedy:
        tok = greedy_token(last_logits)
    else:
        tok = sample_token(sub, last_logits, temperature, top_k, top_p)
    tok = _expand_constrained(tok, vocab_slice, extra_ids)

    prompt_len = jnp.sum(prompt_mask.astype(jnp.int32), axis=1)
    start = t_pad - prompt_len
    return GenState(
        cache=cache,
        cur_token=tok,
        step=jnp.zeros((), jnp.int32),
        done=jnp.zeros((input_ids.shape[0],), bool),
        rng=rng,
        start=start,
        prompt_len=prompt_len,
    )


def decode_step(
    params,
    cfg: QwenConfig,
    state: GenState,
    t_pad: int,
    temperature: float,
    top_k: int,
    top_p: float,
    eos_ids: Sequence[int],
    pad_id: int,
    greedy: bool = False,
    vocab_slice: Tuple[int, int] | None = None,
    extra_ids: Tuple[int, ...] = (),
    scan_unroll: int = 1,
) -> GenState:
    """Feed the last sampled token (state.cur_token), sample the next.

    The key-validity mask is an index compare fused into the attention
    (decode_window) — no per-step (B, 1, S) fp32 bias materialized."""
    cache_pos = t_pad + state.step
    positions = (state.prompt_len + state.step)[:, None]

    logits, cache = qwen_forward(
        params, cfg, state.cur_token[:, None], positions, state.cache, cache_pos,
        None, decode_window=(state.start, cache_pos),
        vocab_slice=vocab_slice, extra_ids=extra_ids, scan_unroll=scan_unroll,
    )
    rng, sub = _split_rng(state.rng)
    if greedy:
        nxt = greedy_token(logits[:, -1])
    else:
        nxt = sample_token(sub, logits[:, -1], temperature, top_k, top_p)
    nxt = _expand_constrained(nxt, vocab_slice, extra_ids)

    # `done` flips once the token just consumed/emitted was EOS — the EOS
    # itself is still part of the output (HF generate semantics).
    is_eos = jnp.zeros_like(state.done)
    for e in eos_ids:
        is_eos = is_eos | (state.cur_token == e)
    done = state.done | is_eos
    nxt = jnp.where(done, pad_id, nxt)

    new_state = GenState(
        cache=cache,
        cur_token=nxt,
        step=state.step + 1,
        done=done,
        rng=rng,
        start=state.start,
        prompt_len=state.prompt_len,
    )
    return new_state


def _decode_scan(params, cfg, state, t_pad, n_steps, temperature, top_k, top_p,
                 eos_ids, pad_id, greedy, vocab_slice=None, extra_ids=(),
                 scan_unroll=1):
    """Returns (state, tokens (B, n), valid (B, n) bool).

    `valid` is the explicit emission mask — callers must NOT infer liveness
    from token values: pad_id can be a legitimately sampled id (it defaults to
    eos when the checkpoint tokenizer has no pad token), so in-band filtering
    silently eats real emissions."""

    def body(state, _):
        emitted = state.cur_token
        valid = ~state.done
        new_state = decode_step(
            params, cfg, state, t_pad, temperature, top_k, top_p, eos_ids, pad_id,
            greedy, vocab_slice, extra_ids, scan_unroll,
        )
        return new_state, (emitted, valid)

    state, (tokens, valid) = jax.lax.scan(body, state, None, length=n_steps)
    return state, tokens.T, valid.T  # (n, B) → (B, n)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "t_pad", "n_steps", "top_k", "eos_ids", "pad_id", "greedy",
        "vocab_slice", "extra_ids", "scan_unroll",
    ),
    donate_argnums=(2,),  # GenState (with the KV cache) is consumed per call
)
def decode_chunk(
    params,
    cfg: QwenConfig,
    state: GenState,
    t_pad: int,
    n_steps: int,
    temperature: float = 0.8,
    top_k: int = 50,
    top_p: float = 0.95,
    eos_ids: Tuple[int, ...] = (),
    pad_id: int = 0,
    greedy: bool = False,
    vocab_slice: Tuple[int, int] | None = None,
    extra_ids: Tuple[int, ...] = (),
    scan_unroll: int = 1,
) -> Tuple[GenState, jax.Array, jax.Array]:
    """Run `n_steps` decode steps as one XLA program (lax.scan) and return
    (state, tokens (B, n_steps), valid (B, n_steps) bool).  The streaming
    server uses this to amortize dispatch overhead while keeping chunk-level
    control in Python (reference's streaming loop granularity,
    `spark_tts/1/model.py:347-385`)."""
    return _decode_scan(
        params, cfg, state, t_pad, n_steps, temperature, top_k, top_p, eos_ids, pad_id,
        greedy, vocab_slice, extra_ids, scan_unroll,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "t_pad", "top_k", "eos_ids", "pad_id",
        "greedy", "vocab_slice", "extra_ids", "scan_unroll",
    ),
    donate_argnums=(2,),  # GenState (with the KV cache) is consumed
)
def _decode_all(
    params,
    cfg: QwenConfig,
    state: GenState,
    t_pad: int,
    max_new_tokens: int,
    temperature: float,
    top_k: int,
    top_p: float,
    eos_ids: Tuple[int, ...],
    pad_id: int,
    greedy: bool,
    vocab_slice: Tuple[int, int] | None,
    extra_ids: Tuple[int, ...],
    scan_unroll: int,
) -> Tuple[jax.Array, jax.Array]:
    """The full decode loop (early EOS exit) as ONE XLA program.

    Kept as a separate top-level program from `prefill` ON PURPOSE: with the
    fused Pallas decode-attention kernel, a module that contains both the
    prefill attention and the kernel miscompiles on v5e (wrong logits from
    the first step; reproduced and bisected 2026-08-17 — prefill-free
    modules and kernel-free modules are both correct, the combination is
    not).  Two programs also let decode program caching span prompt buckets
    and cost only one extra async dispatch per generation, which the
    kernel's ~0.12 ms/token win repays several times over at typical
    utterance lengths."""
    b = state.cur_token.shape[0]
    tokens0 = jnp.full((b, max_new_tokens), pad_id, jnp.int32)
    valid0 = jnp.zeros((b, max_new_tokens), bool)

    def cond(carry):
        state, _, _ = carry
        return (state.step < max_new_tokens) & ~jnp.all(state.done)

    def body(carry):
        state, tokens, valid = carry
        # the token produced for position `step` is state.cur_token, masked if
        # its sequence finished on a previous step
        emitted = jnp.where(state.done, pad_id, state.cur_token)
        tokens = jax.lax.dynamic_update_slice(tokens, emitted[:, None], (0, state.step))
        # explicit emission-validity mask: lengths must not be inferred from
        # token values (pad_id may be a legal sampled id)
        valid = jax.lax.dynamic_update_slice(valid, (~state.done)[:, None], (0, state.step))
        new_state = decode_step(
            params, cfg, state, t_pad, temperature, top_k, top_p, eos_ids, pad_id,
            greedy, vocab_slice, extra_ids, scan_unroll,
        )
        return (new_state, tokens, valid)

    state, tokens, valid = jax.lax.while_loop(cond, body, (state, tokens0, valid0))

    lengths = jnp.sum(valid, axis=1).astype(jnp.int32)
    return tokens, lengths


def generate(
    params,
    cfg: QwenConfig,
    input_ids: jax.Array,    # (B, T_pad) int32, left-padded
    prompt_mask: jax.Array,  # (B, T_pad) bool
    rng: jax.Array,
    max_new_tokens: int,
    cache_len: int,
    temperature: float = 0.8,
    top_k: int = 50,
    top_p: float = 0.95,
    eos_ids: Tuple[int, ...] = (),
    pad_id: int = 0,
    greedy: bool = False,
    cache_dtype=jnp.bfloat16,
    use_flash: bool = False,
    vocab_slice: Tuple[int, int] | None = None,
    extra_ids: Tuple[int, ...] = (),
    scan_unroll: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Full generation.  Returns (tokens (B, max_new_tokens) int32 padded with
    pad_id after EOS, lengths (B,) including the EOS token).

    vocab_slice/extra_ids: optional guided-decoding constraint — sampling is
    restricted to embedding rows [lo, hi) plus extra_ids (returned ids are in
    the FULL vocab space).  For TTS this is the semantic/global token range
    plus EOS, which also guarantees the output is parseable.

    Runs as TWO chained top-level XLA programs — jitted `prefill`, then the
    jitted `_decode_all` loop — with no host sync between them (async
    dispatch chains device-side).  See `_decode_all` for why they must not
    share a module."""
    b, t_pad = input_ids.shape
    assert cache_len >= t_pad + max_new_tokens, "cache too small"
    # extra aligned slots sit outside every valid window — free capacity
    cache_len = aligned_cache_len(cache_len)

    cache = init_kv_cache(cfg, b, cache_len, cache_dtype)
    state = prefill(
        params, cfg, input_ids, prompt_mask, cache, rng, temperature, top_k, top_p, greedy,
        use_flash=use_flash, vocab_slice=vocab_slice, extra_ids=extra_ids,
    )
    return _decode_all(
        params, cfg, state, t_pad, max_new_tokens, temperature, top_k, top_p,
        tuple(eos_ids), pad_id, greedy, vocab_slice, tuple(extra_ids), scan_unroll,
    )
