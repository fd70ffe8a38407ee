"""Speculative decoding: draft-k-then-verify-once.

TPU-native implementation of speculative decoding for the speech LM
(PAPERS.md: "Fast and High-Quality Auto-Regressive Speech Synthesis via
Speculative Decoding", arxiv 2410.21951; reference has no equivalent — its
serving stack decodes strictly one token per engine step).  A cheap draft
model proposes `k` tokens autoregressively; the target model scores all k+1
positions in ONE forward pass (a k-token prefill — large matmuls the MXU
likes, amortizing the per-step weight streaming that dominates decode);
matching prefixes are accepted, and the target's own prediction at the first
mismatch is taken as a bonus token.  Greedy invariant: output is bit-identical
to vanilla greedy decode of the target, whatever the draft proposes.

The draft can be ANY Qwen-shaped param tree.  Because layer params are
stacked (L, ...) arrays (lm/qwen.py scan-over-layers), an early-exit
self-speculative draft is a zero-copy slice of the target:
`draft_from_layers(params, n)` → first n layers + the shared embed/norm/head.

KV-cache staleness on rejection needs no rollback: every cache slot is
written at exactly one sequence position, attention masks exclude slots
beyond the current position, and rejected slots are overwritten when those
positions are generated for real.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sparktts_tpu.config import QwenConfig
from sparktts_tpu.lm.generate import GenState, _expand_constrained, prefill
from sparktts_tpu.lm.qwen import KVCache, init_kv_cache, qwen_forward
from sparktts_tpu.lm.sample import greedy_token


def draft_from_layers(params, n_layers: int):
    """Early-exit self-speculative draft: first n layers of the target with
    the shared embedding / final norm / head.  Zero-copy views thanks to the
    stacked (L, ...) layer layout."""
    draft = dict(params)
    draft["layers"] = jax.tree.map(lambda x: x[:n_layers], params["layers"])
    return draft


def draft_config(cfg: QwenConfig, n_layers: int) -> QwenConfig:
    import dataclasses

    return dataclasses.replace(cfg, num_hidden_layers=n_layers)


def _window_bias(start: jax.Array, first_pos: jax.Array, t: int, cache_len: int):
    """(B, t, S) additive bias for a t-token verification window whose i-th
    query sits at cache slot first_pos + i: valid keys are
    [start[b], first_pos + i]."""
    k_idx = jnp.arange(cache_len)[None, None, :]
    q_pos = (first_pos + jnp.arange(t))[None, :, None]
    valid = (k_idx >= start[:, None, None]) & (k_idx <= q_pos)
    return jnp.where(valid, 0.0, -1e9).astype(jnp.float32)


class SpecState(NamedTuple):
    tgt_cache: KVCache
    drf_cache: KVCache
    cur_token: jax.Array   # (B,)
    step: jax.Array        # scalar — tokens emitted so far
    done: jax.Array        # (B,)
    start: jax.Array       # (B,) left-pad offsets
    prompt_len: jax.Array  # (B,)
    accepted: jax.Array    # scalar — total draft tokens accepted (telemetry)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "draft_cfg", "max_new_tokens", "cache_len", "k",
        "eos_ids", "pad_id", "vocab_slice", "extra_ids", "cache_dtype",
    ),
)
def speculative_generate_greedy(
    params,
    draft_params,
    cfg: QwenConfig,
    draft_cfg: QwenConfig,
    input_ids: jax.Array,    # (B, T_pad) left-padded
    prompt_mask: jax.Array,  # (B, T_pad) bool
    max_new_tokens: int,
    cache_len: int,
    k: int = 4,
    eos_ids: Tuple[int, ...] = (),
    pad_id: int = 0,
    vocab_slice: Tuple[int, int] | None = None,
    extra_ids: Tuple[int, ...] = (),
    cache_dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Greedy speculative decode.  Returns (tokens (B, max_new), lengths (B,),
    accepted_total scalar).  Output is bit-identical to the target's vanilla
    greedy `generate`."""
    b, t_pad = input_ids.shape
    assert cache_len >= t_pad + max_new_tokens + k, "cache too small"

    # prefill BOTH models over the prompt (greedy first token from the target)
    tgt_cache = init_kv_cache(cfg, b, cache_len, cache_dtype)
    tgt_state: GenState = prefill(
        params, cfg, input_ids, prompt_mask, tgt_cache, jax.random.PRNGKey(0),
        1.0, 1, 1.0, True, vocab_slice=vocab_slice, extra_ids=extra_ids,
    )
    drf_cache = init_kv_cache(draft_cfg, b, cache_len, cache_dtype)
    drf_state: GenState = prefill(
        draft_params, draft_cfg, input_ids, prompt_mask, drf_cache,
        jax.random.PRNGKey(0), 1.0, 1, 1.0, True,
        vocab_slice=vocab_slice, extra_ids=extra_ids,
    )

    tokens0 = jnp.full((b, max_new_tokens + k + 1), pad_id, jnp.int32)
    valid0 = jnp.zeros((b, max_new_tokens + k + 1), bool)

    state = SpecState(
        tgt_cache=tgt_state.cache,
        drf_cache=drf_state.cache,
        cur_token=tgt_state.cur_token,
        step=jnp.zeros((), jnp.int32),
        done=jnp.zeros((b,), bool),
        start=tgt_state.start,
        prompt_len=tgt_state.prompt_len,
        accepted=jnp.zeros((), jnp.int32),
    )

    def is_eos(tok):
        e = jnp.zeros(tok.shape, bool)
        for eid in eos_ids:
            e = e | (tok == eid)
        return e

    def cond(carry):
        state, _, _ = carry
        return (state.step < max_new_tokens) & ~jnp.all(state.done)

    def body(carry):
        state, tokens, valid = carry
        s0 = state.step  # this round emits positions s0, s0+1, ...

        # ---- draft proposes: window[i] = candidate emission for s0+i ----
        # (window[0] = cur_token is already the true emission for s0; the
        # draft consumes each window token to propose the next)
        def drf_step(c, i):
            drf_cache, tok = c
            cache_pos = t_pad + s0 + i
            positions = (state.prompt_len + s0 + i)[:, None]
            logits, drf_cache = qwen_forward(
                draft_params, draft_cfg, tok[:, None], positions, drf_cache,
                cache_pos, None, decode_window=(state.start, cache_pos),
                vocab_slice=vocab_slice, extra_ids=extra_ids,
                # this module's trace also contains the two prefills — the
                # fused decode kernel miscompiles such modules on v5e (see
                # lm/generate._decode_all); keep the draft loop on XLA
                allow_decode_kernel=False,
            )
            nxt = _expand_constrained(greedy_token(logits[:, -1]), vocab_slice, extra_ids)
            return (drf_cache, nxt), tok

        (drf_cache, _), fed = jax.lax.scan(
            drf_step, (state.drf_cache, state.cur_token), jnp.arange(k)
        )
        window = fed.T  # (B, k)

        # ---- target verifies the whole window in one forward ----
        first_pos = t_pad + s0
        bias = _window_bias(state.start, first_pos, k, cache_len)
        positions = (state.prompt_len + s0)[:, None] + jnp.arange(k)[None, :]
        logits, tgt_cache = qwen_forward(
            params, cfg, window, positions, state.tgt_cache, first_pos, bias,
            vocab_slice=vocab_slice, extra_ids=extra_ids,
        )
        preds = _expand_constrained(
            greedy_token(logits.reshape(b * k, -1)).reshape(b, k),
            vocab_slice, extra_ids,
        )  # preds[:, i] = target emission for s0+i+1 given window[:, :i+1]

        # accept the longest prefix of drafts the target agrees with
        agree = window[:, 1:] == preds[:, :-1]                     # (B, k-1)
        n_acc = jnp.sum(jnp.cumprod(agree.astype(jnp.int32), axis=1), axis=1)
        n_consume = n_acc + 1                                      # window[0..n_acc]
        bonus = jnp.take_along_axis(preds, n_acc[:, None], axis=1)[:, 0]

        # EOS inside the consumed prefix caps this row's progress
        idxk = jnp.arange(k)[None, :]
        eos_at = is_eos(window) & (idxk < n_consume[:, None])
        has_eos = jnp.any(eos_at, axis=1)
        first_eos = jnp.argmax(eos_at, axis=1)
        n_consume = jnp.where(has_eos, first_eos + 1, n_consume)

        # aligned layout: all rows advance together by the minimum live
        # consumption (their caches stay position-consistent; rows that
        # verified further simply re-derive those tokens next round)
        live = ~state.done
        adv = jnp.where(live, n_consume, jnp.iinfo(jnp.int32).max)
        advance = jnp.where(jnp.all(state.done), 0, jnp.min(adv))

        # record emissions for positions s0+i, i < advance
        eos_cap = jnp.where(has_eos, first_eos, k)                 # last valid idx
        row_valid = (idxk < advance) & live[:, None] & (idxk <= eos_cap[:, None])
        emit = jnp.where(row_valid, window, pad_id)
        tokens = jax.lax.dynamic_update_slice(tokens, emit, (0, s0))
        valid = jax.lax.dynamic_update_slice(valid, row_valid, (0, s0))

        done = state.done | (has_eos & (first_eos < advance))

        # next unconsumed emission: rows whose consumption ends exactly at
        # `advance` continue from the BONUS (the target's own prediction at
        # the rejection point — window[advance] there is the rejected draft);
        # rows that verified further continue from their accepted prefix
        cur_window = jnp.take(window, jnp.minimum(advance, k - 1), axis=1)
        cur = jnp.where(n_consume == advance, bonus, cur_window)
        cur = jnp.where(done, pad_id, cur)

        new_state = SpecState(
            tgt_cache=tgt_cache,
            drf_cache=drf_cache,
            cur_token=cur,
            step=s0 + advance,
            done=done,
            start=state.start,
            prompt_len=state.prompt_len,
            accepted=state.accepted
            + jnp.sum(jnp.where(live, jnp.maximum(advance - 1, 0), 0)),
        )
        return (new_state, tokens, valid)

    state, tokens, valid = jax.lax.while_loop(cond, body, (state, tokens0, valid0))
    tokens = jnp.where(valid, tokens, pad_id)[:, :max_new_tokens]
    valid = valid[:, :max_new_tokens]
    lengths = jnp.sum(valid, axis=1).astype(jnp.int32)
    return tokens, lengths, state.accepted


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "draft_cfg", "max_new_tokens", "cache_len", "k", "top_k",
        "eos_ids", "pad_id", "vocab_slice", "extra_ids", "cache_dtype",
    ),
)
def speculative_generate(
    params,
    draft_params,
    cfg: QwenConfig,
    draft_cfg: QwenConfig,
    input_ids: jax.Array,    # (B, T_pad) left-padded
    prompt_mask: jax.Array,  # (B, T_pad) bool
    rng: jax.Array,
    max_new_tokens: int,
    cache_len: int,
    k: int = 4,
    temperature: float = 0.8,
    top_k: int = 50,
    top_p: float = 0.95,
    eos_ids: Tuple[int, ...] = (),
    pad_id: int = 0,
    vocab_slice: Tuple[int, int] | None = None,
    extra_ids: Tuple[int, ...] = (),
    cache_dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Stochastic speculative decoding (Leviathan-style modified rejection
    sampling applied to the WARPED distributions — the temperature→top-k→
    top-p chain both models actually sample from).  The output distribution
    equals vanilla sampled `generate`'s exactly: a drafted token x is
    accepted with prob min(1, q(x)/p(x)); on rejection the emission is drawn
    from norm(max(q - p, 0)); on full acceptance a bonus comes from the
    target's final-position distribution.

    Returns (tokens (B, max_new), lengths (B,), accepted_total scalar)."""
    from sparktts_tpu.lm.sample import sample_token, warped_probs

    b, t_pad = input_ids.shape
    assert cache_len >= t_pad + max_new_tokens + k, "cache too small"

    rng, r_pre = jax.random.split(rng)
    tgt_cache = init_kv_cache(cfg, b, cache_len, cache_dtype)
    tgt_state: GenState = prefill(
        params, cfg, input_ids, prompt_mask, tgt_cache, r_pre,
        temperature, top_k, top_p, False, vocab_slice=vocab_slice,
        extra_ids=extra_ids,
    )
    drf_cache = init_kv_cache(draft_cfg, b, cache_len, cache_dtype)
    drf_state: GenState = prefill(
        draft_params, draft_cfg, input_ids, prompt_mask, drf_cache,
        jax.random.PRNGKey(0), temperature, top_k, top_p, True,
        vocab_slice=vocab_slice, extra_ids=extra_ids,
    )
    del drf_state  # only its cache matters; proposals resample each round

    tokens0 = jnp.full((b, max_new_tokens + k + 1), pad_id, jnp.int32)
    valid0 = jnp.zeros((b, max_new_tokens + k + 1), bool)

    state = SpecState(
        tgt_cache=tgt_state.cache,
        drf_cache=drf_cache,
        cur_token=tgt_state.cur_token,
        step=jnp.zeros((), jnp.int32),
        done=jnp.zeros((b,), bool),
        start=tgt_state.start,
        prompt_len=tgt_state.prompt_len,
        accepted=jnp.zeros((), jnp.int32),
    )

    def is_eos(tok):
        e = jnp.zeros(tok.shape, bool)
        for eid in eos_ids:
            e = e | (tok == eid)
        return e

    def cond(carry):
        state, _, _, _ = carry
        return (state.step < max_new_tokens) & ~jnp.all(state.done)

    def body(carry):
        state, tokens, valid, rng = carry
        s0 = state.step

        # ---- draft proposes k-1 tokens, recording its warped probs ----
        def drf_step(c, inp):
            drf_cache, tok = c
            i, r = inp
            cache_pos = t_pad + s0 + i
            positions = (state.prompt_len + s0 + i)[:, None]
            logits, drf_cache = qwen_forward(
                draft_params, draft_cfg, tok[:, None], positions, drf_cache,
                cache_pos, None, decode_window=(state.start, cache_pos),
                vocab_slice=vocab_slice, extra_ids=extra_ids,
                # this module's trace also contains the two prefills — the
                # fused decode kernel miscompiles such modules on v5e (see
                # lm/generate._decode_all); keep the draft loop on XLA
                allow_decode_kernel=False,
            )
            p = warped_probs(logits[:, -1], temperature, top_k, top_p)
            nxt_packed = sample_token(r, logits[:, -1], temperature, top_k, top_p)
            nxt = _expand_constrained(nxt_packed, vocab_slice, extra_ids)
            return (drf_cache, nxt), (tok, nxt_packed, p)

        rng, *draft_keys = jax.random.split(rng, k + 1)
        (drf_cache, _), (fed, packed_next, pd) = jax.lax.scan(
            drf_step,
            (state.drf_cache, state.cur_token),
            (jnp.arange(k), jnp.stack(draft_keys)),
        )
        window = fed.T             # (B, k) full-vocab ids; window[0] = cur
        packed_next = packed_next.T  # (B, k) packed id of window[i+1]'s draw
        pd = pd.transpose(1, 0, 2)   # (B, k, W) draft probs for position s0+i+1

        # ---- target scores the window in one forward ----
        first_pos = t_pad + s0
        bias = _window_bias(state.start, first_pos, k, cache_len)
        positions = (state.prompt_len + s0)[:, None] + jnp.arange(k)[None, :]
        logits, tgt_cache = qwen_forward(
            params, cfg, window, positions, state.tgt_cache, first_pos, bias,
            vocab_slice=vocab_slice, extra_ids=extra_ids,
        )
        w = logits.shape[-1]
        q = warped_probs(
            logits.reshape(b * k, w), temperature, top_k, top_p
        ).reshape(b, k, w)          # q[:, i] = target dist for position s0+i+1

        # ---- modified rejection sampling over the k-1 proposals ----
        x = packed_next[:, :-1]                       # (B, k-1) proposed draws
        gather = jnp.take_along_axis
        q_x = gather(q[:, :-1], x[:, :, None], axis=2)[:, :, 0]
        p_x = gather(pd[:, :-1], x[:, :, None], axis=2)[:, :, 0]
        rng, r_u = jax.random.split(rng)
        u = jax.random.uniform(r_u, (b, k - 1))
        accept = u * p_x < q_x                        # min(1, q/p) acceptance
        n_acc = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1)
        n_consume = n_acc + 1

        # emission at the stop position: residual on rejection, q on full
        # acceptance (the bonus)
        q_stop = gather(q, n_acc[:, None, None].repeat(w, 2), axis=1)[:, 0]  # (B, W)
        p_stop = gather(pd, n_acc[:, None, None].repeat(w, 2), axis=1)[:, 0]
        full_acc = n_acc == (k - 1)
        residual = jnp.maximum(q_stop - p_stop, 0.0)
        res_norm = jnp.sum(residual, axis=1, keepdims=True)
        # numerical guard: if the residual is empty (p covers q), fall back to q
        residual = jnp.where(res_norm > 1e-9, residual, q_stop)
        dist = jnp.where(full_acc[:, None], q_stop, residual)
        rng, r_s = jax.random.split(rng)
        stop_packed = jax.random.categorical(r_s, jnp.log(dist + 1e-30), axis=-1)
        stop_tok = _expand_constrained(
            stop_packed.astype(jnp.int32), vocab_slice, extra_ids
        )

        # EOS inside the consumed prefix caps this row's progress
        idxk = jnp.arange(k)[None, :]
        eos_at = is_eos(window) & (idxk < n_consume[:, None])
        has_eos = jnp.any(eos_at, axis=1)
        first_eos = jnp.argmax(eos_at, axis=1)
        n_consume = jnp.where(has_eos, first_eos + 1, n_consume)

        live = ~state.done
        adv = jnp.where(live, n_consume, jnp.iinfo(jnp.int32).max)
        advance = jnp.where(jnp.all(state.done), 0, jnp.min(adv))

        eos_cap = jnp.where(has_eos, first_eos, k)
        row_valid = (idxk < advance) & live[:, None] & (idxk <= eos_cap[:, None])
        emit = jnp.where(row_valid, window, pad_id)
        tokens = jax.lax.dynamic_update_slice(tokens, emit, (0, s0))
        valid = jax.lax.dynamic_update_slice(valid, row_valid, (0, s0))

        done = state.done | (has_eos & (first_eos < advance))

        # next unconsumed emission: rows whose stop position is exactly at
        # `advance` take the freshly-sampled stop token; rows with acceptance
        # beyond `advance` continue from their accepted prefix (window[advance])
        # and re-run the acceptance process next round with fresh randomness —
        # exact, by memorylessness of rejection sampling
        cur_window = jnp.take(window, jnp.minimum(advance, k - 1), axis=1)
        cur = jnp.where(n_consume == advance, stop_tok, cur_window)
        cur = jnp.where(done, pad_id, cur)

        new_state = SpecState(
            tgt_cache=tgt_cache,
            drf_cache=drf_cache,
            cur_token=cur,
            step=s0 + advance,
            done=done,
            start=state.start,
            prompt_len=state.prompt_len,
            accepted=state.accepted
            + jnp.sum(jnp.where(live, jnp.maximum(advance - 1, 0), 0)),
        )
        return (new_state, tokens, valid, rng)

    state, tokens, valid, _ = jax.lax.while_loop(
        cond, body, (state, tokens0, valid0, rng)
    )
    tokens = jnp.where(valid, tokens, pad_id)[:, :max_new_tokens]
    valid = valid[:, :max_new_tokens]
    lengths = jnp.sum(valid, axis=1).astype(jnp.int32)
    return tokens, lengths, state.accepted
