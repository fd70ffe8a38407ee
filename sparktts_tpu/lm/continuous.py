"""Continuous (inflight) batching engine for the speech LM.

The reference's serving throughput comes from TensorRT-LLM's inflight fused
batching (SURVEY.md §2.2 row 1): sequences join and leave the running batch
per decode step, so one slow utterance never stalls the others.  The TPU
equivalent here keeps a fixed-B slot pool over one shared KV cache:

  * every slot has its own cache write position, RoPE position, pad offset
    and done flag — all (B,) vectors on device
  * one decode micro-batch (`engine.step`) advances ALL active slots by
    `steps_per_dispatch` tokens in a single jitted scan; per-slot K/V writes
    are a batched scatter (`lm/qwen.py:_write_kv` vector path)
  * admission runs a single-sequence prefill and scatters the prompt's K/V
    into the slot's cache row — running slots are untouched

Shapes are static: (max_slots, cache_len) fixed at engine construction, so
every program compiles exactly once.
"""

from __future__ import annotations

import functools
import threading
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparktts_tpu.config import QwenConfig
from sparktts_tpu.lm.qwen import KVCache, init_kv_cache, qwen_forward
from sparktts_tpu.lm.sample import greedy_token, sample_token


#: Fixed decode dispatch-size menu.  Every continuous-engine decode program is
#: compiled for one of these step counts — or the engine's max_dispatch cap
#: when that cap is not itself a rung — and nothing else, so the server's
#: adaptive dispatch sizing (size the next dispatch to the nearest chunk
#: boundary / budget end) can never trigger a fresh XLA compile mid-serving
#: once the (ladder ∪ {cap}) set is warm.  Budget enforcement lives ON DEVICE
#: (SlotState.limit), so a dispatch larger than a slot's remaining budget is
#: safe: the slot just stops early inside the scan.
#:
#: The top rungs (256/512) exist for deadline-free slots: a lone offline
#: request's whole 500-token budget rides ONE dispatch instead of four, which
#: on a tunneled TPU saves ~3 relay round-trips (~33 ms each — see
#: BENCH_NOTES "decode-step ablation").  Latency-sensitive situations never
#: pick them: streaming slots cap at their first-chunk distance and
#: concurrent batches cap at the server's absolute co-dispatch limit.
DISPATCH_LADDER = (4, 8, 16, 32, 64, 128, 256, 512)


#: How many steps of scan overshoot cost about one dispatch round-trip.
#: The scan body runs ALL n_steps iterations even after every slot hits its
#: on-device budget stop (done slots still stream weights), so rounding a
#: request UP to a distant rung trades real compute for the saved dispatch:
#: at ~1.1 ms/step and ~33 ms/dispatch on the tunneled relay, overshoot past
#: ~30 steps costs more than the dispatch it saves.
LADDER_OVERSHOOT_TOLERANCE = 32


def snap_to_ladder(
    requested: int,
    max_dispatch: int,
    overshoot: int = LADDER_OVERSHOOT_TOLERANCE,
) -> int:
    """Ladder rung for a `requested` step count, capped at max_dispatch.
    Rounds UP to the next rung only when the overshoot stays within
    `overshoot` steps (the scan executes every overshot step — see
    LADDER_OVERSHOOT_TOLERANCE); otherwise takes the largest rung BELOW so
    the tail rides a later, tighter dispatch.

    A non-rung `max_dispatch` is itself a rung: the warm walk compiles it
    via `eng.step(max_dispatch)`, so snapping must be able to both RETURN it
    (that warm call, and any runtime request near the cap, must resolve to
    the warmed size, not divert to a smaller rung) and never exceed it.  The
    result is therefore always in (DISPATCH_LADDER ∪ {max_dispatch}) ∩
    [1, max_dispatch]."""
    if max_dispatch in DISPATCH_LADDER:
        rungs = DISPATCH_LADDER
    else:
        rungs = tuple(sorted(set(DISPATCH_LADDER) | {max_dispatch}))
    below = None
    for v in rungs:
        if v > max_dispatch:
            break
        if v >= requested:
            if v - requested <= overshoot:
                return v
            return below if below is not None else v
        below = v
    return below if below is not None else min(rungs[0], max_dispatch)


# Process-global fused-admission executable cache (see
# ContinuousBatchingEngine.warm_fused): keyed by the full compile signature,
# shared across engine instances built over the same pipeline.
_FUSED_EXE_CACHE: dict = {}
_FUSED_CACHE_LOCK = threading.Lock()


class AdmissionDeferred(RuntimeError):
    """Raised by `submit` when a request cannot be admitted *now* without
    risking resource exhaustion mid-decode (paged engine: the page pool
    cannot cover every admitted request's worst-case growth).  The serving
    loop treats this as backpressure — requeue and retry after slots free —
    not as a failure."""


class RequestTooLong(ValueError):
    """Raised at admission when prompt + generation budget can NEVER fit the
    engine's per-slot capacity — no amount of waiting helps, so the request
    is rejected cleanly (role of the reference engine's max_num_tokens bound,
    reference `run.sh:31`) instead of tripping a capacity assert mid-admit."""


class SlotState(NamedTuple):
    """Per-slot device vectors (all (B,) unless noted)."""

    cache: KVCache
    cur_token: jax.Array   # next token to feed
    write_pos: jax.Array   # cache slot where cur_token's K/V will be written
    position: jax.Array    # RoPE position of cur_token
    start: jax.Array       # first valid cache index (left-pad offset; 0 here)
    limit: jax.Array       # cache end: slot stops once write_pos reaches it
    active: jax.Array      # bool — slot holds a live sequence
    done: jax.Array        # bool — sequence finished (EOS seen / budget hit)
    control: jax.Array     # bool — controllable-mode request (full superset
    #                        constraint); False = clone (semantic+EOS only)
    temperature: jax.Array  # per-slot sampling temperature
    top_p: jax.Array        # per-slot nucleus threshold
    rng: jax.Array


def init_slots(
    cfg: QwenConfig, max_slots: int, cache_len: int, rng,
    cache_dtype=jnp.bfloat16, mesh=None,
) -> SlotState:
    # distinct buffers per field: donation forbids aliased arguments
    slots = SlotState(
        cache=init_kv_cache(cfg, max_slots, cache_len, cache_dtype),
        cur_token=jnp.zeros((max_slots,), jnp.int32),
        write_pos=jnp.zeros((max_slots,), jnp.int32),
        position=jnp.zeros((max_slots,), jnp.int32),
        start=jnp.zeros((max_slots,), jnp.int32),
        limit=jnp.zeros((max_slots,), jnp.int32),
        active=jnp.zeros((max_slots,), bool),
        done=jnp.ones((max_slots,), bool),
        control=jnp.ones((max_slots,), bool),
        temperature=jnp.full((max_slots,), 0.8, jnp.float32),
        top_p=jnp.full((max_slots,), 0.95, jnp.float32),
        rng=rng,
    )
    if mesh is None:
        # commit the state to the default device: live slot state is always
        # a program output (committed), and the jit cache keys on argument
        # committed-ness — an uncommitted initial state would give the very
        # first dispatch after construction a different decode_steps cache
        # key than every later one (a full recompile on the serving path)
        dev = jax.devices()[0]
        return jax.tree.map(lambda x: jax.device_put(x, dev), slots)
    # multi-chip serving (pipeline.shard_llm): commit the decode state to the
    # SAME device set as the sharded params — K/V heads follow the attention
    # tp sharding, the small per-slot vectors replicate.  Without this, the
    # AOT-compiled fused-admission programs see single-device state against
    # mesh-sharded params and refuse to lower.
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    # heads-over-tp only: slot batch stays replicated (admission scatters a
    # single slot by index; a dp-sharded batch would turn every scatter into
    # a cross-replica collective for a handful of rows)
    cache_sh = NamedSharding(mesh, P(None, None, None, "tp", None))
    replicated = NamedSharding(mesh, P())
    return SlotState(
        cache=jax.tree.map(lambda x: jax.device_put(x, cache_sh), slots.cache),
        **{
            f: jax.device_put(getattr(slots, f), replicated)
            for f in slots._fields
            if f != "cache"
        },
    )


def _mode_masked(logits: jax.Array, control, vocab_slice, extra_ids, clone_slice, clone_extras):
    """Narrow packed guided logits to the clone-legal subset for non-control
    sequences.  `control` is (B,) bool (or scalar); no-op when the engine has
    no per-mode info."""
    if vocab_slice is None or clone_slice is None:
        return logits
    from sparktts_tpu.lm.generate import packed_allowed_mask

    allowed = packed_allowed_mask(vocab_slice, extra_ids, clone_slice, clone_extras)
    control = jnp.asarray(control)
    if control.ndim == 0:
        control = control[None]
    return jnp.where(control[:, None] | allowed[None, :], logits, -1e9)


def prefill_one(
    params,
    cfg: QwenConfig,
    input_ids: jax.Array,   # (1, t_pad) right-padded
    prompt_len: jax.Array,  # scalar int32
    rng: jax.Array,
    cache_dtype,
    temperature: float,
    top_k: int,
    top_p: float,
    greedy: bool,
    vocab_slice: Tuple[int, int] | None,
    extra_ids: Tuple[int, ...],
    control=True,
    clone_slice: Tuple[int, int] | None = None,
    clone_extras: Tuple[int, ...] = (),
):
    """Shared single-prompt admission prefill (dense and paged engines):
    runs the prompt through the model with a causal+pad mask, samples the
    first new token.  Returns (first_tok scalar, tmp KVCache (L,1,t_pad,...),
    new rng)."""
    from sparktts_tpu.lm.generate import _expand_constrained

    t_pad = input_ids.shape[1]
    mask = jnp.arange(t_pad)[None, :] < prompt_len
    tmp_cache = init_kv_cache(cfg, 1, t_pad, cache_dtype)
    positions = jnp.minimum(jnp.arange(t_pad)[None, :], prompt_len - 1)
    q_idx = jnp.arange(t_pad)[None, :, None]
    k_idx = jnp.arange(t_pad)[None, None, :]
    bias = jnp.where((k_idx <= q_idx) & mask[:, None, :], 0.0, -1e9).astype(jnp.float32)
    logits, tmp_cache = qwen_forward(
        params, cfg, input_ids, positions, tmp_cache, 0, bias,
        vocab_slice=vocab_slice, extra_ids=extra_ids,
    )
    last = jnp.take_along_axis(logits, (prompt_len - 1).reshape(1, 1, 1), axis=1)
    last = _mode_masked(last[:, 0], control, vocab_slice, extra_ids, clone_slice, clone_extras)
    rng, sub = jax.random.split(rng)
    if greedy:
        first_tok = greedy_token(last)[0]
    else:
        first_tok = sample_token(sub, last, temperature, top_k, top_p)[0]
    first_tok = _expand_constrained(first_tok, vocab_slice, extra_ids)
    return first_tok, tmp_cache, rng


def prefill_many(
    params,
    cfg: QwenConfig,
    input_ids: jax.Array,    # (B, t_pad) right-padded
    prompt_lens: jax.Array,  # (B,) int32
    rng: jax.Array,
    cache_dtype,
    temperature: jax.Array,  # (B,) float32
    top_k: int,
    top_p: jax.Array,        # (B,) float32
    greedy: bool,
    vocab_slice: Tuple[int, int] | None,
    extra_ids: Tuple[int, ...],
    control: jax.Array,      # (B,) bool
    clone_slice: Tuple[int, int] | None = None,
    clone_extras: Tuple[int, ...] = (),
):
    """Batched admission prefill: B same-padded prompts through the model in
    ONE program.  The per-request device compute of a burst of admissions is
    dominated by weight streaming, so B rows cost barely more than one —
    at a 16-stream burst this replaces ~16 serial prefill programs' worth of
    device time with one (VERDICT r04 item 3).  Returns
    (first_toks (B,), tmp KVCache (L, B, t_pad, ...), new rng)."""
    from sparktts_tpu.lm.generate import _expand_constrained

    b, t_pad = input_ids.shape
    mask = jnp.arange(t_pad)[None, :] < prompt_lens[:, None]
    tmp_cache = init_kv_cache(cfg, b, t_pad, cache_dtype)
    positions = jnp.minimum(jnp.arange(t_pad)[None, :], prompt_lens[:, None] - 1)
    q_idx = jnp.arange(t_pad)[None, :, None]
    k_idx = jnp.arange(t_pad)[None, None, :]
    bias = jnp.where((k_idx <= q_idx) & mask[:, None, :], 0.0, -1e9).astype(jnp.float32)
    logits, tmp_cache = qwen_forward(
        params, cfg, input_ids, positions, tmp_cache, 0, bias,
        vocab_slice=vocab_slice, extra_ids=extra_ids,
    )
    last = jnp.take_along_axis(
        logits, jnp.maximum(prompt_lens - 1, 0)[:, None, None], axis=1
    )[:, 0]
    last = _mode_masked(last, control, vocab_slice, extra_ids, clone_slice, clone_extras)
    rng, sub = jax.random.split(rng)
    if greedy:
        first_toks = greedy_token(last)
    else:
        first_toks = sample_token(sub, last, temperature[:, None], top_k, top_p[:, None])
    return _expand_constrained(first_toks, vocab_slice, extra_ids), tmp_cache, rng


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "slot_cache_len", "top_k", "greedy", "vocab_slice", "extra_ids",
        "clone_slice", "clone_extras", "assemble_fn",
    ),
    donate_argnums=(1,),
)
def admit_prefill_assembled_batch(
    params,
    slots: SlotState,
    cfg: QwenConfig,
    slot_ids: jax.Array,      # (B,) int32 target slots (duplicates allowed
    #                           ONLY for identical pad rows — last-writer)
    global_t: jax.Array,      # (B, N) int32 cached voice tokens (device)
    semantic: jax.Array,      # (B, S_pad) int32
    scaffolds: jax.Array,     # (B, t_pad) int32 host-built prompt scaffolds
    g_offs: jax.Array,        # (B,)
    s_offs: jax.Array,        # (B,)
    n_sems: jax.Array,        # (B,)
    prompt_lens: jax.Array,   # (B,) true lengths
    slot_cache_len: int,
    temperature: jax.Array,   # (B,) float32
    top_p: jax.Array,         # (B,) float32
    limits: jax.Array,        # (B,) int32 cache stop indices
    top_k: int = 50,
    greedy: bool = False,
    vocab_slice: Tuple[int, int] | None = None,
    extra_ids: Tuple[int, ...] = (),
    clone_slice: Tuple[int, int] | None = None,
    clone_extras: Tuple[int, ...] = (),
    assemble_fn=None,         # static: pipeline._assemble_fn_batch(t_pad, s_pad)
) -> SlotState:
    """Batched `admit_prefill_assembled`: a BURST of voice-cache-hit clone
    admissions sharing one (S_pad, t_pad) shape signature becomes ONE device
    program — B prompt assemblies + one (B, t_pad) prefill + B cache-row
    installs.  Clone mode only (the cache stores clone-prompt voices).

    Rows are padded to a fixed batch ladder by DUPLICATING row 0 (same slot
    id, same data): scatters with duplicate indices are order-undefined, but
    all duplicate writes carry identical values, so the result is
    deterministic and pad rows are free."""
    ids = assemble_fn(
        scaffolds,
        jnp.asarray(global_t, jnp.int32),
        jnp.asarray(semantic, jnp.int32),
        g_offs,
        s_offs,
        n_sems,
    )
    first_toks, tmp_cache, rng = prefill_many(
        params, cfg, ids, prompt_lens, slots.rng, slots.cache.k.dtype,
        temperature, top_k, top_p, greedy, vocab_slice, extra_ids,
        jnp.zeros(ids.shape[0], bool), clone_slice, clone_extras,
    )
    b = ids.shape[0]
    # install each row's prompt K/V into its slot: pad (L, B, t_pad, ...) up
    # to the slot cache length, then scatter rows by slot id
    k_full = jax.lax.dynamic_update_slice(
        jnp.zeros(
            (cfg.num_hidden_layers, b, slot_cache_len, cfg.num_key_value_heads, cfg.head_dim),
            slots.cache.k.dtype,
        ),
        tmp_cache.k,
        (0, 0, 0, 0, 0),
    )
    v_full = jax.lax.dynamic_update_slice(
        jnp.zeros_like(k_full), tmp_cache.v, (0, 0, 0, 0, 0)
    )
    new_k = slots.cache.k.at[:, slot_ids].set(k_full)
    new_v = slots.cache.v.at[:, slot_ids].set(v_full)
    return SlotState(
        cache=KVCache(k=new_k, v=new_v),
        cur_token=slots.cur_token.at[slot_ids].set(first_toks),
        write_pos=slots.write_pos.at[slot_ids].set(prompt_lens),
        position=slots.position.at[slot_ids].set(prompt_lens),
        start=slots.start.at[slot_ids].set(0),
        limit=slots.limit.at[slot_ids].set(jnp.asarray(limits, jnp.int32)),
        active=slots.active.at[slot_ids].set(True),
        done=slots.done.at[slot_ids].set(False),
        control=slots.control.at[slot_ids].set(False),
        temperature=slots.temperature.at[slot_ids].set(temperature),
        top_p=slots.top_p.at[slot_ids].set(top_p),
        rng=rng,
    )


#: Fixed batched-admission batch sizes: bursts snap UP into this ladder with
#: duplicated pad rows, so the AOT compile surface per shape signature stays
#: at four programs instead of one per burst size.
ADMIT_BATCH_LADDER = (2, 4, 8, 16)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "slot_cache_len", "top_k", "greedy", "vocab_slice", "extra_ids",
        "clone_slice", "clone_extras", "tokenize_fn", "assemble_fn",
    ),
    donate_argnums=(1,),
)
def admit_prefill_fused_batch(
    params,
    slots: SlotState,
    cfg: QwenConfig,
    slot_ids: jax.Array,       # (B,)
    w2v_params,
    bc_params,
    wavs: jax.Array,           # (B, pad_len)
    feature_masks: jax.Array,  # (B, F) bool
    ref_wavs: jax.Array,       # (B, ref_len)
    scaffolds: jax.Array,      # (B, t_pad) int32
    g_offs: jax.Array,         # (B,)
    s_offs: jax.Array,         # (B,)
    n_sems: jax.Array,         # (B,)
    prompt_lens: jax.Array,    # (B,)
    slot_cache_len: int,
    temperature: jax.Array,    # (B,)
    top_p: jax.Array,          # (B,)
    limits: jax.Array,         # (B,)
    top_k: int = 50,
    greedy: bool = False,
    vocab_slice: Tuple[int, int] | None = None,
    extra_ids: Tuple[int, ...] = (),
    clone_slice: Tuple[int, int] | None = None,
    clone_extras: Tuple[int, ...] = (),
    tokenize_fn=None,          # static: pipeline._tokenize_fn(pad_len, ref_len)
    assemble_fn=None,          # static: pipeline._assemble_fn_batch(t_pad, s_pad)
) -> Tuple[SlotState, jax.Array, jax.Array]:
    """Batched `admit_prefill_fused`: a BURST of first-time clone admissions
    sharing one (wav bucket, t_pad) signature runs audio tokenization (batch
    wav2vec2 + BiCodec), prompt assembly and the (B, t_pad) prefill as ONE
    device program.  Returns (slots, global (B, N), semantic (B, S_pad)) —
    token arrays stay on device for the vocoder and the voice cache.  Same
    duplicate-row-0 padding contract as admit_prefill_assembled_batch."""
    semantic, global_t = tokenize_fn(w2v_params, bc_params, wavs, feature_masks, ref_wavs)
    ids = assemble_fn(
        scaffolds,
        jnp.asarray(global_t, jnp.int32),
        jnp.asarray(semantic, jnp.int32),
        g_offs,
        s_offs,
        n_sems,
    )
    first_toks, tmp_cache, rng = prefill_many(
        params, cfg, ids, prompt_lens, slots.rng, slots.cache.k.dtype,
        temperature, top_k, top_p, greedy, vocab_slice, extra_ids,
        jnp.zeros(ids.shape[0], bool), clone_slice, clone_extras,
    )
    b = ids.shape[0]
    k_full = jax.lax.dynamic_update_slice(
        jnp.zeros(
            (cfg.num_hidden_layers, b, slot_cache_len, cfg.num_key_value_heads, cfg.head_dim),
            slots.cache.k.dtype,
        ),
        tmp_cache.k,
        (0, 0, 0, 0, 0),
    )
    v_full = jax.lax.dynamic_update_slice(
        jnp.zeros_like(k_full), tmp_cache.v, (0, 0, 0, 0, 0)
    )
    new_slots = SlotState(
        cache=KVCache(
            k=slots.cache.k.at[:, slot_ids].set(k_full),
            v=slots.cache.v.at[:, slot_ids].set(v_full),
        ),
        cur_token=slots.cur_token.at[slot_ids].set(first_toks),
        write_pos=slots.write_pos.at[slot_ids].set(prompt_lens),
        position=slots.position.at[slot_ids].set(prompt_lens),
        start=slots.start.at[slot_ids].set(0),
        limit=slots.limit.at[slot_ids].set(jnp.asarray(limits, jnp.int32)),
        active=slots.active.at[slot_ids].set(True),
        done=slots.done.at[slot_ids].set(False),
        control=slots.control.at[slot_ids].set(False),
        temperature=slots.temperature.at[slot_ids].set(temperature),
        top_p=slots.top_p.at[slot_ids].set(top_p),
        rng=rng,
    )
    return new_slots, global_t, semantic


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "slot_cache_len", "top_k", "greedy", "vocab_slice", "extra_ids",
        "clone_slice", "clone_extras",
    ),
    donate_argnums=(1,),
)
def admit_prefill(
    params,
    slots: SlotState,
    cfg: QwenConfig,
    slot: jax.Array,          # scalar int32
    input_ids: jax.Array,     # (1, T_pad) right-padded prompt
    prompt_len: jax.Array,    # scalar int32 true length
    slot_cache_len: int,
    temperature: float = 0.8,
    top_k: int = 50,
    top_p: float = 0.95,
    greedy: bool = False,
    vocab_slice: Tuple[int, int] | None = None,
    extra_ids: Tuple[int, ...] = (),
    limit: jax.Array | int | None = None,   # scalar: cache index decode must stop at
    control: jax.Array | bool = True,
    clone_slice: Tuple[int, int] | None = None,
    clone_extras: Tuple[int, ...] = (),
) -> SlotState:
    """Prefill one prompt and install it into `slot`.

    The prompt is RIGHT-padded here (unlike aligned-batch generate): the
    sequence occupies cache [0, prompt_len), decode continues at prompt_len.
    Pad keys beyond prompt_len are masked by each future step's key mask, and
    within prefill by the causal+pad bias.
    """
    temperature = jnp.asarray(temperature, jnp.float32)
    top_p = jnp.asarray(top_p, jnp.float32)
    first_tok, tmp_cache, rng = prefill_one(
        params, cfg, input_ids, prompt_len, slots.rng, slots.cache.k.dtype,
        temperature, top_k, top_p, greedy, vocab_slice, extra_ids,
        control, clone_slice, clone_extras,
    )
    if limit is None:
        limit = slot_cache_len

    # install prompt K/V into the slot row: (L, 1, t_pad, nkv, hd) → row
    k_row = jax.lax.dynamic_update_slice(
        jnp.zeros((cfg.num_hidden_layers, slot_cache_len, cfg.num_key_value_heads, cfg.head_dim), slots.cache.k.dtype),
        tmp_cache.k[:, 0],
        (0, 0, 0, 0),
    )
    v_row = jax.lax.dynamic_update_slice(
        jnp.zeros_like(k_row),
        tmp_cache.v[:, 0],
        (0, 0, 0, 0),
    )
    new_k = slots.cache.k.at[:, slot].set(k_row)
    new_v = slots.cache.v.at[:, slot].set(v_row)

    return SlotState(
        cache=KVCache(k=new_k, v=new_v),
        cur_token=slots.cur_token.at[slot].set(first_tok),
        write_pos=slots.write_pos.at[slot].set(prompt_len),
        position=slots.position.at[slot].set(prompt_len),
        start=slots.start.at[slot].set(0),
        limit=slots.limit.at[slot].set(jnp.asarray(limit, jnp.int32)),
        active=slots.active.at[slot].set(True),
        done=slots.done.at[slot].set(False),
        control=slots.control.at[slot].set(jnp.asarray(control, bool)),
        temperature=slots.temperature.at[slot].set(temperature),
        top_p=slots.top_p.at[slot].set(top_p),
        rng=rng,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "slot_cache_len", "top_k", "greedy", "vocab_slice", "extra_ids",
        "clone_slice", "clone_extras", "tokenize_fn", "assemble_fn",
    ),
    donate_argnums=(1,),
)
def admit_prefill_fused(
    params,
    slots: SlotState,
    cfg: QwenConfig,
    slot: jax.Array,
    w2v_params,
    bc_params,
    wav: jax.Array,            # (1, pad_len) f32/bf16 normalized prompt wav
    feature_mask: jax.Array,   # (1, F) bool wav2vec2 frame validity
    ref_wav: jax.Array,        # (1, ref_len)
    scaffold: jax.Array,       # (1, t_pad) int32 host-built prompt scaffold
    g_off: jax.Array,          # (1,) global-token offset in the scaffold
    s_off: jax.Array,          # (1,)
    n_sem: jax.Array,          # (1,) semantic ids to include (0 = none)
    prompt_len: jax.Array,     # scalar true prompt length
    slot_cache_len: int,
    temperature: float = 0.8,
    top_k: int = 50,
    top_p: float = 0.95,
    greedy: bool = False,
    vocab_slice: Tuple[int, int] | None = None,
    extra_ids: Tuple[int, ...] = (),
    limit: jax.Array | int | None = None,
    clone_slice: Tuple[int, int] | None = None,
    clone_extras: Tuple[int, ...] = (),
    tokenize_fn=None,          # static: pipeline._tokenize_fn(pad_len, ref_len)
    assemble_fn=None,          # static: pipeline._assemble_fn_batch(t_pad, s_pad)
) -> Tuple[SlotState, jax.Array]:
    """`admit_prefill` with the audio tokenization and the device-side
    prompt assembly INLINED into the same XLA program: wav → wav2vec2 →
    BiCodec tokenize → scaffold scatter → LLM prefill → slot install, one
    dispatch.  On a tunneled TPU each dispatch costs a fixed ~33 ms
    (BENCH_NOTES decode ablation), so fusing the admission chain's three
    dispatches into one takes ~66 ms off first-audio latency.  Clone mode
    only (control prompts have no audio to tokenize).

    Safe kernel composition: the module contains prefill-shaped attention
    (flash kernel) but NO decode-shaped fused kernels — the v5e
    prefill+decode-kernel miscompile class doesn't apply.

    Returns (new slots, global_tokens (1, N), semantic_tokens (1, S_pad)) —
    token arrays still on device, for the vocoder and the voice cache."""
    semantic, global_t = tokenize_fn(w2v_params, bc_params, wav, feature_mask, ref_wav)
    ids = assemble_fn(
        scaffold,
        jnp.asarray(global_t, jnp.int32),
        jnp.asarray(semantic, jnp.int32),
        g_off,
        s_off,
        n_sem,
    )
    new_slots = admit_prefill(
        params, slots, cfg, slot, ids, prompt_len, slot_cache_len,
        temperature, top_k, top_p, greedy, vocab_slice, extra_ids,
        limit=limit, control=False,
        clone_slice=clone_slice, clone_extras=clone_extras,
    )
    return new_slots, global_t, semantic


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "slot_cache_len", "top_k", "greedy", "vocab_slice", "extra_ids",
        "clone_slice", "clone_extras", "assemble_fn",
    ),
    donate_argnums=(1,),
)
def admit_prefill_assembled(
    params,
    slots: SlotState,
    cfg: QwenConfig,
    slot: jax.Array,
    global_t: jax.Array,       # (1, N) int32 cached global tokens (device)
    semantic: jax.Array,       # (1, S_pad) int32 cached semantic tokens
    scaffold: jax.Array,       # (1, t_pad) int32 host-built prompt scaffold
    g_off: jax.Array,          # (1,)
    s_off: jax.Array,          # (1,)
    n_sem: jax.Array,          # (1,) semantic ids to include (0 = none)
    prompt_len: jax.Array,     # scalar true prompt length
    slot_cache_len: int,
    temperature: float = 0.8,
    top_k: int = 50,
    top_p: float = 0.95,
    greedy: bool = False,
    vocab_slice: Tuple[int, int] | None = None,
    extra_ids: Tuple[int, ...] = (),
    limit: jax.Array | int | None = None,
    clone_slice: Tuple[int, int] | None = None,
    clone_extras: Tuple[int, ...] = (),
    assemble_fn=None,          # static: pipeline._assemble_fn_batch(t_pad, s_pad)
) -> SlotState:
    """`admit_prefill_fused` for a VOICE-CACHE hit: the codec tokens are
    already on device, so the admission is prompt assembly + prefill in ONE
    dispatch and the whole audio-tokenize stack (wav2vec2 forward + BiCodec
    encode + speaker path) is skipped.  Clone mode only (the cache stores
    clone-prompt voices)."""
    ids = assemble_fn(
        scaffold,
        jnp.asarray(global_t, jnp.int32),
        jnp.asarray(semantic, jnp.int32),
        g_off,
        s_off,
        n_sem,
    )
    return admit_prefill(
        params, slots, cfg, slot, ids, prompt_len, slot_cache_len,
        temperature, top_k, top_p, greedy, vocab_slice, extra_ids,
        limit=limit, control=False,
        clone_slice=clone_slice, clone_extras=clone_extras,
    )


def pack_step_result(toks: jax.Array, valid: jax.Array, done: jax.Array) -> jax.Array:
    """Pack (tokens (B,n), valid (B,n), done (B,)) into ONE int32 array
    (B, 2n+1) so the host fetches the whole step result in a single transfer
    — on a tunneled TPU each transfer costs a full relay round-trip."""
    return jnp.concatenate(
        [toks, valid.astype(jnp.int32), done[:, None].astype(jnp.int32)], axis=1
    )


def unpack_step_result(packed: np.ndarray, n_steps: int):
    """Host-side inverse of `pack_step_result`."""
    toks = packed[:, :n_steps]
    valid = packed[:, n_steps : 2 * n_steps].astype(bool)
    done = packed[:, 2 * n_steps].astype(bool)
    return toks, valid, done


def chain_step_result(packed, chain_fn):
    """Attach an optional chained device computation to a decode dispatch's
    packed result, flattened into ONE device array, and start its async
    host copy.  MUST run at DISPATCH time (step_begin), before any further
    device work is enqueued: the chain's programs and the host-transfer
    request then sit directly behind the decode program in the device
    queue, so a pipelined next dispatch (dispatch_depth > 1) can never
    delay a speculative first chunk or the fetch that carries it."""
    # a chain_fn returns the ENTIRE flat transfer (packed tokens + audio
    # bits) from one jitted program — no eager concat here, because every
    # first-seen eager-op program costs a multi-second compile via the relay
    flat = packed.reshape(-1) if chain_fn is None else chain_fn(packed)
    try:
        flat.copy_to_host_async()
    except Exception:  # pragma: no cover - platform without async copy
        pass
    return flat


def fetch_step_result(flat, chained: bool, max_slots: int, n_steps: int):
    """Blocking fetch of a `chain_step_result` array (the transfer was
    already started at dispatch time).  Shared by the dense and paged
    engines so the packed layout / chained-fetch protocol lives in exactly
    one place.  Returns (toks, valid, done, chained_or_None)."""
    flat = jax.device_get(flat)
    cut = max_slots * (2 * n_steps + 1)
    toks, valid, done = unpack_step_result(
        flat[:cut].reshape(max_slots, -1), n_steps
    )
    return toks, valid, done, (flat[cut:] if chained else None)


class StepProtocolMixin:
    """The engine-independent half of the three-phase step protocol, shared
    by the dense and paged engines (the handle layout, the single-transfer
    fetch, and the convenience wrappers live in exactly ONE place — the
    engines supply only `step_begin` and `step_commit`).

    Contract: `step_begin(n_steps, chain_fn)` enqueues one decode dispatch
    and returns an opaque handle `(packed, chain_fn, n_steps, owner_snapshot)`
    or None when no slot is live; `step_fetch(handle)` is the only blocking
    phase (one host transfer, touches no engine state — safe on a worker
    thread); `step_commit(handle, fetched)` does the host bookkeeping against
    the begin-time slot snapshot on the engine's owning thread."""

    def step(self, n_steps: int = 16) -> Dict[int, np.ndarray]:
        """Advance all active slots by (about) n_steps tokens — snapped to
        the DISPATCH_LADDER; slots stop on device at their budget limit.
        Returns {req_id: np.ndarray(new tokens)} for requests that produced
        tokens this call; finished requests move to `self.finished`."""
        return self.step_chained(n_steps, None)[0]

    def step_chained(self, n_steps: int = 16, chain_fn=None) -> Tuple[Dict[int, np.ndarray], Optional[np.ndarray]]:
        """`step`, optionally with a caller-supplied device computation
        CHAINED onto the decode dispatch before the single host fetch.

        `chain_fn(packed_device) -> int32 (L,)` runs extra device work on the
        step result (e.g. speculatively vocode a slot's streaming chunk —
        `pipeline.spec_vocode_chain`); its output is concatenated with the
        packed step result on device and the host fetches BOTH in one
        transfer.  Returns (increments, chain_output_or_None).  On a
        tunneled TPU this is the difference between one and three relay
        round-trips per streaming chunk.

        Convenience wrapper over the three-phase protocol; the serving loop
        uses the phases directly so admissions overlap the blocking fetch."""
        handle = self.step_begin(n_steps, chain_fn)
        if handle is None:
            return {}, None
        return self.step_commit(handle, self.step_fetch(handle))

    def step_fetch(self, handle):
        """Blocking host fetch of a dispatched step's result — the ONLY
        phase safe to run on a worker thread (no engine state access).
        The transfer was started at dispatch time (chain_step_result), so
        this just waits for data already in flight."""
        flat, chain_fn, n_steps, _ = handle
        return fetch_step_result(flat, chain_fn is not None, self.max_slots, n_steps)

    def step_commit(self, handle, fetched) -> Tuple[Dict[int, np.ndarray], Optional[np.ndarray]]:
        """Host bookkeeping for a fetched step, against the slot→request
        snapshot taken at step_begin (slots admitted meanwhile are invisible
        to the in-flight program and must stay untouched here).  Engine
        specifics go through the `_commit_slot_tokens`/`_commit_slot_done`
        hooks so the commit semantics cannot drift between engines."""
        _, _, _, owner_snapshot = handle
        toks, valid, done, extra = fetched
        out: Dict[int, np.ndarray] = {}
        for slot, req in enumerate(owner_snapshot):
            if req is None:
                continue
            if req not in self.buffers:
                # the request already left the engine under an EARLIER commit
                # (pipelined dispatch: a slot that finished in dispatch N
                # still appears done in dispatch N+1's snapshot) or a forced
                # release — nothing further to account for this slot
                continue
            new = toks[slot][valid[slot]]
            if new.size:
                self.buffers[req].extend(new.tolist())
                out[req] = new
            n_valid = int(valid[slot].sum())
            self.budget[slot] -= n_valid
            self._commit_slot_tokens(slot, n_valid)
            if done[slot]:
                self.finished[req] = np.asarray(self.buffers.pop(req), np.int32)
                self.owner[slot] = None
                self._commit_slot_done(slot)
        return out, extra

    def _commit_slot_tokens(self, slot: int, n_valid: int) -> None:
        """Engine hook: per-slot accounting beyond the shared budget
        decrement (the paged engine tracks tokens_seen for page growth)."""

    def _commit_slot_done(self, slot: int) -> None:
        """Engine hook: release device/memory state for a finished slot."""
        raise NotImplementedError


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "n_steps", "top_k", "eos_ids", "pad_id", "greedy",
        "vocab_slice", "extra_ids", "clone_slice", "clone_extras",
    ),
    donate_argnums=(1,),
)
def decode_steps(
    params,
    slots: SlotState,
    cfg: QwenConfig,
    n_steps: int,
    top_k: int = 50,
    eos_ids: Tuple[int, ...] = (),
    pad_id: int = 0,
    greedy: bool = False,
    vocab_slice: Tuple[int, int] | None = None,
    extra_ids: Tuple[int, ...] = (),
    clone_slice: Tuple[int, int] | None = None,
    clone_extras: Tuple[int, ...] = (),
) -> Tuple[SlotState, jax.Array]:
    """Advance every active slot by up to n_steps tokens; returns (slots,
    packed (B, 2*n_steps+1) int32 — see pack_step_result).  The emission-
    validity half of the pack is the explicit liveness mask: pad_id may be a
    legitimately sampled id, so callers must not infer liveness from token
    values.

    Budget enforcement is ON DEVICE: a slot whose write_pos reaches its
    `limit` stops advancing mid-scan, so a dispatch larger than the tightest
    remaining budget is safe — n_steps can always come from the fixed
    DISPATCH_LADDER and never forces a fresh compile.

    The key-validity window is an index compare fused into attention
    (qwen_forward decode_window) — no (B, 1, S) fp32 bias per step.
    vocab_slice/extra_ids optionally constrain sampling to the TTS-legal
    token range; clone_slice/clone_extras further narrow it per-slot for
    non-control sequences (guided decoding, see lm/generate.py)."""
    from sparktts_tpu.lm.generate import _expand_constrained

    def body(s: SlotState, _):
        live = s.active & ~s.done
        emitted = s.cur_token

        logits, cache = qwen_forward(
            params,
            cfg,
            s.cur_token[:, None],
            s.position[:, None],
            s.cache,
            s.write_pos,  # (B,) vector → per-slot scatter
            None,
            decode_window=(s.start, s.write_pos),
            vocab_slice=vocab_slice,
            extra_ids=extra_ids,
        )
        last = _mode_masked(
            logits[:, -1], s.control, vocab_slice, extra_ids, clone_slice, clone_extras
        )
        rng, sub = jax.random.split(s.rng)
        if greedy:
            nxt = greedy_token(last)
        else:
            # per-slot sampling params: requests in the shared batch keep the
            # temperature / top_p they asked for
            nxt = sample_token(sub, last, s.temperature[:, None], top_k, s.top_p[:, None])
        nxt = _expand_constrained(nxt, vocab_slice, extra_ids)

        is_eos = jnp.zeros_like(s.done)
        for e in eos_ids:
            is_eos = is_eos | (s.cur_token == e)
        new_write = jnp.where(live, s.write_pos + 1, s.write_pos)
        done = s.done | (is_eos & s.active) | (s.active & (new_write >= s.limit))
        nxt = jnp.where(live & ~done, nxt, pad_id)

        new_s = SlotState(
            cache=cache,
            cur_token=nxt,
            write_pos=new_write,
            position=jnp.where(live, s.position + 1, s.position),
            start=s.start,
            limit=s.limit,
            active=s.active,
            done=done,
            control=s.control,
            temperature=s.temperature,
            top_p=s.top_p,
            rng=rng,
        )
        return new_s, (emitted, live)

    slots, (toks, valid) = jax.lax.scan(body, slots, None, length=n_steps)
    return slots, pack_step_result(toks.T, valid.T, slots.done)


class ContinuousBatchingEngine(StepProtocolMixin):
    """Host-side slot manager around the jitted admit/decode programs."""

    def __init__(
        self,
        params,
        cfg: QwenConfig,
        max_slots: int = 8,
        cache_len: int = 1024,
        prompt_pad: int = 64,
        eos_ids: Tuple[int, ...] = (),
        pad_id: int = 0,
        temperature: float = 0.8,
        top_k: int = 50,
        top_p: float = 0.95,
        greedy: bool = False,
        seed: int = 0,
        cache_dtype=jnp.bfloat16,
        vocab_slice: Tuple[int, int] | None = None,
        extra_ids: Tuple[int, ...] = (),
        clone_slice: Tuple[int, int] | None = None,
        clone_extras: Tuple[int, ...] = (),
        max_dispatch: int = DISPATCH_LADDER[-1],
        mesh=None,
    ):
        self.params = params
        self.cfg = cfg
        self.max_slots = max_slots
        self.cache_len = cache_len
        self.prompt_pad = prompt_pad
        self.eos_ids = tuple(eos_ids)
        self.pad_id = pad_id
        self.sampling = (temperature, top_k, top_p)
        self.greedy = greedy
        self.vocab_slice = vocab_slice
        self.extra_ids = tuple(extra_ids)
        self.clone_slice = clone_slice
        self.clone_extras = tuple(clone_extras)
        self.max_dispatch = max_dispatch
        self.mesh = mesh
        self._replicated = None
        if mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            self._replicated = NamedSharding(mesh, P())
        self.slots = init_slots(
            cfg, max_slots, cache_len, jax.random.PRNGKey(seed), cache_dtype,
            mesh=mesh,
        )
        self.owner: List[Optional[int]] = [None] * max_slots  # request ids
        self.budget = np.zeros(max_slots, np.int64)  # remaining tokens per slot
        self.buffers: Dict[int, List[int]] = {}
        self.finished: Dict[int, np.ndarray] = {}
        self._next_req = 0
        # AOT-compiled fused-admission executables keyed by shape signature
        # (fused_key).  Compiled off-loop via warm_fused so a first-seen
        # (wav bucket × prompt bucket) combination never stalls serving;
        # backed by the process-global _FUSED_EXE_CACHE for cross-engine
        # reuse (fresh bench servers adopt compiled programs).
        self._fused_exe: Dict[tuple, object] = {}
        self._fused_lock = threading.Lock()
        self._fused_aval_key = None  # computed lazily from params/slots avals

    # ------------------------------------------------------------------

    def free_slots(self) -> int:
        return sum(1 for o in self.owner if o is None)

    # -- shared admission bookkeeping (submit / submit_fused) --------------

    def _take_slot(self, t_pad: int, max_new_tokens: int) -> int:
        """Pick a free slot and validate capacity; raises if none free."""
        slot = next((i for i, o in enumerate(self.owner) if o is None), None)
        if slot is None:
            raise RuntimeError("no free slot")
        assert t_pad % self.prompt_pad == 0, (t_pad, self.prompt_pad)
        assert t_pad + max_new_tokens <= self.cache_len, "prompt+budget exceeds cache"
        return slot

    def _resolve_sampling(self, temperature, top_p):
        eng_temperature, top_k, eng_top_p = self.sampling
        return (
            eng_temperature if temperature is None else temperature,
            top_k,
            eng_top_p if top_p is None else top_p,
        )

    def _register_request(self, slot: int, max_new_tokens: int) -> int:
        req_id = self._next_req
        self._next_req += 1
        self.owner[slot] = req_id
        self.budget[slot] = max_new_tokens
        self.buffers[req_id] = []
        return req_id

    def submit(
        self,
        prompt_ids,
        max_new_tokens: int = 512,
        mode: str = "control",
        temperature: float | None = None,
        top_p: float | None = None,
        prompt_len: int | None = None,
    ) -> int:
        """Admit a request; returns its id.  Raises if no slot is free.
        `mode` selects the per-slot guided constraint: "clone" narrows
        sampling to clone_slice/clone_extras (when configured), "control"
        uses the engine-wide superset constraint.  temperature/top_p are
        honored PER SLOT (top_k is static and engine-wide).

        `prompt_ids` may be a host id list OR an already-assembled DEVICE
        array (1, t_pad) right-padded to a prompt_pad multiple, with
        `prompt_len` giving the true length — the device-chained admission
        path (`pipeline.assemble_clone_ids`) submits without any host sync."""
        if isinstance(prompt_ids, jax.Array):
            assert prompt_ids.ndim == 2 and prompt_len is not None
            n = int(prompt_len)
            t_pad = prompt_ids.shape[1]
            assert n <= t_pad, (t_pad, n)
            ids = prompt_ids
        else:
            n = len(prompt_ids)
            t_pad = ((n + self.prompt_pad - 1) // self.prompt_pad) * self.prompt_pad
            ids = np.full((1, t_pad), self.pad_id, np.int32)
            ids[0, :n] = prompt_ids  # right-padded
        slot = self._take_slot(t_pad, max_new_tokens)
        temperature, top_k, top_p = self._resolve_sampling(temperature, top_p)
        self.slots = admit_prefill(
            self.params,
            self.slots,
            self.cfg,
            jnp.asarray(slot, jnp.int32),
            jnp.asarray(ids),
            jnp.asarray(n, jnp.int32),
            self.cache_len,
            temperature,
            top_k,
            top_p,
            self.greedy,
            self.vocab_slice,
            self.extra_ids,
            limit=jnp.asarray(n + max_new_tokens, jnp.int32),
            control=jnp.asarray(mode == "control", bool),
            clone_slice=self.clone_slice,
            clone_extras=self.clone_extras,
        )
        return self._register_request(slot, max_new_tokens)

    # -- fused admission (AOT-compiled, per shape signature) ---------------

    def fused_key(self, tok_args: tuple, t_pad: int) -> tuple:
        """Shape signature of a fused-admission program: the wav pad bucket,
        wav2vec2 frame count, ref-clip length and prompt pad bucket fully
        determine the compiled executable (tokenize_fn/assemble_fn are
        derived from the same shapes)."""
        _, _, wav, feature_mask, ref_wav = tok_args
        return (wav.shape, feature_mask.shape, ref_wav.shape, t_pad)

    def _fused_global_key(self, key: tuple, tokenize_fn, assemble_fn) -> tuple:
        """Extend the per-engine shape key with everything else that shapes
        the compiled program, so executables are shared ACROSS engine
        instances (each timed bench run builds a fresh server; without
        process-wide reuse every run would recompile inside its timed
        region).  Param/slot avals are summarized by (shape, dtype) leaves —
        engines built from the same pipeline share them, and the pipeline's
        per-shape tokenize/assemble fn identities are stable."""
        if self._fused_aval_key is None:
            self._fused_aval_key = tuple(
                (tuple(x.shape), str(x.dtype), str(getattr(x, "sharding", None)))
                for x in jax.tree.leaves((self.params, self.slots))
            )
        return (
            key,
            tokenize_fn,
            assemble_fn,
            self.cfg,
            self.cache_len,
            self.sampling[1],
            self.greedy,
            self.vocab_slice,
            self.extra_ids,
            self.clone_slice,
            self.clone_extras,
            self._fused_aval_key,
        )

    def fused_ready(self, tok_args: tuple, t_pad: int) -> bool:
        return self.fused_key(tok_args, t_pad) in self._fused_exe

    def _harr(self, v, dtype=None):
        """Host value → fixed-dtype jnp array, committed to the serving mesh
        when one is set (AOT lowering refuses mixed single-device/mesh args;
        mesh-replicated scalars keep the fused programs lowerable)."""
        a = jnp.asarray(v, dtype)
        if self._replicated is not None:
            a = jax.device_put(a, self._replicated)
        return a

    def _fused_traced(
        self, slot, tok_args, scaffold_row, g_off, s_off, n_sem, prompt_len,
        temperature, top_p, limit,
    ):
        """(args, kwargs) for `admit_prefill_fused` with every scalar
        normalized to a fixed-dtype jnp array, so the AOT executable's input
        signature is identical across calls (and across lower vs call)."""
        w2v_params, bc_params, wav, feature_mask, ref_wav = tok_args
        args = (
            self.params, self.slots, self._harr(slot, jnp.int32),
            w2v_params, bc_params, self._harr(wav), self._harr(feature_mask),
            self._harr(ref_wav),
            self._harr(scaffold_row),
            self._harr([g_off], jnp.int32), self._harr([s_off], jnp.int32),
            self._harr([n_sem], jnp.int32), self._harr(prompt_len, jnp.int32),
        )
        kwargs = dict(
            temperature=self._harr(temperature, jnp.float32),
            top_p=self._harr(top_p, jnp.float32),
            limit=self._harr(limit, jnp.int32),
        )
        return args, kwargs

    def warm_fused(self, tokenize_fn, assemble_fn, tok_args: tuple, t_pad: int) -> None:
        """Compile (AOT) the fused-admission executable for this shape
        signature without executing it.  Thread-safe and idempotent — the
        server calls this from a background thread so a first-seen shape
        never stalls the serving loop on an XLA compile; `submit_fused`
        calls it inline when asked to run a not-yet-warm signature.

        Consults the PROCESS-GLOBAL executable cache first: a fresh engine
        over the same pipeline (bench runs build one server per timed run)
        adopts already-compiled executables instead of recompiling."""
        key = self.fused_key(tok_args, t_pad)
        with self._fused_lock:
            if key in self._fused_exe:
                return
        gkey = self._fused_global_key(key, tokenize_fn, assemble_fn)
        with _FUSED_CACHE_LOCK:
            cached = _FUSED_EXE_CACHE.get(gkey)
        if cached is not None:
            with self._fused_lock:
                self._fused_exe.setdefault(key, cached)
            return

        def sds(x):
            if isinstance(x, jax.Array):
                return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
            x = jnp.asarray(x)
            return jax.ShapeDtypeStruct(x.shape, x.dtype)

        scaffold_row = jnp.zeros((1, t_pad), jnp.int32)
        temperature, top_k, top_p = self._resolve_sampling(None, None)
        args, kwargs = self._fused_traced(
            0, tok_args, scaffold_row, 0, 0, 0, 0, temperature, top_p, 0
        )
        args_sds = jax.tree.map(sds, args)
        kwargs_sds = jax.tree.map(sds, kwargs)
        lowered = admit_prefill_fused.lower(
            args_sds[0], args_sds[1], self.cfg, *args_sds[2:],
            slot_cache_len=self.cache_len,
            top_k=top_k,
            greedy=self.greedy,
            vocab_slice=self.vocab_slice,
            extra_ids=self.extra_ids,
            clone_slice=self.clone_slice,
            clone_extras=self.clone_extras,
            tokenize_fn=tokenize_fn,
            assemble_fn=assemble_fn,
            **kwargs_sds,
        )
        exe = lowered.compile()
        with self._fused_lock:
            self._fused_exe.setdefault(key, exe)
        with _FUSED_CACHE_LOCK:
            _FUSED_EXE_CACHE.setdefault(gkey, exe)

    def submit_fused(
        self,
        tokenize_fn,
        assemble_fn,
        tok_args: tuple,         # pipeline.tokenize_host_prep device args
        scaffold: np.ndarray,    # (t_pad,) int32, t_pad % prompt_pad == 0
        g_off: int,
        s_off: int,
        n_sem: int,
        prompt_len: int,
        max_new_tokens: int = 512,
        temperature: float | None = None,
        top_p: float | None = None,
    ) -> Tuple[int, jax.Array]:
        """Clone-mode admission as ONE device dispatch: audio tokenize +
        prompt assembly + prefill fused (`admit_prefill_fused`) — the
        zero-sync admission chain collapsed from three programs to one.
        Runs the AOT executable for this shape signature, compiling it first
        if `warm_fused` hasn't (the server only routes here when warm, so
        the inline compile is the direct-use path, not the serving path).
        Returns (req_id, global_tokens (1, N), semantic_tokens (1, S_pad)) —
        token arrays still on device (vocoder / voice cache)."""
        t_pad = len(scaffold)
        assert prompt_len <= t_pad
        slot = self._take_slot(t_pad, max_new_tokens)
        temperature, _, top_p = self._resolve_sampling(temperature, top_p)
        key = self.fused_key(tok_args, t_pad)
        if key not in self._fused_exe:
            self.warm_fused(tokenize_fn, assemble_fn, tok_args, t_pad)
        args, kwargs = self._fused_traced(
            slot,
            tok_args,
            jnp.asarray(np.asarray(scaffold, np.int32)[None, :]),
            g_off,
            s_off,
            n_sem,
            prompt_len,
            temperature,
            top_p,
            prompt_len + max_new_tokens,
        )
        self.slots, global_t, semantic = self._fused_exe[key](*args, **kwargs)
        return self._register_request(slot, max_new_tokens), global_t, semantic

    # -- assembled admission (voice-cache hit: tokens already on device) ---

    def assembled_key(self, global_t, semantic, t_pad: int) -> tuple:
        """Shape signature of an assembled-admission program (voice-cache
        hit).  Namespaced so it shares the fused executable dict/locks."""
        return ("asm", tuple(global_t.shape), tuple(semantic.shape), t_pad)

    def assembled_ready(self, global_t, semantic, t_pad: int) -> bool:
        return self.assembled_key(global_t, semantic, t_pad) in self._fused_exe

    def _assembled_traced(
        self, slot, global_t, semantic, scaffold_row, g_off, s_off, n_sem,
        prompt_len, temperature, top_p, limit,
    ):
        args = (
            self.params, self.slots, self._harr(slot, jnp.int32),
            self._harr(global_t, jnp.int32), self._harr(semantic, jnp.int32),
            self._harr(scaffold_row),
            self._harr([g_off], jnp.int32), self._harr([s_off], jnp.int32),
            self._harr([n_sem], jnp.int32), self._harr(prompt_len, jnp.int32),
        )
        kwargs = dict(
            temperature=self._harr(temperature, jnp.float32),
            top_p=self._harr(top_p, jnp.float32),
            limit=self._harr(limit, jnp.int32),
        )
        return args, kwargs

    def warm_assembled(self, assemble_fn, global_t, semantic, t_pad: int) -> None:
        """AOT-compile the assembled-admission executable for this shape
        signature (same thread-safety/idempotence/process-global-cache
        policy as `warm_fused`)."""
        key = self.assembled_key(global_t, semantic, t_pad)
        with self._fused_lock:
            if key in self._fused_exe:
                return
        gkey = self._fused_global_key(key, None, assemble_fn)
        with _FUSED_CACHE_LOCK:
            cached = _FUSED_EXE_CACHE.get(gkey)
        if cached is not None:
            with self._fused_lock:
                self._fused_exe.setdefault(key, cached)
            return

        def sds(x):
            if isinstance(x, jax.Array):
                return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
            x = jnp.asarray(x)
            return jax.ShapeDtypeStruct(x.shape, x.dtype)

        scaffold_row = jnp.zeros((1, t_pad), jnp.int32)
        temperature, top_k, top_p = self._resolve_sampling(None, None)
        args, kwargs = self._assembled_traced(
            0, global_t, semantic, scaffold_row, 0, 0, 0, 0, temperature, top_p, 0
        )
        args_sds = jax.tree.map(sds, args)
        kwargs_sds = jax.tree.map(sds, kwargs)
        lowered = admit_prefill_assembled.lower(
            args_sds[0], args_sds[1], self.cfg, *args_sds[2:],
            slot_cache_len=self.cache_len,
            top_k=top_k,
            greedy=self.greedy,
            vocab_slice=self.vocab_slice,
            extra_ids=self.extra_ids,
            clone_slice=self.clone_slice,
            clone_extras=self.clone_extras,
            assemble_fn=assemble_fn,
            **kwargs_sds,
        )
        exe = lowered.compile()
        with self._fused_lock:
            self._fused_exe.setdefault(key, exe)
        with _FUSED_CACHE_LOCK:
            _FUSED_EXE_CACHE.setdefault(gkey, exe)

    def submit_assembled(
        self,
        assemble_fn,
        global_t,               # (1, N) int32 device — cached voice tokens
        semantic,               # (1, S_pad) int32 device
        scaffold: np.ndarray,   # (t_pad,) int32, t_pad % prompt_pad == 0
        g_off: int,
        s_off: int,
        n_sem: int,
        prompt_len: int,
        max_new_tokens: int = 512,
        temperature: float | None = None,
        top_p: float | None = None,
    ) -> int:
        """Clone-mode admission from CACHED voice tokens as ONE device
        dispatch (prompt assembly + prefill; no audio tokenization).
        Returns the request id."""
        t_pad = len(scaffold)
        assert prompt_len <= t_pad
        slot = self._take_slot(t_pad, max_new_tokens)
        temperature, _, top_p = self._resolve_sampling(temperature, top_p)
        key = self.assembled_key(global_t, semantic, t_pad)
        if key not in self._fused_exe:
            self.warm_assembled(assemble_fn, global_t, semantic, t_pad)
        args, kwargs = self._assembled_traced(
            slot,
            global_t,
            semantic,
            jnp.asarray(np.asarray(scaffold, np.int32)[None, :]),
            g_off,
            s_off,
            n_sem,
            prompt_len,
            temperature,
            top_p,
            prompt_len + max_new_tokens,
        )
        self.slots = self._fused_exe[key](*args, **kwargs)
        return self._register_request(slot, max_new_tokens)

    # -- batched assembled admission (burst of same-signature cache hits) --

    def assembled_batch_key(self, b: int, n_glob: int, s_pad: int, t_pad: int) -> tuple:
        return ("asmb", b, n_glob, s_pad, t_pad)

    def assembled_batch_ready(self, b: int, n_glob: int, s_pad: int, t_pad: int) -> bool:
        return self.assembled_batch_key(b, n_glob, s_pad, t_pad) in self._fused_exe

    def _assembled_batch_traced(self, assemble_fn, rows, b: int):
        """Normalized (args, kwargs) for admit_prefill_assembled_batch over
        `rows` (list of per-request dicts), padded to batch `b` by
        duplicating row 0 (same slot id + identical data: duplicate scatter
        writes carry the same values, so padding is behavior-free)."""
        pad = b - len(rows)
        rows = list(rows) + [rows[0]] * pad
        g = jnp.concatenate(
            [jnp.reshape(jnp.asarray(r["global_t"], jnp.int32), (1, -1)) for r in rows],
            axis=0,
        )
        s = jnp.concatenate(
            [jnp.reshape(jnp.asarray(r["semantic"], jnp.int32), (1, -1)) for r in rows],
            axis=0,
        )
        scaffolds = np.stack([np.asarray(r["scaffold"], np.int32) for r in rows])
        args = (
            self.params, self.slots,
            self._harr([r["slot"] for r in rows], jnp.int32),
            self._harr(g, jnp.int32), self._harr(s, jnp.int32),
            self._harr(scaffolds),
            self._harr([r["g_off"] for r in rows], jnp.int32),
            self._harr([r["s_off"] for r in rows], jnp.int32),
            self._harr([r["n_sem"] for r in rows], jnp.int32),
            self._harr([r["prompt_len"] for r in rows], jnp.int32),
        )
        kwargs = dict(
            temperature=self._harr([r["temperature"] for r in rows], jnp.float32),
            top_p=self._harr([r["top_p"] for r in rows], jnp.float32),
            limits=self._harr(
                [r["prompt_len"] + r["max_new_tokens"] for r in rows], jnp.int32
            ),
        )
        return args, kwargs

    def warm_assembled_batch(
        self, assemble_fn, b: int, n_glob: int, s_pad: int, t_pad: int
    ) -> None:
        """AOT-compile the batched assembled-admission executable for this
        (batch, shape) signature (same policy as warm_assembled)."""
        key = self.assembled_batch_key(b, n_glob, s_pad, t_pad)
        with self._fused_lock:
            if key in self._fused_exe:
                return
        gkey = self._fused_global_key(key, None, assemble_fn)
        with _FUSED_CACHE_LOCK:
            cached = _FUSED_EXE_CACHE.get(gkey)
        if cached is not None:
            with self._fused_lock:
                self._fused_exe.setdefault(key, cached)
            return

        def sds(x):
            if isinstance(x, jax.Array):
                return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
            x = jnp.asarray(x)
            return jax.ShapeDtypeStruct(x.shape, x.dtype)

        temperature, top_k, top_p = self._resolve_sampling(None, None)
        row = dict(
            slot=0,
            global_t=jnp.zeros((1, n_glob), jnp.int32),
            semantic=jnp.zeros((1, s_pad), jnp.int32),
            scaffold=np.zeros(t_pad, np.int32),
            g_off=0, s_off=0, n_sem=0, prompt_len=1,
            max_new_tokens=1, temperature=temperature, top_p=top_p,
        )
        args, kwargs = self._assembled_batch_traced(assemble_fn, [row], b)
        args_sds = jax.tree.map(sds, args)
        kwargs_sds = jax.tree.map(sds, kwargs)
        lowered = admit_prefill_assembled_batch.lower(
            args_sds[0], args_sds[1], self.cfg, *args_sds[2:],
            slot_cache_len=self.cache_len,
            top_k=top_k,
            greedy=self.greedy,
            vocab_slice=self.vocab_slice,
            extra_ids=self.extra_ids,
            clone_slice=self.clone_slice,
            clone_extras=self.clone_extras,
            assemble_fn=assemble_fn,
            **kwargs_sds,
        )
        exe = lowered.compile()
        with self._fused_lock:
            self._fused_exe.setdefault(key, exe)
        with _FUSED_CACHE_LOCK:
            _FUSED_EXE_CACHE.setdefault(gkey, exe)

    def submit_assembled_batch(self, assemble_fn, requests) -> list:
        """Admit a BURST of voice-cache-hit clone requests as ONE device
        program.  `requests` is a list of dicts with keys global_t, semantic
        (device token arrays), scaffold, g_off, s_off, n_sem, prompt_len,
        max_new_tokens, temperature, top_p (None -> engine defaults).  The
        batch pads up to ADMIT_BATCH_LADDER by duplicating row 0.  Returns
        the request ids in order.  Caller guarantees the (n_glob, s_pad,
        t_pad, padded-b) signature is warm (assembled_batch_ready)."""
        n = len(requests)
        assert n >= 1
        b = next((x for x in ADMIT_BATCH_LADDER if x >= n), ADMIT_BATCH_LADDER[-1])
        assert n <= b, (n, b)  # b may exceed max_slots: pad rows reuse slot 0
        assert len({
            (r["global_t"].shape[-1], r["semantic"].shape[-1], len(r["scaffold"]))
            for r in requests
        }) == 1, "batched admission requires one shape signature"
        rows = []
        for r in requests:
            r = dict(r)
            t, _, p = self._resolve_sampling(r.get("temperature"), r.get("top_p"))
            r["temperature"], r["top_p"] = t, p
            r["slot"] = self._take_slot(len(r["scaffold"]), r["max_new_tokens"])
            # reserve before picking the next row's slot
            self.owner[r["slot"]] = -1  # placeholder; replaced below
            rows.append(r)
        key = self.assembled_batch_key(
            b, rows[0]["global_t"].shape[-1], rows[0]["semantic"].shape[-1],
            len(rows[0]["scaffold"]),
        )
        if key not in self._fused_exe:
            self.warm_assembled_batch(
                assemble_fn, b, rows[0]["global_t"].shape[-1],
                rows[0]["semantic"].shape[-1], len(rows[0]["scaffold"]),
            )
        args, kwargs = self._assembled_batch_traced(assemble_fn, rows, b)
        self.slots = self._fused_exe[key](*args, **kwargs)
        req_ids = []
        for r in rows:
            self.owner[r["slot"]] = None  # let _register_request re-own it
            req_ids.append(self._register_request(r["slot"], r["max_new_tokens"]))
        return req_ids

    # -- batched fused admission (burst of first-time same-shape voices) ---

    def fused_batch_key(self, b: int, tok_args: tuple, t_pad: int) -> tuple:
        _, _, wav, feature_mask, ref_wav = tok_args
        return ("fusb", b, wav.shape[-1], feature_mask.shape[-1], ref_wav.shape[-1], t_pad)

    def fused_batch_ready(self, b: int, tok_args: tuple, t_pad: int) -> bool:
        return self.fused_batch_key(b, tok_args, t_pad) in self._fused_exe

    def _fused_batch_traced(self, rows, b: int):
        pad = b - len(rows)
        rows = list(rows) + [rows[0]] * pad
        w2v, bc = rows[0]["tok_args"][0], rows[0]["tok_args"][1]
        cat = lambda i: jnp.concatenate(  # noqa: E731
            [jnp.asarray(r["tok_args"][i]) for r in rows], axis=0
        )
        scaffolds = np.stack([np.asarray(r["scaffold"], np.int32) for r in rows])
        args = (
            self.params, self.slots,
            self._harr([r["slot"] for r in rows], jnp.int32),
            w2v, bc,
            self._harr(cat(2)), self._harr(cat(3)), self._harr(cat(4)),
            self._harr(scaffolds),
            self._harr([r["g_off"] for r in rows], jnp.int32),
            self._harr([r["s_off"] for r in rows], jnp.int32),
            self._harr([r["n_sem"] for r in rows], jnp.int32),
            self._harr([r["prompt_len"] for r in rows], jnp.int32),
        )
        kwargs = dict(
            temperature=self._harr([r["temperature"] for r in rows], jnp.float32),
            top_p=self._harr([r["top_p"] for r in rows], jnp.float32),
            limits=self._harr(
                [r["prompt_len"] + r["max_new_tokens"] for r in rows], jnp.int32
            ),
        )
        return args, kwargs

    def warm_fused_batch(
        self, tokenize_fn, assemble_fn, b: int, tok_args: tuple, t_pad: int
    ) -> None:
        """AOT-compile the batched fused-admission executable for this
        (batch, wav/ref/prompt shape) signature (same policy/caches as
        warm_fused)."""
        key = self.fused_batch_key(b, tok_args, t_pad)
        with self._fused_lock:
            if key in self._fused_exe:
                return
        gkey = self._fused_global_key(key, tokenize_fn, assemble_fn)
        with _FUSED_CACHE_LOCK:
            cached = _FUSED_EXE_CACHE.get(gkey)
        if cached is not None:
            with self._fused_lock:
                self._fused_exe.setdefault(key, cached)
            return

        def sds(x):
            if isinstance(x, jax.Array):
                return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
            x = jnp.asarray(x)
            return jax.ShapeDtypeStruct(x.shape, x.dtype)

        temperature, top_k, top_p = self._resolve_sampling(None, None)
        row = dict(
            slot=0, tok_args=tok_args, scaffold=np.zeros(t_pad, np.int32),
            g_off=0, s_off=0, n_sem=0, prompt_len=1, max_new_tokens=1,
            temperature=temperature, top_p=top_p,
        )
        args, kwargs = self._fused_batch_traced([row], b)
        args_sds = jax.tree.map(sds, args)
        kwargs_sds = jax.tree.map(sds, kwargs)
        lowered = admit_prefill_fused_batch.lower(
            args_sds[0], args_sds[1], self.cfg, *args_sds[2:],
            slot_cache_len=self.cache_len,
            top_k=top_k,
            greedy=self.greedy,
            vocab_slice=self.vocab_slice,
            extra_ids=self.extra_ids,
            clone_slice=self.clone_slice,
            clone_extras=self.clone_extras,
            tokenize_fn=tokenize_fn,
            assemble_fn=assemble_fn,
            **kwargs_sds,
        )
        exe = lowered.compile()
        with self._fused_lock:
            self._fused_exe.setdefault(key, exe)
        with _FUSED_CACHE_LOCK:
            _FUSED_EXE_CACHE.setdefault(gkey, exe)

    def submit_fused_batch(self, tokenize_fn, assemble_fn, requests):
        """Admit a BURST of first-time clone requests (no cache entry yet)
        as ONE device program: batch audio tokenize + assembly + (B, t_pad)
        prefill.  `requests` rows carry tok_args (the per-request
        tokenize_host_prep device args), scaffold, g_off, s_off, n_sem,
        prompt_len, max_new_tokens, temperature, top_p.  Returns
        (req_ids, global (B, N), semantic (B, S_pad)) with the token arrays
        on device (slice row i for the voice cache).  Caller guarantees the
        signature is warm (fused_batch_ready)."""
        n = len(requests)
        assert n >= 1
        b = next((x for x in ADMIT_BATCH_LADDER if x >= n), ADMIT_BATCH_LADDER[-1])
        assert n <= b, (n, b)
        rows = []
        for r in requests:
            r = dict(r)
            t, _, p = self._resolve_sampling(r.get("temperature"), r.get("top_p"))
            r["temperature"], r["top_p"] = t, p
            r["slot"] = self._take_slot(len(r["scaffold"]), r["max_new_tokens"])
            self.owner[r["slot"]] = -1
            rows.append(r)
        key = self.fused_batch_key(b, rows[0]["tok_args"], len(rows[0]["scaffold"]))
        if key not in self._fused_exe:
            self.warm_fused_batch(
                tokenize_fn, assemble_fn, b, rows[0]["tok_args"],
                len(rows[0]["scaffold"]),
            )
        args, kwargs = self._fused_batch_traced(rows, b)
        self.slots, global_t, semantic = self._fused_exe[key](*args, **kwargs)
        req_ids = []
        for r in rows:
            self.owner[r["slot"]] = None
            req_ids.append(self._register_request(r["slot"], r["max_new_tokens"]))
        return req_ids, global_t, semantic

    # -- three-phase step: dispatch / blocking fetch / host bookkeeping ----
    #
    # The serving loop splits a decode step so that ADMISSIONS OVERLAP THE
    # FETCH: step_begin enqueues the decode program (device work; JAX
    # dispatch is async) and snapshots the slot→request map; step_fetch is
    # the only blocking part (one host transfer — safe on a worker thread:
    # it touches no engine state); step_commit does the host bookkeeping on
    # the snapshot.  An admission dispatched between begin and commit lands
    # on a slot that was FREE at begin time, so the in-flight program
    # (traced on the pre-admission state) never touches it, and commit's
    # snapshot keeps the new request's done=True pre-state from being
    # misread as a finish.  Only step_fetch may run off the owning thread.

    def step_begin(self, n_steps: int, chain_fn=None):
        """Enqueue one decode dispatch; returns an opaque handle for
        step_fetch/step_commit, or None when no slot is live.

        n_steps is snapped UP to the fixed DISPATCH_LADDER (capped at
        max_dispatch) so every dispatch size is a pre-compilable program;
        slots stop on device when they hit their budget limit, so a snapped
        dispatch never writes past a slot's reserved cache region."""
        if all(o is None for o in self.owner):
            return None
        n_steps = snap_to_ladder(n_steps, self.max_dispatch)
        _, top_k, _ = self.sampling
        self.slots, packed = decode_steps(
            self.params,
            self.slots,
            self.cfg,
            n_steps,
            top_k,
            self.eos_ids,
            self.pad_id,
            self.greedy,
            self.vocab_slice,
            self.extra_ids,
            self.clone_slice,
            self.clone_extras,
        )
        return (chain_step_result(packed, chain_fn), chain_fn, n_steps, list(self.owner))

    # step_commit comes from StepProtocolMixin; only the finished-slot
    # release is engine-specific here
    def _commit_slot_done(self, slot: int) -> None:
        # deactivate the slot on device
        self.slots = self.slots._replace(
            active=self.slots.active.at[slot].set(False),
        )

    def release_slot(self, slot: int) -> None:
        """Forcibly free a slot (failure containment): drops the request's
        buffered tokens and deactivates the slot on device."""
        req = self.owner[slot]
        if req is not None:
            self.buffers.pop(req, None)
            self.owner[slot] = None
        self.budget[slot] = 0
        self.slots = self.slots._replace(
            active=self.slots.active.at[slot].set(False),
            done=self.slots.done.at[slot].set(True),
        )

    def run_until_done(self, n_steps: int = 16, max_iters: int = 10_000) -> None:
        for _ in range(max_iters):
            if all(o is None for o in self.owner):
                return
            self.step(n_steps)
