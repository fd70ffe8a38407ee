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
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparktts_tpu.config import QwenConfig
from sparktts_tpu.lm.qwen import KVCache, init_kv_cache, qwen_forward
from sparktts_tpu.lm.sample import greedy_token, sample_token


class SlotState(NamedTuple):
    """Per-slot device vectors (all (B,) unless noted)."""

    cache: KVCache
    cur_token: jax.Array   # next token to feed
    write_pos: jax.Array   # cache slot where cur_token's K/V will be written
    position: jax.Array    # RoPE position of cur_token
    start: jax.Array       # first valid cache index (left-pad offset; 0 here)
    active: jax.Array      # bool — slot holds a live sequence
    done: jax.Array        # bool — sequence finished (EOS seen)
    rng: jax.Array


def init_slots(cfg: QwenConfig, max_slots: int, cache_len: int, rng, cache_dtype=jnp.bfloat16) -> SlotState:
    # distinct buffers per field: donation forbids aliased arguments
    return SlotState(
        cache=init_kv_cache(cfg, max_slots, cache_len, cache_dtype),
        cur_token=jnp.zeros((max_slots,), jnp.int32),
        write_pos=jnp.zeros((max_slots,), jnp.int32),
        position=jnp.zeros((max_slots,), jnp.int32),
        start=jnp.zeros((max_slots,), jnp.int32),
        active=jnp.zeros((max_slots,), bool),
        done=jnp.ones((max_slots,), bool),
        rng=rng,
    )


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
    rng, sub = jax.random.split(rng)
    if greedy:
        first_tok = greedy_token(last[:, 0])[0]
    else:
        first_tok = sample_token(sub, last[:, 0], temperature, top_k, top_p)[0]
    first_tok = _expand_constrained(first_tok, vocab_slice, extra_ids)
    return first_tok, tmp_cache, rng


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "slot_cache_len", "top_k", "greedy", "vocab_slice", "extra_ids"),
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
) -> SlotState:
    """Prefill one prompt and install it into `slot`.

    The prompt is RIGHT-padded here (unlike aligned-batch generate): the
    sequence occupies cache [0, prompt_len), decode continues at prompt_len.
    Pad keys beyond prompt_len are masked by each future step's key mask, and
    within prefill by the causal+pad bias.
    """
    first_tok, tmp_cache, rng = prefill_one(
        params, cfg, input_ids, prompt_len, slots.rng, slots.cache.k.dtype,
        temperature, top_k, top_p, greedy, vocab_slice, extra_ids,
    )

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
        active=slots.active.at[slot].set(True),
        done=slots.done.at[slot].set(False),
        rng=rng,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "n_steps", "top_k", "eos_ids", "pad_id", "greedy",
        "vocab_slice", "extra_ids",
    ),
    donate_argnums=(1,),
)
def decode_steps(
    params,
    slots: SlotState,
    cfg: QwenConfig,
    n_steps: int,
    temperature: float = 0.8,
    top_k: int = 50,
    top_p: float = 0.95,
    eos_ids: Tuple[int, ...] = (),
    pad_id: int = 0,
    greedy: bool = False,
    vocab_slice: Tuple[int, int] | None = None,
    extra_ids: Tuple[int, ...] = (),
) -> Tuple[SlotState, jax.Array, jax.Array]:
    """Advance every active slot by n_steps tokens; returns (slots, tokens
    (B, n_steps), valid (B, n_steps) bool).  `valid` is the explicit emission
    mask — pad_id may be a legitimately sampled id, so callers must not infer
    liveness from token values.

    The key-validity window is an index compare fused into attention
    (qwen_forward decode_window) — no (B, 1, S) fp32 bias per step.
    vocab_slice/extra_ids optionally constrain sampling to the TTS-legal
    token range (guided decoding, see lm/generate.py)."""
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
        rng, sub = jax.random.split(s.rng)
        if greedy:
            nxt = greedy_token(logits[:, -1])
        else:
            nxt = sample_token(sub, logits[:, -1], temperature, top_k, top_p)
        nxt = _expand_constrained(nxt, vocab_slice, extra_ids)

        is_eos = jnp.zeros_like(s.done)
        for e in eos_ids:
            is_eos = is_eos | (s.cur_token == e)
        done = s.done | (is_eos & s.active)
        nxt = jnp.where(live & ~done, nxt, pad_id)

        new_s = SlotState(
            cache=cache,
            cur_token=nxt,
            write_pos=jnp.where(live, s.write_pos + 1, s.write_pos),
            position=jnp.where(live, s.position + 1, s.position),
            start=s.start,
            active=s.active,
            done=done,
            rng=rng,
        )
        return new_s, (emitted, live)

    slots, (toks, valid) = jax.lax.scan(body, slots, None, length=n_steps)
    return slots, toks.T, valid.T  # (B, n)


class ContinuousBatchingEngine:
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
        self.slots = init_slots(cfg, max_slots, cache_len, jax.random.PRNGKey(seed), cache_dtype)
        self.owner: List[Optional[int]] = [None] * max_slots  # request ids
        self.budget = np.zeros(max_slots, np.int64)  # remaining tokens per slot
        self.buffers: Dict[int, List[int]] = {}
        self.finished: Dict[int, np.ndarray] = {}
        self._next_req = 0

    # ------------------------------------------------------------------

    def free_slots(self) -> int:
        return sum(1 for o in self.owner if o is None)

    def submit(self, prompt_ids, max_new_tokens: int = 512) -> int:
        """Admit a request; returns its id.  Raises if no slot is free."""
        slot = next((i for i, o in enumerate(self.owner) if o is None), None)
        if slot is None:
            raise RuntimeError("no free slot")
        n = len(prompt_ids)
        t_pad = ((n + self.prompt_pad - 1) // self.prompt_pad) * self.prompt_pad
        assert t_pad + max_new_tokens <= self.cache_len, "prompt+budget exceeds cache"
        ids = np.full((1, t_pad), self.pad_id, np.int32)
        ids[0, :n] = prompt_ids  # right-padded
        temperature, top_k, top_p = self.sampling
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
        )
        req_id = self._next_req
        self._next_req += 1
        self.owner[slot] = req_id
        self.budget[slot] = max_new_tokens
        self.buffers[req_id] = []
        return req_id

    def step(self, n_steps: int = 16) -> Dict[int, np.ndarray]:
        """Advance all active slots; returns {req_id: np.ndarray(new tokens)}
        for requests that produced tokens this call.  Finished requests move
        to `self.finished`."""
        if all(o is None for o in self.owner):
            return {}
        # never decode past the tightest remaining budget: overshoot would
        # write K/V beyond the cache region reserved at submit
        remaining = [
            int(self.budget[i]) for i, o in enumerate(self.owner) if o is not None
        ]
        n_steps = max(1, min(n_steps, min(remaining)))
        temperature, top_k, top_p = self.sampling
        self.slots, toks, valid = decode_steps(
            self.params,
            self.slots,
            self.cfg,
            n_steps,
            temperature,
            top_k,
            top_p,
            self.eos_ids,
            self.pad_id,
            self.greedy,
            self.vocab_slice,
            self.extra_ids,
        )
        # one host round-trip for all three arrays
        toks, valid, done = jax.device_get((toks, valid, self.slots.done))
        out: Dict[int, np.ndarray] = {}
        for slot, req in enumerate(self.owner):
            if req is None:
                continue
            new = toks[slot][valid[slot]]
            if new.size:
                self.buffers[req].extend(new.tolist())
                out[req] = new
            self.budget[slot] -= n_steps
            if done[slot] or self.budget[slot] <= 0:
                self.finished[req] = np.asarray(self.buffers.pop(req), np.int32)
                self.owner[slot] = None
                # deactivate the slot on device
                self.slots = self.slots._replace(
                    active=self.slots.active.at[slot].set(False),
                    done=self.slots.done.at[slot].set(True),
                )
        return out

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
