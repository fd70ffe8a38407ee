"""Paged-KV continuous batching engine.

TPU-native replacement for TensorRT-LLM's paged KV cache + inflight fused
batching (reference `runtime/triton_trtllm/run.sh:65` builds the engine with
paged KV; SURVEY.md §2.2 row 1).  The dense engine (`lm/continuous.py`)
preallocates max_slots × cache_len of KV per layer — every admitted request
reserves its worst case.  Here K/V live in a shared page pool:

  * pools: (L, n_kv, n_pages, page_size, hd), page 0 reserved as a trash page
    (inactive slots scatter their dead writes there)
  * each slot holds a page table row (pages_per_slot ids); pages are
    allocated lazily as decode crosses page boundaries and returned to the
    free list the moment a request finishes
  * decode attention runs through the Pallas paged kernel
    (`kernels/paged_attention.py`): the page table is scalar-prefetched and
    drives the per-page DMA — no gather of the pool is ever materialized

Total KV memory = pages-in-use × page_size, so slot count scales with actual
load instead of worst-case budget: at cache_len 3600 / page 64, a dense slot
costs 56 pages while a typical 500-token request peaks at 9.
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparktts_tpu.config import QwenConfig
from sparktts_tpu.kernels.paged_attention import paged_decode_attention
from sparktts_tpu.lm.continuous import (
    DISPATCH_LADDER,
    AdmissionDeferred,
    StepProtocolMixin,
)
from sparktts_tpu.lm.generate import _expand_constrained
from sparktts_tpu.lm.qwen import (
    embed_lookup,
    head_logits,
    lm_logits,
    mlp_block,
    project_qkv,
)
from sparktts_tpu.lm.sample import greedy_token, sample_token
from sparktts_tpu.nn.layers import linear_apply, rms_norm_apply


class PagedSlotState(NamedTuple):
    """Device state: shared page pools + per-slot vectors (B = max_slots)."""

    k_pages: jax.Array     # (L, n_kv, n_pages, page_size, hd)
    v_pages: jax.Array     # (L, n_kv, n_pages, page_size, hd)
    page_table: jax.Array  # (B, pages_per_slot) int32
    cur_token: jax.Array   # (B,) next token to feed
    write_pos: jax.Array   # (B,) token index the next K/V lands at
    limit: jax.Array       # (B,) token budget end: slot stops at this pos
    active: jax.Array      # (B,) bool
    done: jax.Array        # (B,) bool
    control: jax.Array     # (B,) bool — controllable-mode (superset) request
    temperature: jax.Array  # (B,) per-slot sampling temperature
    top_p: jax.Array        # (B,) per-slot nucleus threshold
    rng: jax.Array


def init_paged_slots(
    cfg: QwenConfig,
    max_slots: int,
    n_pages: int,
    page_size: int,
    pages_per_slot: int,
    rng,
    cache_dtype=jnp.bfloat16,
) -> PagedSlotState:
    pool_shape = (
        cfg.num_hidden_layers,
        cfg.num_key_value_heads,
        n_pages,
        page_size,
        cfg.head_dim,
    )
    return PagedSlotState(
        k_pages=jnp.zeros(pool_shape, cache_dtype),
        v_pages=jnp.zeros(pool_shape, cache_dtype),
        page_table=jnp.zeros((max_slots, pages_per_slot), jnp.int32),
        cur_token=jnp.zeros((max_slots,), jnp.int32),
        write_pos=jnp.zeros((max_slots,), jnp.int32),
        limit=jnp.zeros((max_slots,), jnp.int32),
        active=jnp.zeros((max_slots,), bool),
        done=jnp.ones((max_slots,), bool),
        control=jnp.ones((max_slots,), bool),
        temperature=jnp.full((max_slots,), 0.8, jnp.float32),
        top_p=jnp.full((max_slots,), 0.95, jnp.float32),
        rng=rng,
    )


def _write_token_kv(pages: jax.Array, new: jax.Array, layer_idx, page_idx, offset):
    """Scatter one token's K or V into the stacked pool.

    pages: (L, n_kv, n_pages, P, hd); new: (B, n_kv, hd);
    page_idx/offset: (B,).  Inactive slots must point at the trash page.

    NB: the advanced indices (dims 0, 2, 3) are separated by the head slice,
    so numpy semantics move the broadcasted (B,) index dims to the FRONT —
    the update shape is (B, n_kv, hd) exactly as produced."""
    return pages.at[layer_idx, :, page_idx, offset].set(new.astype(pages.dtype))


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "n_steps", "top_k", "eos_ids", "pad_id", "greedy",
        "vocab_slice", "extra_ids", "clone_slice", "clone_extras", "interpret",
    ),
    donate_argnums=(1,),
)
def paged_decode_steps(
    params,
    slots: PagedSlotState,
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
    interpret: bool = False,
) -> Tuple[PagedSlotState, jax.Array]:
    """Advance every active slot up to n_steps tokens over the paged pools.
    Returns (slots, packed (B, 2n+1)) — same contract as the dense engine's
    decode_steps (`lm/continuous.py`): on-device budget limit, per-slot mode
    constraint, single packed host transfer."""
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    page_size = slots.k_pages.shape[3]

    def step(s: PagedSlotState, _):
        live = s.active & ~s.done
        emitted = s.cur_token

        # page slot for this token; dead slots scatter into trash page 0
        pidx = jnp.take_along_axis(
            s.page_table, (s.write_pos // page_size)[:, None], axis=1
        )[:, 0]
        pidx = jnp.where(live, pidx, 0)
        poff = s.write_pos % page_size

        x = embed_lookup(params, s.cur_token[:, None])  # (B, 1, H)
        positions = s.write_pos[:, None]

        def layer_step(carry, layer):
            x, kp, vp, li = carry
            residual = x
            y = rms_norm_apply(layer["ln1"], x, eps=cfg.rms_norm_eps)

            b = y.shape[0]
            q, k, v = project_qkv(layer, y, positions, cfg)

            kp = _write_token_kv(kp, k[:, 0], li, pidx, poff)
            vp = _write_token_kv(vp, v[:, 0], li, pidx, poff)

            attn = paged_decode_attention(
                q[:, 0],                      # (B, Hq, hd)
                kp,
                vp,
                s.page_table,
                s.write_pos + 1,              # keys [0, write_pos] valid
                layer=li,
                sm_scale=hd**-0.5,
                interpret=interpret,
            )
            attn = linear_apply(layer["o"], attn.reshape(b, 1, nh * hd).astype(x.dtype))
            x = residual + attn
            y = rms_norm_apply(layer["ln2"], x, eps=cfg.rms_norm_eps)
            # paged decode modules are decode-only (admission prefill is a
            # separate program), so the fused MLP kernel is safe here too
            x = x + mlp_block(layer, y, decode_fused=True)
            return (x, kp, vp, li + 1), None

        (x, kp, vp, _), _ = jax.lax.scan(
            layer_step,
            (x, s.k_pages, s.v_pages, jnp.zeros((), jnp.int32)),
            params["layers"],
        )

        x = rms_norm_apply(params["final_ln"], x, eps=cfg.rms_norm_eps)
        if cfg.tie_word_embeddings:
            logits = lm_logits(params, x, vocab_slice=vocab_slice, extra_ids=extra_ids)
        else:
            logits = head_logits(params, x, vocab_slice=vocab_slice, extra_ids=extra_ids)

        from sparktts_tpu.lm.continuous import _mode_masked

        last = _mode_masked(
            logits[:, -1], s.control, vocab_slice, extra_ids, clone_slice, clone_extras
        )
        rng, sub = jax.random.split(s.rng)
        if greedy:
            nxt = greedy_token(last)
        else:
            # per-slot sampling params (same contract as the dense engine)
            nxt = sample_token(sub, last, s.temperature[:, None], top_k, s.top_p[:, None])
        nxt = _expand_constrained(nxt, vocab_slice, extra_ids)

        is_eos = jnp.zeros_like(s.done)
        for e in eos_ids:
            is_eos = is_eos | (s.cur_token == e)
        new_write = jnp.where(live, s.write_pos + 1, s.write_pos)
        done = s.done | (is_eos & s.active) | (s.active & (new_write >= s.limit))
        nxt = jnp.where(live & ~done, nxt, pad_id)

        new_s = PagedSlotState(
            k_pages=kp,
            v_pages=vp,
            page_table=s.page_table,
            cur_token=nxt,
            write_pos=new_write,
            limit=s.limit,
            active=s.active,
            done=done,
            control=s.control,
            temperature=s.temperature,
            top_p=s.top_p,
            rng=rng,
        )
        return new_s, (emitted, live)

    from sparktts_tpu.lm.continuous import pack_step_result

    slots, (toks, valid) = jax.lax.scan(step, slots, None, length=n_steps)
    return slots, pack_step_result(toks.T, valid.T, slots.done)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "top_k", "greedy", "vocab_slice", "extra_ids",
        "clone_slice", "clone_extras",
    ),
    donate_argnums=(1,),
)
def paged_admit_prefill(
    params,
    slots: PagedSlotState,
    cfg: QwenConfig,
    slot: jax.Array,        # scalar int32
    input_ids: jax.Array,   # (1, t_pad) right-padded, t_pad % page_size == 0
    prompt_len: jax.Array,  # scalar int32
    page_ids: jax.Array,    # (t_pad // page_size,) freshly allocated pages
    table_row: jax.Array,   # (pages_per_slot,) the slot's full new table row
    temperature: float = 0.8,
    top_k: int = 50,
    top_p: float = 0.95,
    greedy: bool = False,
    vocab_slice: Tuple[int, int] | None = None,
    extra_ids: Tuple[int, ...] = (),
    limit: jax.Array | int = 2**30,  # scalar: token position decode stops at
    control: jax.Array | bool = True,
    clone_slice: Tuple[int, int] | None = None,
    clone_extras: Tuple[int, ...] = (),
) -> PagedSlotState:
    """Prefill one prompt densely, scatter its K/V into the slot's pages, and
    install the slot (same admission contract as the dense engine's
    admit_prefill, `lm/continuous.py` — the prefill itself is the shared
    `prefill_one`)."""
    from sparktts_tpu.lm.continuous import prefill_one

    t_pad = input_ids.shape[1]
    page_size = slots.k_pages.shape[3]
    temperature = jnp.asarray(temperature, jnp.float32)
    top_p = jnp.asarray(top_p, jnp.float32)
    first_tok, tmp_cache, rng = prefill_one(
        params, cfg, input_ids, prompt_len, slots.rng, slots.k_pages.dtype,
        temperature, top_k, top_p, greedy, vocab_slice, extra_ids,
        control, clone_slice, clone_extras,
    )

    # (L, 1, t_pad, nkv, hd) → (L, nkv, n_prompt_pages, page_size, hd)
    def to_pages(c):
        c = c[:, 0].transpose(0, 2, 1, 3)  # (L, nkv, t_pad, hd)
        return c.reshape(
            cfg.num_hidden_layers, cfg.num_key_value_heads,
            t_pad // page_size, page_size, cfg.head_dim,
        )

    k_pages = slots.k_pages.at[:, :, page_ids].set(to_pages(tmp_cache.k))
    v_pages = slots.v_pages.at[:, :, page_ids].set(to_pages(tmp_cache.v))

    return PagedSlotState(
        k_pages=k_pages,
        v_pages=v_pages,
        page_table=slots.page_table.at[slot].set(table_row),
        cur_token=slots.cur_token.at[slot].set(first_tok),
        write_pos=slots.write_pos.at[slot].set(prompt_len),
        limit=slots.limit.at[slot].set(jnp.asarray(limit, jnp.int32)),
        active=slots.active.at[slot].set(True),
        done=slots.done.at[slot].set(False),
        control=slots.control.at[slot].set(jnp.asarray(control, bool)),
        temperature=slots.temperature.at[slot].set(temperature),
        top_p=slots.top_p.at[slot].set(top_p),
        rng=rng,
    )


class PagedContinuousEngine(StepProtocolMixin):
    """Host-side page allocator + slot manager (same public API as
    `ContinuousBatchingEngine`: submit / step / run_until_done / finished)."""

    def __init__(
        self,
        params,
        cfg: QwenConfig,
        max_slots: int = 8,
        n_pages: int = 64,
        page_size: int = 256,
        pages_per_slot: int = 16,
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
    ):
        # admission pads prompts to a multiple of BOTH buckets (prefill K/V
        # scatters whole pages), so one must divide the other
        assert prompt_pad % page_size == 0 or page_size % prompt_pad == 0, (
            prompt_pad, page_size,
        )
        self._admit_bucket = max(prompt_pad, page_size)
        self.params = params
        self.cfg = cfg
        self.max_slots = max_slots
        self.page_size = page_size
        self.pages_per_slot = pages_per_slot
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
        self.interpret = jax.default_backend() == "cpu"
        self.slots = init_paged_slots(
            cfg, max_slots, n_pages, page_size, pages_per_slot,
            jax.random.PRNGKey(seed), cache_dtype,
        )
        # page 0 is the trash page — never allocated
        self.free_pages: List[int] = list(range(1, n_pages))
        self.slot_pages: List[List[int]] = [[] for _ in range(max_slots)]
        self.tokens_seen = np.zeros(max_slots, np.int64)  # prompt + decoded
        # decode steps dispatched but not yet committed (pipelined dispatch:
        # the server may enqueue dispatch N+1 before committing N, and page
        # growth must cover BOTH — tokens_seen alone lags by the uncommitted
        # window and would under-grow the page tables, scattering live K/V
        # into the trash page)
        self.steps_inflight = np.zeros(max_slots, np.int64)
        # worst-case pages each slot may grow to (admission-time reservation:
        # the pool is guaranteed to cover every admitted request's budget)
        self.reserved = np.zeros(max_slots, np.int64)
        self.token_limit = np.zeros(max_slots, np.int64)  # prompt + budget
        self.owner: List[Optional[int]] = [None] * max_slots
        self.budget = np.zeros(max_slots, np.int64)
        self.buffers: Dict[int, List[int]] = {}
        self.finished: Dict[int, np.ndarray] = {}
        self._next_req = 0

    # ------------------------------------------------------------------

    def free_slots(self) -> int:
        return sum(1 for o in self.owner if o is None)

    def pages_in_use(self) -> int:
        return sum(len(p) for p in self.slot_pages)

    def _alloc(self, n: int) -> List[int]:
        if len(self.free_pages) < n:
            raise RuntimeError(
                f"page pool exhausted: need {n}, free {len(self.free_pages)}"
            )
        got, self.free_pages = self.free_pages[:n], self.free_pages[n:]
        return got

    def _table_row(self, slot: int) -> np.ndarray:
        row = np.zeros(self.pages_per_slot, np.int32)
        pages = self.slot_pages[slot]
        row[: len(pages)] = pages
        return row

    def _outstanding_growth(self) -> int:
        """Pages the pool must still be able to hand to admitted slots."""
        return int(
            sum(
                self.reserved[s] - len(self.slot_pages[s])
                for s, o in enumerate(self.owner)
                if o is not None
            )
        )

    def submit(
        self,
        prompt_ids,
        max_new_tokens: int = 512,
        mode: str = "control",
        temperature: float | None = None,
        top_p: float | None = None,
        prompt_len: int | None = None,
    ) -> int:
        """Admit a request.  Reserves its WORST-CASE page count up front: if
        the pool cannot cover every admitted request running to its full
        budget, raises AdmissionDeferred (backpressure) instead of admitting
        a request that would exhaust the pool mid-decode and fail the whole
        batch."""
        slot = next((i for i, o in enumerate(self.owner) if o is None), None)
        if slot is None:
            raise RuntimeError("no free slot")
        if isinstance(prompt_ids, jax.Array):
            # device-chained admission (see ContinuousBatchingEngine.submit):
            # ids arrive pre-assembled on device, true length via prompt_len
            assert prompt_ids.ndim == 2 and prompt_len is not None
            n = int(prompt_len)
            assert prompt_ids.shape[1] % self._admit_bucket == 0 and n <= prompt_ids.shape[1]
            t_pad = prompt_ids.shape[1]
        else:
            n = len(prompt_ids)
            t_pad = ((n + self._admit_bucket - 1) // self._admit_bucket) * self._admit_bucket
        total_pages = (t_pad + max_new_tokens + self.page_size - 1) // self.page_size
        assert total_pages <= self.pages_per_slot, "prompt+budget exceeds page table"
        prompt_pages = t_pad // self.page_size
        if len(self.free_pages) - prompt_pages < self._outstanding_growth() + (
            total_pages - prompt_pages
        ):
            raise AdmissionDeferred(
                f"page pool cannot reserve {total_pages} pages for this request "
                f"(free {len(self.free_pages)}, outstanding growth "
                f"{self._outstanding_growth()}) — retry after slots free"
            )
        self.slot_pages[slot] = self._alloc(prompt_pages)
        if isinstance(prompt_ids, jax.Array):
            ids = prompt_ids
        else:
            ids = np.full((1, t_pad), self.pad_id, np.int32)
            ids[0, :n] = prompt_ids
        eng_temperature, top_k, eng_top_p = self.sampling
        temperature = eng_temperature if temperature is None else temperature
        top_p = eng_top_p if top_p is None else top_p
        self.slots = paged_admit_prefill(
            self.params,
            self.slots,
            self.cfg,
            jnp.asarray(slot, jnp.int32),
            jnp.asarray(ids),
            jnp.asarray(n, jnp.int32),
            jnp.asarray(self.slot_pages[slot], jnp.int32),
            jnp.asarray(self._table_row(slot)),
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
        req_id = self._next_req
        self._next_req += 1
        self.owner[slot] = req_id
        self.budget[slot] = max_new_tokens
        self.tokens_seen[slot] = n
        self.token_limit[slot] = n + max_new_tokens
        self.reserved[slot] = total_pages
        self.buffers[req_id] = []
        return req_id

    def _ensure_pages(self, n_steps: int):
        """Grow page tables so every active slot can absorb n_steps tokens.

        Atomic: per-slot deficits are computed first and the total allocated
        in ONE _alloc call before any slot_pages list is mutated — a failed
        allocation therefore leaves tables, lists and device state coherent
        (ADVICE r2: a partial grow left live K/V pointed at the trash page).
        With admission-time reservation the allocation can only fail if a
        caller bypassed submit's accounting."""
        deficits: List[Tuple[int, int]] = []
        for slot, req in enumerate(self.owner):
            if req is None:
                continue
            # slots stop on device at token_limit — pages beyond it are never
            # written, so cap the requirement there.  steps_inflight covers
            # dispatches enqueued but not yet committed (pipelined window).
            tokens_after = min(
                int(self.tokens_seen[slot] + self.steps_inflight[slot]) + n_steps,
                int(self.token_limit[slot]),
            )
            need = -(-tokens_after // self.page_size)
            if need > self.pages_per_slot:
                # must fail loudly: capping would scatter live K/V into the
                # shared trash page and silently corrupt this slot's output
                raise RuntimeError(
                    f"slot {slot} needs {need} pages > pages_per_slot="
                    f"{self.pages_per_slot}"
                )
            have = len(self.slot_pages[slot])
            if need > have:
                deficits.append((slot, need - have))
        if not deficits:
            return
        got = self._alloc(sum(d for _, d in deficits))
        for slot, d in deficits:
            self.slot_pages[slot].extend(got[:d])
            got = got[d:]
        table = np.stack([self._table_row(s) for s in range(self.max_slots)])
        self.slots = self.slots._replace(page_table=jnp.asarray(table))

    def _release(self, slot: int):
        self.free_pages.extend(self.slot_pages[slot])
        self.slot_pages[slot] = []
        self.tokens_seen[slot] = 0
        self.token_limit[slot] = 0
        self.reserved[slot] = 0
        self.slots = self.slots._replace(
            page_table=self.slots.page_table.at[slot].set(
                jnp.zeros(self.pages_per_slot, jnp.int32)
            ),
            active=self.slots.active.at[slot].set(False),
            done=self.slots.done.at[slot].set(True),
        )

    # -- three-phase step: step/step_chained/step_fetch come from
    #    StepProtocolMixin (shared contract with the dense engine) ---------

    def step_begin(self, n_steps: int, chain_fn=None):
        if all(o is None for o in self.owner):
            return None
        from sparktts_tpu.lm.continuous import snap_to_ladder

        n_steps = snap_to_ladder(n_steps, self.max_dispatch)
        self._ensure_pages(n_steps)
        for slot, req in enumerate(self.owner):
            if req is not None:
                self.steps_inflight[slot] += n_steps
        _, top_k, _ = self.sampling
        self.slots, packed = paged_decode_steps(
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
            self.interpret,
        )
        from sparktts_tpu.lm.continuous import chain_step_result

        return (chain_step_result(packed, chain_fn), chain_fn, n_steps, list(self.owner))

    # step_commit comes from StepProtocolMixin; the paged engine's extra
    # bookkeeping is tokens_seen (drives page growth) and page release
    def step_commit(self, handle, fetched):
        # release this dispatch's in-flight step bookings before the shared
        # commit (tokens_seen absorbs the actual advance via the hook below)
        n_steps = handle[2]
        for slot, req in enumerate(handle[3]):
            if req is not None:
                self.steps_inflight[slot] = max(
                    int(self.steps_inflight[slot]) - n_steps, 0
                )
        return super().step_commit(handle, fetched)

    def _commit_slot_tokens(self, slot: int, n_valid: int) -> None:
        self.tokens_seen[slot] += n_valid

    def _commit_slot_done(self, slot: int) -> None:
        self._release(slot)

    def release_slot(self, slot: int) -> None:
        """Forcibly free a slot (failure containment): drops buffered tokens,
        returns its pages to the pool, deactivates it on device."""
        req = self.owner[slot]
        if req is not None:
            self.buffers.pop(req, None)
            self.owner[slot] = None
        self.budget[slot] = 0
        self._release(slot)

    def run_until_done(self, n_steps: int = 16, max_iters: int = 10_000) -> None:
        for _ in range(max_iters):
            if all(o is None for o in self.owner):
                return
            self.step(n_steps)
