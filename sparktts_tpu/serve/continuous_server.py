"""Continuous-batching TTS server: the production serving architecture.

Couples the inflight-batching LM engine (`lm/continuous.py`) with the codec:
requests join the running decode batch the moment a slot frees (no
batch-formation barrier like `serve/server.py`), tokens stream out per decode
micro-batch, and finished/chunked token runs are vocoded while the LM keeps
decoding — decode dispatches and vocoder calls run on separate host threads,
so the next micro-batch is in flight while the previous chunk renders.

Dispatch sizing is ADAPTIVE: each decode dispatch is sized to the nearest
upcoming event across the running batch (a streaming request's next chunk
boundary, or a budget end), snapped to the engine's fixed dispatch-size
ladder so no size ever compiles a new program.  The first dispatch after a
streaming admission therefore covers exactly its first chunk — first-audio
latency is one prefill + one decode dispatch + one vocode, matching the
single-stream `StreamingSynthesizer` schedule while still sharing the batch.

This is the role TRT-LLM's inflight batching + Triton's decoupled transactions
play in the reference deployment (SURVEY.md §3.5), in one asyncio loop.
"""

from __future__ import annotations

import asyncio
import logging
import os
import threading
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import AsyncIterator, Dict, Optional

import numpy as np

from sparktts_tpu.lm.continuous import (
    AdmissionDeferred,
    RequestTooLong,
    snap_to_ladder,
)
from sparktts_tpu.prompt import (
    build_clone_prompt,
    build_control_prompt,
    clone_prompt_scaffold,
    extract_global_ids,
    extract_semantic_ids,
)
from sparktts_tpu.utils.profiling import StageStats

logger = logging.getLogger(__name__)

#: Batch sizes the cross-stream vocode batcher compiles/uses — the single
#: source of truth for both the up-front warm pass (warm_vocode_batches_seen)
#: and the server's runtime ladder (_voc_batch_sizes); a size missing from
#: either side would stay permanently cold with no error.
VOCODE_BATCH_LADDER = (2, 4, 8, 16)

#: Guards the first-touch installation of a pipeline's _voc_batch_state: the
#: vocode worker, warm daemon threads, and a warmup main thread can all race
#: the lazy init, and a lost dict would drop warm/warming marks (re-kicking
#: compiles, keeping drains scalar).
_VOC_STATE_LOCK = threading.Lock()


def _voc_state(pipe) -> Dict[str, set]:
    """Per-PIPELINE batched-vocoder warm state, stored on the pipeline object
    itself: `warm` (batch, t_pad) signatures whose batched program is
    compiled, `warming` ones with a background compile in flight, and
    `sizes_seen` raw window lengths vocode drains have actually routed.  The
    vocoder executables live in the pipeline's per-instance jit cache, so
    warmth shares its owner's lifetime exactly — a process-global registry
    keyed by id(pipe) would survive the pipeline and could alias a recycled
    object id, marking cold signatures warm and stalling a live drain on an
    inline trace."""
    st = getattr(pipe, "_voc_batch_state", None)
    if st is None:
        with _VOC_STATE_LOCK:
            st = getattr(pipe, "_voc_batch_state", None)
            if st is None:
                st = {"warm": set(), "warming": set(), "sizes_seen": set()}
                pipe._voc_batch_state = st
    return st


def warm_vocode_batch(pipe, batch: int, t_pad: int) -> None:
    """Synchronously compile the (batch, t_pad) batched-vocoder signature and
    register it warm, so servers over `pipe` batch that shape from the first
    drain (benches/deployments call this up front; live servers otherwise
    background-warm shapes on first sight)."""
    t_pad = -(-t_pad // pipe.vocode_bucket) * pipe.vocode_bucket
    st = _voc_state(pipe)
    if (batch, t_pad) in st["warm"]:
        return
    n_glob = pipe.config.bicodec.speaker_encoder.token_num
    pipe.detokenize_batch(
        np.zeros((batch, n_glob), np.int32),
        [np.zeros(t_pad, np.int32)] * batch,
    )
    st["warm"].add((batch, t_pad))


def default_stream_ctx(pipe) -> int:
    """Codec one-sided receptive field rounded up to the vocode bucket — the
    streaming left-context that makes windowed vocode bit-equal to the
    full-prefix recompute."""
    from sparktts_tpu.codec.bicodec import detokenize_receptive_field

    rf = detokenize_receptive_field(pipe.config.bicodec)
    bucket = pipe.vocode_bucket
    return -(-rf // bucket) * bucket


def vocode_window_cap(pipe, max_vocode_window: Optional[int] = None,
                      stream_ctx: Optional[int] = None) -> int:
    """Resolve the streaming vocode window cap (see ContinuousTTSServer):
    bucket-aligned, floored at ctx + 2 buckets so a window can always advance
    past its own context prefix.

    Every split window re-renders `stream_ctx` of left context plus up to
    `stream_ctx` of look-ahead, so capping a long chunk into pieces of size
    `cap` costs roughly an extra 2·ctx/cap of vocode compute.  The default
    therefore scales with BOTH knobs: max(8·bucket, 4·ctx) keeps the overhead
    ratio ≤ ~50% even when a fine bucket shrinks `bucket` far below the
    receptive-field-derived ctx (with the stock bucket, ctx ≈ 1 bucket and
    the 8-bucket term dominates → ~25% worst-case overhead)."""
    bucket = pipe.vocode_bucket
    if stream_ctx is None:
        stream_ctx = default_stream_ctx(pipe)
    if max_vocode_window is None:
        max_vocode_window = max(8 * bucket, 4 * stream_ctx)
    floor_cap = stream_ctx + 2 * bucket
    return -(-max(max_vocode_window, floor_cap) // bucket) * bucket


def warm_stream_windows(pipe, max_window: int) -> int:
    """Compile the SCALAR streaming-vocode program for every window shape the
    capped planner can produce: t_pad ∈ {bucket, 2·bucket, ...} up to
    `max_window` (pass cap + stream_ctx: a split window renders look-ahead
    past its cut).  The window cap (ContinuousTTSServer.max_vocode_window)
    closes this set, so a server warmed here never pays a detokenize compile
    inside a live vocode drain no matter what lengths sampling produces.
    Returns the number of NEW signatures compiled this call (shapes this
    pipeline already warmed — tracked per-pipe, so re-sweeps skip jit-hit
    loops — are not counted)."""
    bucket = pipe.vocode_bucket
    n_glob = pipe.config.bicodec.speaker_encoder.token_num
    globs = np.zeros((1, n_glob), np.int32)
    warmed = _voc_state(pipe).setdefault("stream_tpads", set())
    n = 0
    for t_pad in range(bucket, -(-int(max_window) // bucket) * bucket + 1, bucket):
        if t_pad in warmed:
            continue
        pipe.detokenize(globs, np.zeros((1, t_pad), np.int32))
        warmed.add(t_pad)
        n += 1
    return n


def warm_vocode_batches_seen(pipe, max_batch: int) -> int:
    """Synchronously compile batched-vocoder signatures for every window
    length this process has already routed through a vocode drain for `pipe`
    (run a representative warm pass first), at batch sizes 2..max_batch from
    the server's size ladder.  Raw seen lengths are re-padded with the
    pipeline's CURRENT vocode bucket, so changing `pipe.vocode_bucket`
    between warm passes warms the shapes the next runs will actually
    produce.  Returns the number of signatures warmed."""
    st = _voc_state(pipe)
    bucket = pipe.vocode_bucket
    tpads = {-(-max(s, 1) // bucket) * bucket for s in st["sizes_seen"]}
    n = 0
    for t_pad in sorted(tpads):
        for b in VOCODE_BATCH_LADDER:
            if b > max_batch:
                break
            if (b, t_pad) not in st["warm"]:
                warm_vocode_batch(pipe, b, t_pad)
                n += 1
    return n


def warm_spec_chain(pipe, max_slots: int, batch: int, target: int, n_steps: int) -> None:
    """Compile (by dummy execution) the speculative first-chunk chain
    program for one (batch, target, dispatch-size) signature and register it
    warm.  The packed step-result width is 2*n_steps+1 over `max_slots`
    rows, so the program re-specializes per dispatch rung."""
    st = _voc_state(pipe)
    warm_set = st.setdefault("spec_warm", set())
    t_pad = -(-max(target, 1) // pipe.vocode_bucket) * pipe.vocode_bucket
    key = (batch, target, t_pad, n_steps)
    if key in warm_set:
        return
    import jax
    import jax.numpy as jnp

    fn = pipe._spec_chain_fn(batch, target)
    tn = pipe.config.bicodec.speaker_encoder.token_num
    # COMMITTED device arrays, like the live call's (packed is a decode
    # program output, globs a device concat): the jit cache keys on the
    # argument sharding/committed-ness, so an uncommitted warm compiles a
    # DIFFERENT executable and the live path still stalls on its own
    # compile (the r05 conc-4 first-dispatch stalls, conc4_probe log)
    dev = jax.devices()[0]
    packed = jax.device_put(jnp.zeros((max_slots, 2 * n_steps + 1), jnp.int32), dev)
    fn(
        pipe.bicodec_params,
        packed,
        np.zeros(batch, np.int32),
        np.zeros(batch, np.int32),
        np.zeros(batch, bool),
        jax.device_put(jnp.zeros((batch, tn), jnp.int32), dev),
    )
    warm_set.add(key)


def first_chunk_target(pipe) -> int:
    """The streaming schedule's FIRST chunk size in semantic tokens — the
    speculative chain's `target` for every fresh stream."""
    from sparktts_tpu.serve.streaming import chunk_sizes

    return next(chunk_sizes(pipe.config.streaming))


def warm_spec_chains(server, max_batch: int) -> int:
    """Pre-compile every speculative-chain signature a server's dispatch
    sizing can put on a first-chunk-covering dispatch: rungs >= the first
    chunk target (clone) / target + token_num + 2 (controllable pre-snap),
    capped at the server's dispatch cap, at batch 1 and every ladder size
    <= max_batch.  Benches call this so no live/timed first chunk ever
    waits out a chain compile.  Returns the number of programs compiled."""
    pipe = server.pipe
    target = first_chunk_target(pipe)
    tn = pipe.config.bicodec.speaker_encoder.token_num
    rungs = {
        snap_to_ladder(target, server.steps, overshoot=target),
        snap_to_ladder(target + tn + 2, server.steps, overshoot=target + tn + 2),
    }
    if server.co_dispatch_cap >= target:
        rungs.add(snap_to_ladder(server.co_dispatch_cap, server.steps))
    sizes = [1] + [b for b in VOCODE_BATCH_LADDER if b <= max(max_batch, 2)]
    st = _voc_state(pipe)
    warm_set = st.setdefault("spec_warm", set())
    t_pad = -(-max(target, 1) // pipe.vocode_bucket) * pipe.vocode_bucket
    n = 0
    for rung in sorted(rungs):
        if rung < target:
            continue
        for b in sizes:
            if (b, target, t_pad, rung) not in warm_set:
                warm_spec_chain(pipe, server.engine.max_slots, b, target, rung)
                n += 1
    return n


def warm_admit_batches(server, tasks, max_batch: int) -> int:
    """Pre-compile BATCHED-admission executables for every distinct
    (wav bucket × prompt bucket) signature in `tasks`, at every
    ADMIT_BATCH_LADDER size ≤ max_batch — both the fused (first-time voice)
    and assembled (voice-cache hit) variants.  Benches/deployments call this
    up front so a timed/live burst never compiles its batch program inline;
    executables land in the process-global cache, so fresh servers over the
    same pipeline adopt them.  `tasks` rows need .text/.prompt_wav/
    .prompt_text.  Returns the number of executables compiled or adopted."""
    from sparktts_tpu.lm.continuous import ADMIT_BATCH_LADDER

    eng = server.engine
    if not hasattr(eng, "warm_fused_batch"):
        return 0
    pipe = server.pipe
    n_glob = pipe.config.bicodec.speaker_encoder.token_num
    sizes = [b for b in ADMIT_BATCH_LADDER if b <= max_batch]
    seen, n = set(), 0
    for t in tasks:
        pending = _Pending(
            text=t.text, prompt_wav=t.prompt_wav, prompt_text=t.prompt_text,
            gender=None, pitch=None, speed=None,
            max_new_tokens=server.default_max_new, future=None,
        )
        fn, tok_args, n_sem_true, s_pad = pipe.tokenize_host_prep(t.prompt_wav)
        use_sem = n_sem_true if t.prompt_text is not None else 0
        scaffold, _, _, _, t_pad = server._clone_scaffold(n_glob, use_sem, pending)
        sig = (tok_args[2].shape[-1], s_pad, t_pad, use_sem and 1)
        if sig in seen:
            continue
        seen.add(sig)
        assemble_fn = pipe._assemble_fn_batch(t_pad, s_pad)
        for b in sizes:
            eng.warm_fused_batch(fn, assemble_fn, b, tok_args, t_pad)
            eng.warm_assembled_batch(assemble_fn, b, n_glob, s_pad, t_pad)
            n += 2
    return n


def _split_first_audio(jobs: list, deferred: set):
    """First-chunk-priority split of one vocode drain (see _vocode_loop):
    returns (run_now, backlog, deferred').  When the drain mixes first-audio
    jobs (streams that have emitted nothing) with steady-state jobs, the
    steady-state jobs are deferred one cycle — unless any of them was already
    deferred (its id is in `deferred`), in which case the whole drain runs.
    `deferred'` is exactly the ids in the returned backlog, so a job
    rejoining from backlog is never re-deferred.  OFFLINE jobs are never
    deferred: their caller has buffered nothing (completion latency is the
    whole request), so they stay in run_now alongside the first-audio work —
    only steady-state chunks of established streams are traded."""
    def first_audio(job) -> bool:
        pending, _, _, offline = job
        return offline or (pending.chunk_queue is not None
                           and pending.stream_emitted == 0)

    urgent = [j for j in jobs if first_audio(j)]
    rest = [j for j in jobs if not first_audio(j)]
    if urgent and rest and all(id(j[0]) not in deferred for j in rest):
        return urgent, [tuple(j) for j in rest], {id(j[0]) for j in rest}
    return jobs, [], set()


@dataclass
class _Pending:
    text: str
    prompt_wav: Optional[np.ndarray]
    prompt_text: Optional[str]
    gender: Optional[str]
    pitch: Optional[str]
    speed: Optional[str]
    max_new_tokens: int
    future: asyncio.Future
    temperature: Optional[float] = None
    top_p: Optional[float] = None
    global_tokens: Optional[np.ndarray] = None
    # pre-supplied speaker identity (codec global ids): admission builds a
    # globals-only clone prompt — longform continuation segments reuse the
    # first segment's voice without re-tokenizing any audio
    speaker_globals: Optional[np.ndarray] = None
    enqueue_time: float = field(default_factory=time.perf_counter)
    # streaming mode: chunks go to this queue instead of one final future
    chunk_queue: Optional[asyncio.Queue] = None
    stream_buf: list = field(default_factory=list)
    # absolute semantic index of stream_buf[0]: windowed vocode only re-reads
    # the last stream_ctx tokens, so the dead prefix is trimmed as the stream
    # advances (stream_emitted/window indices stay absolute)
    stream_base: int = 0
    # emitted ids (incl. markers) kept ONLY until the speaker identity is
    # known — cleared once global_tokens is extracted (controllable mode) and
    # never filled when it is known at admission (clone mode)
    raw_buf: list = field(default_factory=list)
    stream_emitted: int = 0
    stream_target: int = 0
    stream_schedule: Optional[object] = None
    cancelled: bool = False  # consumer abandoned the stream mid-flight
    # increments handed off by the EVENT-LOOP thread (vocode enqueue or an
    # applied speculative chunk).  _plan_spec must key "first chunk still
    # pending" off this, NOT off stream_buf/raw_buf/stream_emitted — those
    # mutate on the vocode worker thread, so an increment still queued in
    # _vocode_q would leave them empty and misidentify the slot as fresh.
    loop_increments: int = 0
    # tokens handed off by the event-loop thread (same thread-safety rule as
    # loop_increments): dispatch sizing keys "first chunk covered yet" off
    # this counter, never off the vocode-thread stream bookkeeping
    loop_tokens: int = 0
    # the FIRST chunk's token target, frozen at submit time (stream_target
    # advances on the vocode worker thread as the schedule progresses)
    first_target: int = 0


class ContinuousTTSServer:
    """Asyncio server with per-step request admission."""

    def __init__(
        self,
        pipeline,
        max_slots: int = 8,
        cache_len: Optional[int] = None,
        steps_per_dispatch: int = 512,
        default_max_new_tokens: Optional[int] = None,
        paged: bool = False,
        page_size: int = 256,
        n_pages: Optional[int] = None,
        greedy: bool = False,
        device_admission: bool = True,
        spec_first_chunk: bool = True,
        fused_admission: bool = True,
        fused_warm: str = "background",
        arrival_window_s: float = 4.0,
        stream_context_frames: Optional[int] = None,
        vocode_batch: bool = True,
        max_vocode_window: Optional[int] = None,
        dispatch_depth: int = 2,
    ):
        self.pipe = pipeline
        # how many decode dispatches may be in flight at once.  Depth 2
        # double-buffers the decode cadence: dispatch N+1 is enqueued BEFORE
        # dispatch N's blocking fetch, so the device runs continuously across
        # the fetch round-trip instead of idling one relay RTT per dispatch
        # (~25 ms healthy, 150+ ms in degraded windows — relay_probe).  The
        # planned-token ledger (_planned_ahead) keeps dispatch sizing, spec
        # planning and first-chunk accounting correct for work that is
        # dispatched but not yet committed.  Depth 1 restores the serialized
        # cadence (A/B lever).
        self.dispatch_depth = max(1, int(
            os.environ.get("SPARKTTS_DISPATCH_DEPTH", dispatch_depth)
        ))
        # streaming vocode left-context window: each chunk re-renders only
        # [emitted - ctx, upto) and emits the tail.  ctx defaults to the
        # codec's one-sided receptive field (detokenize is purely
        # convolutional), rounded up to the vocode bucket — the emitted
        # samples are identical to a full-prefix recompute, but per-chunk
        # cost is O(chunk + ctx) instead of O(stream length) (the reference
        # re-vocodes full prefixes per chunk too, `spark_tts/1/model.py:283`,
        # and its own streaming caps chunks at 30 s to bound that cost).
        if stream_context_frames is None:
            stream_context_frames = default_stream_ctx(pipeline)
        self.stream_ctx = int(stream_context_frames)
        # vocode window-size cap: every streaming vocode window EMITS at most
        # this many semantic tokens past its context start (a split window
        # additionally renders up to stream_ctx look-ahead tokens), so the
        # scalar AND batched detokenize programs come from the small CLOSED
        # shape set {bucket, 2*bucket, ..., cap + ctx} that warmup can
        # enumerate (warm_stream_windows).
        # Without it the set is open — chunk targets grow to 30 s (1500
        # tokens) and a final tail's size tracks the sampled generation
        # length, so a live run can always hit a fresh t_pad and stall its
        # vocode drain several seconds on a synchronous XLA compile (seen as
        # a 6.7 s vocode max in the conc-4 dataset recording).  Oversized
        # windows split into cap-sized pieces, each with its own
        # receptive-field prefix — emitted samples stay bit-equal to the
        # full-prefix recompute, same invariant as the windowing itself.
        self.max_vocode_window = vocode_window_cap(
            pipeline, max_vocode_window, self.stream_ctx
        )
        # arrival anticipation: how long after the last concurrent activity a
        # lone stream keeps its dispatches short (see _requested_steps)
        self.arrival_window_s = arrival_window_s
        self._last_concurrent = float("-inf")
        # latency features for tunneled/remote TPUs — each host sync costs a
        # relay round-trip, so admission chains tokenize→assemble→prefill as
        # pure device dispatches (device_admission) and a streaming request's
        # first chunk is vocoded INSIDE the decode dispatch chain and fetched
        # with the step result in one transfer (spec_first_chunk).  Both are
        # no-ops for correctness: outputs are bit-identical to the plain path.
        self.device_admission = device_admission and pipeline.codec_device is None
        self.spec_first_chunk = spec_first_chunk and pipeline.codec_device is None
        # tokenize+assemble+prefill as ONE program (dense engine only); the
        # three-program chain below remains for the paged engine and as the
        # fused_admission=False escape hatch.  fused_warm="background"
        # compiles each first-seen (wav bucket × prompt bucket) signature on
        # a daemon thread while the request itself takes the already-compiled
        # three-program chain — a cold signature never stalls live streams on
        # an XLA compile; "sync" compiles inline on first use (tests/bench).
        self.fused_admission = fused_admission
        assert fused_warm in ("background", "sync")
        self.fused_warm = fused_warm
        self._fused_warming: set = set()
        # steps_per_dispatch caps the adaptive dispatch size (ladder max).
        # The co-dispatch caps below are ABSOLUTE (not fractions of the max):
        # raising the ladder top to 512 must not raise how long a mid-flight
        # admission waits out an in-flight dispatch, so a batch with company
        # (or expected company) keeps dispatching at the same 64/32-step
        # granularity the 128-cap configuration recorded.
        self.steps = steps_per_dispatch
        self.co_dispatch_cap = max(min(steps_per_dispatch // 2, 64), 1)
        self.anticipation_cap = max(min(steps_per_dispatch // 4, 32), 1)
        self.default_max_new = default_max_new_tokens or pipeline.max_new_tokens
        from sparktts_tpu.lm.qwen import aligned_cache_len

        cache_len = aligned_cache_len(
            cache_len or (pipeline.prompt_bucket * 4 + self.default_max_new)
        )
        # ONE engine serves clone AND controllable requests: it compiles with
        # the superset ("control") constraint, and clone slots narrow it on
        # device to semantic+EOS via the per-slot mode mask — both modes then
        # sample exactly the distribution their offline path would
        vocab_slice, extra_ids = pipeline.guided_constraint("control")
        clone_slice, clone_extras = pipeline.guided_constraint("clone")
        common = dict(
            prompt_pad=pipeline.prompt_bucket,
            eos_ids=tuple(pipeline.tokenizer.eos_ids),
            pad_id=pipeline.tokenizer.pad_id,
            cache_dtype=pipeline.lm_dtype,
            vocab_slice=vocab_slice,
            extra_ids=extra_ids,
            clone_slice=clone_slice,
            clone_extras=clone_extras,
            max_dispatch=steps_per_dispatch,
            greedy=greedy,
        )
        if paged and pipeline.mesh is not None:
            # the paged Pallas decode kernel drives per-page DMA off
            # scalar-prefetched tables — single-device by construction; the
            # dense engine carries the sharded path (kv heads over tp)
            raise ValueError(
                "paged KV does not compose with shard_llm; use the dense engine"
            )
        if paged:
            from sparktts_tpu.lm.paged import PagedContinuousEngine

            if (
                pipeline.prompt_bucket % page_size != 0
                and page_size % pipeline.prompt_bucket != 0
            ):
                page_size = pipeline.prompt_bucket  # keep admission page-aligned
            # admission rounds prompts up to max(prompt_bucket, page_size), so
            # size the table for the rounded prompt region plus the budget
            prompt_cap = pipeline.prompt_bucket * 4
            prompt_cap = -(-prompt_cap // page_size) * page_size
            pages_per_slot = (
                prompt_cap // page_size + -(-self.default_max_new // page_size) + 1
            )
            # default pool: half the dense worst case.  Admission reserves
            # worst-case pages per request (AdmissionDeferred backpressure),
            # so a half pool trades peak concurrency for memory SAFELY —
            # requests queue instead of failing mid-decode.
            n_pages = n_pages or (max_slots * pages_per_slot // 2 + 1)
            self.engine = PagedContinuousEngine(
                pipeline.llm_params,
                pipeline.config.llm,
                max_slots=max_slots,
                n_pages=n_pages,
                page_size=page_size,
                pages_per_slot=pages_per_slot,
                **common,
            )
        else:
            from sparktts_tpu.lm.continuous import ContinuousBatchingEngine

            self.engine = ContinuousBatchingEngine(
                pipeline.llm_params,
                pipeline.config.llm,
                max_slots=max_slots,
                cache_len=cache_len,
                mesh=pipeline.mesh,
                **common,
            )
        self.waiting: asyncio.Queue = asyncio.Queue()
        self._deferred: deque = deque()  # backpressured admissions, retried first
        self.inflight: Dict[int, _Pending] = {}
        # per-slot decode steps dispatched but not yet committed (the
        # pipelined dispatch window's ledger): sizing/spec read
        # budget - planned and loop_tokens + planned
        self._planned_ahead = [0] * max_slots
        self._task: Optional[asyncio.Task] = None
        self._vocode_task: Optional[asyncio.Task] = None
        self._vocode_q: asyncio.Queue = asyncio.Queue()
        # cross-stream vocode batching: when one drain holds several windows
        # whose padded length matches, they run as ONE batched vocoder
        # program instead of per-stream calls — at high concurrency the
        # vocode worker is the first thing to saturate its decode-overlap
        # window, and batching trades b serial dispatches for one b-row MXU
        # pass.  Only ALREADY-COMPILED (b, t_pad) signatures are used (a cold
        # batch shape background-compiles while the drain falls back to the
        # scalar path), so live streams never stall on an XLA compile.
        self.vocode_batch = vocode_batch
        # Cross-drain first-chunk-priority vocode scheduling (defer-split in
        # _vocode_loop).  Default OFF: measured A/B at conc 8/16
        # (BENCH_SCALE_r04.json) shows deferring steady-state jobs sacrifices
        # cross-stream vocode batching on the saturated device — neutral at
        # conc 8, and at conc 16 it made first-chunk P50 1.7× WORSE (2990 ms
        # vs 1763 ms).  Within-drain prioritization (first-audio windows
        # vocode first, per-job delivery, _run_vocode_jobs) plus speculative
        # inline first chunks carry the QoS instead.  SPARKTTS_VOCODE_DEFER=1
        # re-enables for measurement.
        self.first_chunk_priority = bool(os.environ.get("SPARKTTS_VOCODE_DEFER"))
        self._voc_batch_sizes = [
            b for b in VOCODE_BATCH_LADDER if b <= max(max_slots, 2)
        ]
        # dedicated thread so vocoding overlaps the next decode dispatch
        self._vocode_pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="vocode")
        # dedicated thread for the blocking decode fetch — a concurrent
        # future we can still .result() synchronously when the loop task is
        # cancelled mid-step (commit-on-cancel below)
        self._fetch_pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="fetch")
        self.stage_stats = StageStats()
        self.stats = {"requests": 0, "completed": 0, "admitted_midflight": 0, "deferrals": 0}
        if paged:
            # live page-pool gauges (KV memory follows load, not slot count)
            self.stats["pages_in_use"] = 0
            self.stats["pages_free"] = len(self.engine.free_pages)

    async def start(self):
        if self._vocode_pool._shutdown:  # restarted after stop()
            self._vocode_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="vocode"
            )
        if self._fetch_pool._shutdown:
            self._fetch_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="fetch"
            )
        if self._task is None:
            self._task = asyncio.create_task(self._loop())
        if self._vocode_task is None:
            self._vocode_task = asyncio.create_task(self._vocode_loop())

    async def stop(self):
        for attr in ("_task", "_vocode_task"):
            task = getattr(self, attr)
            if task is not None:
                task.cancel()
                try:
                    await task
                except asyncio.CancelledError:
                    pass
                setattr(self, attr, None)
        # release the worker threads (servers are constructed per bench
        # run — leaked threads would pin their pipelines for the process life)
        self._vocode_pool.shutdown(wait=False)
        self._fetch_pool.shutdown(wait=False)

    async def synthesize(
        self,
        text: str,
        prompt_wav: Optional[np.ndarray] = None,
        prompt_text: Optional[str] = None,
        gender: Optional[str] = None,
        pitch: Optional[str] = None,
        speed: Optional[str] = None,
        max_new_tokens: Optional[int] = None,
        temperature: Optional[float] = None,
        top_p: Optional[float] = None,
        speaker_globals: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        fut = asyncio.get_running_loop().create_future()
        self.stats["requests"] += 1
        await self.waiting.put(
            _Pending(
                text=text,
                prompt_wav=prompt_wav,
                prompt_text=prompt_text,
                gender=gender,
                pitch=pitch,
                speed=speed,
                max_new_tokens=max_new_tokens or self.default_max_new,
                future=fut,
                temperature=temperature,
                top_p=top_p,
                speaker_globals=speaker_globals,
            )
        )
        return await fut

    async def synthesize_streaming(
        self,
        text: str,
        prompt_wav: Optional[np.ndarray] = None,
        prompt_text: Optional[str] = None,
        gender: Optional[str] = None,
        pitch: Optional[str] = None,
        speed: Optional[str] = None,
        max_new_tokens: Optional[int] = None,
        temperature: Optional[float] = None,
        top_p: Optional[float] = None,
        speaker_globals: Optional[np.ndarray] = None,
    ) -> AsyncIterator[np.ndarray]:
        """Async generator of waveform chunks (growing-chunk schedule,
        reference `spark_tts/1/model.py:347-385`) while the request shares the
        continuous decode batch with everything else.  Per-request
        temperature/top_p are honored per decode slot; top_k and the rng seed
        are engine-wide (shared batch, one rng stream).
        """
        pending = self._make_stream_pending(
            text=text,
            prompt_wav=prompt_wav,
            prompt_text=prompt_text,
            gender=gender,
            pitch=pitch,
            speed=speed,
            max_new_tokens=max_new_tokens,
            temperature=temperature,
            top_p=top_p,
            speaker_globals=speaker_globals,
        )
        async for chunk in self._drain_stream(pending):
            yield chunk

    def _make_stream_pending(self, max_new_tokens=None, **kw) -> _Pending:
        from sparktts_tpu.serve.streaming import chunk_sizes

        schedule = chunk_sizes(self.pipe.config.streaming)
        first = next(schedule)
        return _Pending(
            future=asyncio.get_running_loop().create_future(),
            chunk_queue=asyncio.Queue(),
            stream_target=first,
            first_target=first,
            stream_schedule=schedule,
            max_new_tokens=max_new_tokens or self.default_max_new,
            **kw,
        )

    async def _drain_stream(self, pending: _Pending) -> AsyncIterator[np.ndarray]:
        """Submit a streaming pending and yield its chunks until completion."""
        fut, q = pending.future, pending.chunk_queue
        self.stats["requests"] += 1
        await self.waiting.put(pending)
        try:
            while True:
                chunk = await q.get()
                if chunk is None:
                    break
                yield chunk
        except (GeneratorExit, asyncio.CancelledError):
            # consumer closed the stream early (HTTP client dropped, or a
            # bridging task was cancelled on gRPC disconnect): mark the
            # request so the loop frees its decode slot
            pending.cancelled = True
            raise
        # surface admission/engine failures to the consumer (the future is
        # otherwise never awaited on the streaming path)
        if fut.done() and not fut.cancelled() and fut.exception() is not None:
            raise fut.exception()

    async def synthesize_streaming_long(
        self,
        text: str,
        prompt_wav: Optional[np.ndarray] = None,
        prompt_text: Optional[str] = None,
        gender: Optional[str] = None,
        pitch: Optional[str] = None,
        speed: Optional[str] = None,
        max_new_tokens: Optional[int] = None,
        temperature: Optional[float] = None,
        top_p: Optional[float] = None,
        max_segment_chars: int = 400,
        inter_segment_silence_s: float = 0.1,
    ) -> AsyncIterator[np.ndarray]:
        """Longform streaming: sentence-split the text (`utils/textseg.py`),
        stream the segments back-to-back with ONE stable voice.  The first
        segment establishes the speaker identity (tokenized prompt globals
        for clone, LLM-emitted globals for control); every later segment
        admits as a globals-only clone prompt — no audio re-tokenization, no
        voice drift (role the reference lacks: it truncates at the token
        budget).  Segments share the continuous decode batch like any other
        request, so concurrent longform streams interleave per step."""
        from sparktts_tpu.utils.textseg import pack_segments

        segments = pack_segments(text, max_segment_chars)
        gap = np.zeros(
            int(self.pipe.sample_rate * max(inter_segment_silence_s, 0.0)),
            np.float32,
        )
        speaker_globals: Optional[np.ndarray] = None

        def continuation(segment: str) -> _Pending:
            return self._make_stream_pending(
                text=segment,
                prompt_wav=None,
                prompt_text=None,
                gender=None,
                pitch=None,
                speed=None,
                max_new_tokens=max_new_tokens,
                temperature=temperature,
                top_p=top_p,
                speaker_globals=speaker_globals,
            )

        pending = self._make_stream_pending(
            text=segments[0],
            prompt_wav=prompt_wav,
            prompt_text=prompt_text,
            gender=gender,
            pitch=pitch,
            speed=speed,
            max_new_tokens=max_new_tokens,
            temperature=temperature,
            top_p=top_p,
        )
        self.stats["requests"] += 1
        await self.waiting.put(pending)
        # Segments OVERLAP: segment i+1 is admitted as soon as the speaker
        # identity is known (clone: at segment 0's admission; control: with
        # its first chunk), so its prefill+decode share the continuous batch
        # while segment i's tail still renders — by the time i finishes, i+1
        # holds buffered audio and the segment boundary costs ~nothing
        # (VERDICT r04 item 5: sequential segments made longform RTF 1.3×
        # the plain streaming RTF).  Chunks still YIELD strictly in segment
        # order; i+1's early chunks simply wait in its queue.
        for i, segment in enumerate(segments):
            next_pending: Optional[_Pending] = None
            q = pending.chunk_queue
            try:
                while True:
                    chunk = await q.get()
                    if chunk is None:
                        break
                    if (
                        next_pending is None
                        and i + 1 < len(segments)
                        and pending.global_tokens is not None
                    ):
                        if speaker_globals is None:
                            # one host fetch per longform request (clone
                            # admissions hold the globals as a device array)
                            speaker_globals = np.asarray(
                                pending.global_tokens, np.int32
                            ).reshape(1, -1)
                        next_pending = continuation(segments[i + 1])
                        self.stats["requests"] += 1
                        await self.waiting.put(next_pending)
                    yield chunk
            except (GeneratorExit, asyncio.CancelledError):
                pending.cancelled = True
                if next_pending is not None:
                    next_pending.cancelled = True
                raise
            fut = pending.future
            if fut.done() and not fut.cancelled() and fut.exception() is not None:
                if next_pending is not None:
                    next_pending.cancelled = True
                raise fut.exception()
            self.stats["longform_segments"] = (
                self.stats.get("longform_segments", 0) + 1
            )
            if speaker_globals is None and pending.global_tokens is not None:
                speaker_globals = np.asarray(
                    pending.global_tokens, np.int32
                ).reshape(1, -1)
            if i + 1 < len(segments):
                if next_pending is None:  # zero-chunk segment: admit now
                    next_pending = continuation(segments[i + 1])
                    self.stats["requests"] += 1
                    await self.waiting.put(next_pending)
                if gap.size:
                    yield gap
                pending = next_pending

    async def synthesize_long(self, **kw) -> np.ndarray:
        """Offline longform: collect `synthesize_streaming_long` chunks."""
        parts = [c async for c in self.synthesize_streaming_long(**kw)]
        return np.concatenate(parts) if parts else np.zeros(0, np.float32)

    # ------------------------------------------------------------------

    def _plan_stream_chunks(self, pending: _Pending, new_tokens: np.ndarray, final: bool):
        """Advance a stream's chunk-schedule bookkeeping and return the vocode
        windows it is now due, WITHOUT vocoding (worker thread).  Each window
        is (start, emitted, upto, render): vocode stream_buf[start:render]
        and emit the samples in [emitted, upto) (render > upto only for
        split windows, whose look-ahead past the cut keeps the split
        invisible in the output).  start = emitted - stream_ctx rounded DOWN
        to a vocode bucket — stream_ctx covers the codec's receptive field
        and keeping (upto - start) ≡ upto (mod bucket) makes detokenize's
        edge-replicate right pad identical to the full-prefix call's, so the
        emitted tail is bit-equal to a full-prefix recompute at
        O(chunk + ctx) cost."""
        tok = self.pipe.tokenizer
        if pending.global_tokens is None:
            pending.raw_buf.extend(np.asarray(new_tokens).tolist())
        sem = extract_semantic_ids(tok, new_tokens)
        pending.stream_buf.extend(sem.tolist())
        total = pending.stream_base + len(pending.stream_buf)
        windows = []

        def plan(upto: int):
            """Plan window(s) advancing emission to `upto`, splitting so no
            single window EMITS more than max_vocode_window tokens past its
            context start.  A split cut is an internal boundary the uncapped
            plan would not have, so the piece renders stream_ctx tokens of
            LOOK-AHEAD past its cut (bounded by `upto`, where the uncapped
            window itself edge-pads) and emits only up to the cut — the
            emitted samples are bit-equal to the unsplit window.  Window
            token spans are therefore ≤ max_vocode_window + stream_ctx, a
            CLOSED shape set warmup enumerates (see __init__)."""
            while True:
                start = max(pending.stream_emitted - self.stream_ctx, 0)
                start -= start % self.pipe.vocode_bucket
                cut = min(upto, start + self.max_vocode_window)
                render = min(cut + self.stream_ctx, upto)
                windows.append((start, pending.stream_emitted, cut, render))
                pending.stream_emitted = cut
                if cut >= upto:
                    return
                self.stats["vocode_split_windows"] = (
                    self.stats.get("vocode_split_windows", 0) + 1
                )

        while total >= pending.stream_emitted + pending.stream_target:
            plan(pending.stream_emitted + pending.stream_target)
            pending.stream_target = next(pending.stream_schedule)
        if final and total > pending.stream_emitted:
            plan(total)
        if windows and pending.global_tokens is None:
            # controllable mode: the LLM emits the speaker identity itself.
            # Extract from the FULL raw stream — the globals may have arrived
            # in an earlier increment than the one that triggered this chunk.
            pending.global_tokens = self._speaker_tokens(
                np.asarray(pending.raw_buf, np.int32)
            )
            pending.raw_buf.clear()
        return windows

    def _trim_stream_buf(self, pending: _Pending):
        """Drop stream_buf's dead prefix (vocode worker thread, after the
        current windows' slices are materialized): future windows start at or
        after bucket-aligned stream_emitted - stream_ctx, so a long-lived
        stream holds O(ctx) host memory instead of O(stream length)."""
        keep = max(pending.stream_emitted - self.stream_ctx, 0)
        keep -= keep % self.pipe.vocode_bucket
        if keep > pending.stream_base:
            del pending.stream_buf[: keep - pending.stream_base]
            pending.stream_base = keep

    def _speaker_tokens(self, tokens: np.ndarray) -> np.ndarray:
        """(1, token_num) global speaker ids extracted from an emitted token
        stream (controllable mode — reference `cli/SparkTTS.py:222-228`)."""
        from sparktts_tpu.prompt import padded_global_tokens

        return padded_global_tokens(
            self.pipe.tokenizer, tokens,
            self.pipe.config.bicodec.speaker_encoder.token_num,
        )

    def _glob_np(self, pending: _Pending) -> np.ndarray:
        """Pending's global tokens as a host (1, N) int32 array, fetched once
        and cached on the pending.  Called ONLY when a window actually joins
        a cross-stream batched group (np.concatenate needs host rows) — the
        scalar path hands `pipe.detokenize` the tokens as-is, so
        device-chained admissions stay device-resident and a new stream's
        first chunk never pays a blocking device→host relay round-trip."""
        g = np.asarray(pending.global_tokens, np.int32).reshape(1, -1)
        pending.global_tokens = g
        return g

    def _run_vocode_jobs(self, jobs: list, deliver=None) -> list:
        """Execute one drain's vocode work (worker thread): plan every job's
        windows, then batch same-padded-length windows ACROSS streams into
        single vocoder programs.  Returns per-job result dicts aligned with
        `jobs`; errors are contained per job (a failed batch falls back to
        per-window scalar calls so one poisoned request cannot fail its
        batch neighbors).

        Each job's result is handed to `deliver` (if given) the moment its
        last window lands — not after the whole drain — and first-audio jobs
        (streams that have emitted nothing yet) are vocoded first, so a new
        stream's first chunk never waits out the steady-state backlog."""
        up = self.pipe._wave_upsample
        bucket = self.pipe.vocode_bucket
        results, work, prio = [], [], []
        for i, (pending, tokens, final, offline) in enumerate(jobs):
            res = {
                "pending": pending, "offline": offline, "final": final,
                "chunks": [], "wav": None, "error": None, "n_windows": 0,
            }
            results.append(res)
            prio.append(
                0 if (not offline and pending.chunk_queue is not None
                      and pending.stream_emitted == 0) else 1
            )
            try:
                if offline:
                    sem = extract_semantic_ids(self.pipe.tokenizer, tokens)
                    if pending.gender is not None:
                        pending.global_tokens = self._speaker_tokens(tokens)
                    if sem.size == 0:
                        res["wav"] = np.zeros(0, np.float32)
                        continue
                    res["n_windows"] = 1
                    work.append(
                        (i, 0, sem.astype(np.int32), pending, 0, sem.size * up)
                    )
                else:
                    windows = self._plan_stream_chunks(pending, tokens, final)
                    res["n_windows"] = len(windows)
                    base = pending.stream_base
                    for k, (start, emitted, upto, render) in enumerate(windows):
                        # render [start, render) — split windows carry
                        # look-ahead past their cut — but emit [emitted, upto)
                        sem = np.asarray(
                            pending.stream_buf[start - base : render - base],
                            np.int32,
                        )
                        work.append(
                            (i, k, sem, pending,
                             (emitted - start) * up, (upto - start) * up)
                        )
                    self._trim_stream_buf(pending)
            except Exception as e:
                res["error"] = e

        out: Dict[tuple, np.ndarray] = {}
        done: set = set()

        def finish(i: int):
            if i in done:
                return
            done.add(i)
            res = results[i]
            if res["error"] is None and res["n_windows"]:
                try:
                    parts = [out[(i, k)] for k in range(res["n_windows"])]
                except KeyError as e:  # a scalar fallback also failed
                    res["error"] = e
                else:
                    if res["offline"]:
                        res["wav"] = parts[0]
                    else:
                        res["chunks"] = parts
            if deliver is not None:
                try:
                    deliver(res)
                except Exception:
                    # call_soon_threadsafe raises on a loop closed by a
                    # concurrent stop(); the drain must still finish its
                    # other jobs rather than kill the worker
                    logger.exception("vocode result delivery failed")

        # nothing to vocode (planning error, or empty) → deliver immediately
        for i, res in enumerate(results):
            if res["error"] is not None or res["n_windows"] == 0:
                finish(i)

        # group windows by padded length; each group runs in batched slices
        # of an already-warm (b, t_pad) signature, scalar otherwise.  Groups
        # holding a first-audio window go first, and within a group
        # first-audio windows sort to the front (stable — per-job window
        # order is irrelevant: output is keyed by (job, window index)).
        groups: Dict[int, list] = {}
        seen = _voc_state(self.pipe)["sizes_seen"]
        remaining = [r["n_windows"] for r in results]
        for w in work:
            seen.add(max(w[2].size, 1))
            t_pad = -(-max(w[2].size, 1) // bucket) * bucket
            groups.setdefault(t_pad, []).append(w)
        ordered = sorted(
            groups.items(), key=lambda kv: (min(prio[w[0]] for w in kv[1]), kv[0])
        )
        try:
            for t_pad, ws in ordered:
                ws.sort(key=lambda w: prio[w[0]])
                idx = 0
                while idx < len(ws):
                    n = len(ws) - idx
                    b = self._pick_vocode_batch(n, t_pad) if self.vocode_batch else None
                    take = ws[idx : idx + (min(b, n) if b else 1)]
                    idx += len(take)
                    if b and len(take) >= 2:
                        try:
                            self._vocode_group(take, b, out)
                        except Exception:
                            logger.exception("batched vocode failed; scalar fallback")
                            for w in take:
                                try:
                                    self._vocode_scalar(w, out)
                                except Exception as e2:
                                    if results[w[0]]["error"] is None:
                                        results[w[0]]["error"] = e2
                    else:
                        try:
                            self._vocode_scalar(take[0], out)
                        except Exception as e:
                            if results[take[0][0]]["error"] is None:
                                results[take[0][0]]["error"] = e
                    for w in take:
                        remaining[w[0]] -= 1
                        if remaining[w[0]] <= 0 or results[w[0]]["error"] is not None:
                            finish(w[0])
        except Exception as e:
            # code OUTSIDE the per-item guards can raise (e.g. the warm
            # daemon's Thread.start under thread pressure) — contain it here:
            # an escape would kill _vocode_task and hang every later request
            logger.exception("vocode drain failed; failing its pending jobs")
            for i, res in enumerate(results):
                if i not in done and res["error"] is None:
                    res["error"] = e

        for i in range(len(results)):  # catch-all; no-op when all delivered
            finish(i)
        return results

    def _vocode_scalar(self, w, out: Dict[tuple, np.ndarray]):
        job, order, sem, pending, lo, hi = w
        t0 = time.perf_counter()
        # global tokens pass through as-is: pipe.detokenize keeps a
        # device-resident jax.Array on device (no host sync on this path)
        wav = self.pipe.detokenize(pending.global_tokens, sem[None, :])
        self.stage_stats.record("vocode", time.perf_counter() - t0)
        out[(job, order)] = wav[lo:hi]

    def _vocode_group(self, take: list, b: int, out: Dict[tuple, np.ndarray]):
        """One batched vocoder call for `take` (same padded length), padded
        with duplicate rows up to the warm batch size `b`."""
        pad = b - len(take)
        sems = [w[2] for w in take] + [take[-1][2]] * pad
        globs = np.concatenate(
            [self._glob_np(w[3]) for w in take]
            + [self._glob_np(take[-1][3])] * pad,
            axis=0,
        )
        t0 = time.perf_counter()
        wavs = self.pipe.detokenize_batch(globs, sems)
        self.stage_stats.record("vocode", time.perf_counter() - t0)
        for w, wav in zip(take, wavs):
            out[(w[0], w[1])] = wav[w[4] : w[5]]
        self.stats["vocode_batched_calls"] = self.stats.get("vocode_batched_calls", 0) + 1
        self.stats["vocode_batched_rows"] = (
            self.stats.get("vocode_batched_rows", 0) + len(take)
        )

    def _pick_vocode_batch(self, n: int, t_pad: int) -> Optional[int]:
        """Largest useful ALREADY-WARM batch size for `n` same-shape windows.
        Prefers the smallest warm size covering all n (≤ n-1 duplicate pad
        rows); else the largest warm size below n (the remainder loops).  A
        cold but wanted signature starts compiling on a daemon thread — this
        drain stays scalar, a later one batches."""
        if n < 2 or not self._voc_batch_sizes:
            return None
        warm_set = _voc_state(self.pipe)["warm"]
        warm = [b for b in self._voc_batch_sizes if (b, t_pad) in warm_set]
        want = next((b for b in self._voc_batch_sizes if b >= n), self._voc_batch_sizes[-1])
        cover = [b for b in warm if b >= n]
        if cover:
            # an oversized warm batch covers n, but keep compiling the TIGHT
            # size in the background — without this, one congested drain that
            # warmed (say) 8 leaves every later n=2 drain running 4× the MXU
            # rows forever (the early return would never warm the small size)
            if cover[0] != want:
                self._warm_vocode_batch_bg(want, t_pad)
            return cover[0]
        self._warm_vocode_batch_bg(want, t_pad)
        return warm[-1] if warm else None

    def _warm_vocode_batch_bg(self, b: int, t_pad: int):
        st = _voc_state(self.pipe)
        key = (b, t_pad)
        if key in st["warm"] or key in st["warming"]:
            return
        st["warming"].add(key)

        def go():
            try:
                warm_vocode_batch(self.pipe, b, t_pad)
            except Exception:
                logger.exception("vocode batch warm (%d, %d) failed", b, t_pad)
            finally:
                st["warming"].discard(key)

        threading.Thread(target=go, daemon=True, name=f"voc-warm-{b}x{t_pad}").start()

    def _drain_vocode_jobs(self, first_item, backlog=()) -> list:
        """Turn everything currently queued into an ordered job list:

        * consecutive increments of the SAME stream coalesce into one job
          (one detokenize instead of one per decode dispatch — when the
          vocode worker falls behind the decode loop, the backlog collapses
          instead of compounding);
        * jobs whose stream has emitted NOTHING yet sort first — under load
          the first chunk of a new stream must not queue behind steady-state
          chunks of established streams (those listeners already hold
          buffered audio; the new one is still waiting for first audio).

        Per-stream order is preserved: a stream gets at most one job per
        drain, and the sort is stable.  Offline jobs are never merged.
        `backlog` holds jobs the previous cycle deferred in favor of
        first-audio work (see _vocode_loop); they rejoin FIRST so a deferred
        stream's tokens stay ordered ahead of its newly queued increments."""
        items = list(backlog)
        if first_item is not None:
            items.append(first_item)
        while True:
            try:
                items.append(self._vocode_q.get_nowait())
            except asyncio.QueueEmpty:
                break
        jobs: list = []  # [pending, tokens, final, offline]
        stream_job: Dict[int, int] = {}  # id(pending) → index in jobs
        for pending, tokens, final, offline in items:
            if pending.cancelled:
                continue
            j = stream_job.get(id(pending))
            if offline or pending.chunk_queue is None or j is None:
                if not offline and pending.chunk_queue is not None:
                    stream_job[id(pending)] = len(jobs)
                jobs.append([pending, np.asarray(tokens, np.int32), final, offline])
                continue
            merged = jobs[j]
            merged[1] = np.concatenate([merged[1], np.asarray(tokens, np.int32)])
            merged[2] = merged[2] or final
            self.stats["vocode_merged"] = self.stats.get("vocode_merged", 0) + 1
        jobs.sort(
            key=lambda job: 0
            if (not job[3] and job[0].chunk_queue is not None and job[0].stream_emitted == 0)
            else 1
        )
        return jobs

    async def _vocode_loop(self):
        """Drains vocode work on a dedicated thread so the codec renders the
        previous chunk WHILE the LM engine decodes the next micro-batch (the
        reference overlaps these via separate Triton model instances,
        SURVEY.md §3.5)."""
        loop = asyncio.get_running_loop()

        def deliver(res):  # worker thread → loop thread per completed job
            loop.call_soon_threadsafe(self._push_vocode_result, res)

        # First-chunk-priority scheduling (VERDICT r03 item 4): when a drain
        # holds both a new stream's FIRST chunk and steady-state chunks of
        # established streams, vocode only the first-audio jobs now and defer
        # the rest one cycle — under saturation (conc 8/16) the single device
        # is the contended resource, and a first chunk queued behind a full
        # steady-state drain is exactly the conc-16 P50 collapse.  Each job is
        # deferred at most once (`deferred` ids): established listeners hold
        # buffered audio so one cycle of favoritism is safe, but unbounded
        # deferral would underrun them.
        backlog: list = []
        deferred: set = set()
        while True:
            first = None if backlog else await self._vocode_q.get()
            jobs = self._drain_vocode_jobs(first, backlog)
            backlog = []
            if not jobs:
                continue
            if self.first_chunk_priority:
                jobs, backlog, deferred = _split_first_audio(jobs, deferred)
                if backlog:
                    self.stats["vocode_deferrals"] = (
                        self.stats.get("vocode_deferrals", 0) + len(backlog)
                    )
            # each job is delivered (call_soon_threadsafe) as its last window
            # lands — awaiting the executor only paces the drain loop
            try:
                await loop.run_in_executor(
                    self._vocode_pool, self._run_vocode_jobs, jobs, deliver
                )
            except Exception as e:
                # submit on a shut-down pool (stop/restart race) or any
                # escape _run_vocode_jobs' containment missed: fail THESE
                # jobs (idempotent — _fail_pending guards done futures) but
                # keep the vocode task alive for the next drain
                logger.exception("vocode drain dispatch failed")
                self.stats["failures"] = self.stats.get("failures", 0) + 1
                for pending, *_ in jobs:
                    self._fail_pending(pending, e)

    def _push_vocode_result(self, res):
        """Hand one vocoded job to its consumer (loop thread — chunk queues
        and futures are not thread-safe)."""
        pending = res["pending"]
        if res["error"] is not None:
            logger.error("vocode failed", exc_info=res["error"])
            self.stats["failures"] = self.stats.get("failures", 0) + 1
            self._fail_pending(pending, res["error"])
            return
        if res["offline"]:
            self.stats["completed"] += 1
            if not pending.future.done():
                pending.future.set_result(res["wav"])
        else:
            for c in res["chunks"]:
                pending.chunk_queue.put_nowait(c)
            if res["final"]:
                pending.chunk_queue.put_nowait(None)
                self.stats["completed"] += 1
                if not pending.future.done():
                    pending.future.set_result(np.zeros(0, np.float32))

    def _slot_capacity(self) -> int:
        """Tokens one slot can hold (prompt + generation), engine-agnostic."""
        cap = getattr(self.engine, "cache_len", None)
        if cap is None:  # paged engine: page-table bound per slot
            cap = self.engine.pages_per_slot * self.engine.page_size
        return cap

    def _check_fits(self, t_pad: int, pending: _Pending):
        """Reject never-fitting requests BEFORE any warm/compile/submit with
        a clean error (waiting cannot help — this is not backpressure)."""
        cap = self._slot_capacity()
        if t_pad + pending.max_new_tokens > cap:
            raise RequestTooLong(
                f"prompt ({t_pad} padded ids) + max_new_tokens "
                f"({pending.max_new_tokens}) exceeds the engine's per-slot "
                f"capacity of {cap} tokens — shorten the prompt/transcript "
                f"or lower max_new_tokens"
            )

    def _clone_scaffold(self, n_glob: int, use_sem: int, pending: _Pending):
        """Bucket-padded clone prompt scaffold — the ONE construction both
        the fused and chained admission paths share, so their prefilled
        prompts stay byte-identical by design."""
        tok = self.pipe.tokenizer
        bucket = getattr(self.engine, "_admit_bucket", self.engine.prompt_pad)
        scaffold, prompt_len, g_off, s_off = clone_prompt_scaffold(
            tok, pending.text, n_glob, use_sem, pending.prompt_text
        )
        t_pad = -(-prompt_len // bucket) * bucket
        scaffold = np.pad(scaffold, (0, t_pad - prompt_len), constant_values=tok.pad_id)
        return scaffold, prompt_len, g_off, s_off, t_pad

    def _start_warm(self, key, thunk):
        """Kick an off-loop compile of an admission executable for a
        first-seen shape signature; at most one warm thread per signature."""
        if key in self._fused_warming:
            return
        self._fused_warming.add(key)

        def warm():
            try:
                thunk()
            except Exception:
                logger.exception("admission warm failed for %s", key)
            finally:
                self._fused_warming.discard(key)

        threading.Thread(target=warm, name="fused-warm", daemon=True).start()

    def _start_fused_warm(self, fn, assemble_fn, tok_args, t_pad):
        self._start_warm(
            self.engine.fused_key(tok_args, t_pad),
            lambda: self.engine.warm_fused(fn, assemble_fn, tok_args, t_pad),
        )

    def _admit(self, pending: _Pending) -> Optional[int]:
        # time spent queued, not including the admission prefill itself
        self.stage_stats.record("queue_wait", time.perf_counter() - pending.enqueue_time)
        tok = self.pipe.tokenizer
        prompt_len = None
        if pending.speaker_globals is not None:
            # longform continuation: voice identity is already known — build
            # a globals-only clone prompt (no audio tokenization at all)
            g = np.asarray(pending.speaker_globals, np.int32).reshape(1, -1)
            pending.global_tokens = g
            ids = build_clone_prompt(tok, pending.text, g)
            mode = "clone"
        elif pending.gender is not None:
            ids = build_control_prompt(tok, pending.text, pending.gender, pending.pitch, pending.speed)
            mode = "control"
        elif self.device_admission:
            vkey = self.pipe.voice_cache_key(pending.prompt_wav)
            cached = self.pipe.voice_cache_get(vkey)
            use_fused = self.fused_admission and hasattr(self.engine, "submit_fused")
            if cached is not None:
                # voice-cache hit: the codec tokens are already on device —
                # the whole audio-tokenize stack is skipped.  On the dense
                # engine the admission is ONE dispatch (assembly + prefill,
                # admit_prefill_assembled); engines without it (paged) take
                # the zero-sync chained path below with the cached tokens.
                g_dev, s_dev, n_sem_true = cached
                use_sem = n_sem_true if pending.prompt_text is not None else 0
                scaffold, prompt_len, g_off, s_off, t_pad = self._clone_scaffold(
                    g_dev.shape[1], use_sem, pending
                )
                self._check_fits(t_pad, pending)
                if hasattr(self.engine, "submit_assembled"):
                    assemble_fn = self.pipe._assemble_fn_batch(t_pad, s_dev.shape[1])
                    if not self.engine.assembled_ready(g_dev, s_dev, t_pad):
                        if self.fused_warm == "sync":
                            self.engine.warm_assembled(assemble_fn, g_dev, s_dev, t_pad)
                        else:
                            self._start_warm(
                                self.engine.assembled_key(g_dev, s_dev, t_pad),
                                lambda: self.engine.warm_assembled(
                                    assemble_fn, g_dev, s_dev, t_pad
                                ),
                            )
                    if self.engine.assembled_ready(g_dev, s_dev, t_pad):
                        req_id = self.engine.submit_assembled(
                            assemble_fn,
                            g_dev,
                            s_dev,
                            scaffold,
                            g_off,
                            s_off,
                            use_sem,
                            prompt_len,
                            max_new_tokens=pending.max_new_tokens,
                            temperature=pending.temperature,
                            top_p=pending.top_p,
                        )
                        self.stats["voice_cache_admissions"] = (
                            self.stats.get("voice_cache_admissions", 0) + 1
                        )
                        pending.global_tokens = g_dev
                        self.inflight[req_id] = pending
                        return req_id
                # cold assembled signature (or paged engine): chained
                # admission reusing the cached device tokens
                pending.global_tokens = g_dev
                ids = self.pipe.assemble_clone_ids(
                    scaffold, g_dev, s_dev, g_off, s_off, use_sem
                )
                mode = "clone"
            elif use_fused:
                # fully-fused admission: tokenize + assembly + prefill in ONE
                # device dispatch (admit_prefill_fused) — each dispatch costs
                # a fixed ~33 ms through the relay, so this is ~66 ms off
                # first-audio latency vs the three-program chain below
                fn, tok_args, n_sem_true, s_pad = self.pipe.tokenize_host_prep(
                    pending.prompt_wav
                )
                use_sem = n_sem_true if pending.prompt_text is not None else 0
                n_glob = self.pipe.config.bicodec.speaker_encoder.token_num
                scaffold, prompt_len, g_off, s_off, t_pad = self._clone_scaffold(
                    n_glob, use_sem, pending
                )
                self._check_fits(t_pad, pending)
                assemble_fn = self.pipe._assemble_fn_batch(t_pad, s_pad)
                if not self.engine.fused_ready(tok_args, t_pad):
                    if self.fused_warm == "sync":
                        self.engine.warm_fused(fn, assemble_fn, tok_args, t_pad)
                    else:
                        # compile off-loop; THIS request takes the chained
                        # path below so live streams never stall on a compile
                        self._start_fused_warm(fn, assemble_fn, tok_args, t_pad)
                if self.engine.fused_ready(tok_args, t_pad):
                    req_id, g_dev, s_dev = self.engine.submit_fused(
                        fn,
                        assemble_fn,
                        tok_args,
                        scaffold,
                        g_off,
                        s_off,
                        use_sem,
                        prompt_len,
                        max_new_tokens=pending.max_new_tokens,
                        temperature=pending.temperature,
                        top_p=pending.top_p,
                    )
                    self.stats["fused_admissions"] = (
                        self.stats.get("fused_admissions", 0) + 1
                    )
                    self.pipe.voice_cache_put(vkey, (g_dev, s_dev, n_sem_true))
                    pending.global_tokens = g_dev
                    self.inflight[req_id] = pending
                    return req_id
                # cold signature: take the chained path REUSING the host prep
                # and scaffold already built (tokenize_fn(*tok_args) is
                # exactly the device half of tokenize_audio_device)
                s_dev, g_dev = fn(*tok_args)
                self.pipe.voice_cache_put(vkey, (g_dev, s_dev, n_sem_true))
            else:
                # zero-sync admission: codec tokens stay on device, the
                # prompt is assembled there (the audio-token COUNTS are
                # deterministic from the wav length), and prefill chains
                # straight on — the host never waits on the relay between
                # tokenize and prefill
                g_dev, s_dev, n_sem = self.pipe.tokenize_audio_device(
                    pending.prompt_wav, cache_key=vkey
                )
                use_sem = n_sem if pending.prompt_text is not None else 0
                scaffold, prompt_len, g_off, s_off, t_pad = self._clone_scaffold(
                    g_dev.shape[1], use_sem, pending
                )
                self._check_fits(t_pad, pending)
            pending.global_tokens = g_dev
            ids = self.pipe.assemble_clone_ids(scaffold, g_dev, s_dev, g_off, s_off, use_sem)
            mode = "clone"
        else:
            g, s = self.pipe.tokenize_audio(pending.prompt_wav)
            pending.global_tokens = g
            ids = build_clone_prompt(
                tok,
                pending.text,
                g,
                s if pending.prompt_text is not None else None,
                pending.prompt_text,
            )
            mode = "clone"
        if prompt_len is None:  # host-built id list (control / plain clone)
            bucket = getattr(self.engine, "_admit_bucket", self.engine.prompt_pad)
            self._check_fits(-(-len(ids) // bucket) * bucket, pending)
        req_id = self.engine.submit(
            ids,
            max_new_tokens=pending.max_new_tokens,
            mode=mode,
            temperature=pending.temperature,
            top_p=pending.top_p,
            prompt_len=prompt_len,
        )
        self.inflight[req_id] = pending
        return req_id

    def _finish(self, req_id: int, tokens: np.ndarray):
        pending = self.inflight.pop(req_id)
        if pending.chunk_queue is not None:
            self._vocode_q.put_nowait((pending, np.zeros(0, np.int32), True, False))
        else:
            self._vocode_q.put_nowait((pending, tokens, True, True))

    def _fail_pending(self, pending: "_Pending", exc: Exception):
        """Propagate a failure to a request whichever way it is waiting:
        offline consumers await the future; streaming consumers read the
        chunk queue (and re-raise the future's exception after the None
        sentinel).  The request is also marked cancelled so the loop's reap
        path frees its decode slot — without this a failed stream keeps
        decoding (and queueing vocode work) to budget end for nobody."""
        pending.cancelled = True
        if not pending.future.done():
            pending.future.set_exception(exc)
        if pending.chunk_queue is not None:
            pending.chunk_queue.put_nowait(None)

    def _requested_steps(self) -> int:
        """Size the next decode dispatch to the nearest FIRST-audio event:
        a streaming slot that has not yet covered its first chunk caps the
        dispatch at exactly that distance (first-chunk latency is the one
        boundary where waiting on extra tokens costs the listener); every
        other slot asks for its remaining budget — later chunks emit from
        whatever lands (the vocode worker pushes every completed chunk per
        increment), so fragmenting dispatches at every chunk boundary only
        multiplies the fixed per-dispatch cost.  With >1 active stream (or
        arrivals waiting) the result is additionally capped at the absolute
        `co_dispatch_cap` (64 steps) so a mid-dispatch admission never waits
        out a max-size dispatch; a LONE stream that had concurrent company
        within the last `arrival_window_s` keeps `anticipation_cap` — under
        closed-loop
        concurrency the next arrival lands moments after the previous
        request finishes, and an uncapped budget-length dispatch in that gap
        is exactly what a mid-flight admission then waits out.  Single-stream
        workloads never pay this: with no concurrent activity ever observed,
        the window never opens.  The engine snaps the result to its compiled
        ladder via snap_to_ladder — UP to the next rung only within the
        overshoot tolerance, otherwise DOWN (e.g. 84 → 64), so a first chunk
        slightly past a rung may span two dispatches rather than overshoot a
        big one."""
        need = None
        active = 0
        first_chunk_bound = False
        for slot, req in enumerate(self.engine.owner):
            if req is None:
                continue
            active += 1
            # remaining AFTER in-flight dispatches: a slot whose budget is
            # already fully covered by dispatched-but-uncommitted work needs
            # nothing from the next dispatch
            remaining = int(self.engine.budget[slot]) - self._planned_ahead[slot]
            if remaining <= 0:
                continue
            p = self.inflight.get(req)
            slot_first = False
            if p is not None and p.chunk_queue is not None:
                covered = p.loop_tokens + self._planned_ahead[slot]
                first_need = p.first_target
                if p.gender is not None:
                    # controllable mode emits its speaker identity first:
                    # ~token_num globals + start/end markers precede the
                    # first semantic token — the first chunk needs them too
                    token_num = self.pipe.config.bicodec.speaker_encoder.token_num
                    first_need += token_num + 2
                if covered < first_need:
                    slot_need = max(min(first_need - covered, remaining), 1)
                    slot_first = True
                else:
                    slot_need = remaining
            else:
                slot_need = remaining
            if need is None or slot_need < need:
                need, first_chunk_bound = slot_need, slot_first
            elif slot_need == need:
                first_chunk_bound = first_chunk_bound or slot_first
        if need is None:
            # every active slot's budget is covered by in-flight dispatches
            # (or nothing is active): no further ahead-dispatch is useful
            return None if active else self.steps
        if active > 1 or self._deferred or not self.waiting.empty():
            self._last_concurrent = time.perf_counter()
            need = min(need, self.co_dispatch_cap)
        elif time.perf_counter() - self._last_concurrent < self.arrival_window_s:
            need = min(need, self.anticipation_cap)
        elif first_chunk_bound:
            # a LONE pre-first-chunk stream: round UP to the covering ladder
            # rung (within 2× the need) so the first chunk — including
            # controllable mode's token_num+2 identity preamble — rides ONE
            # dispatch and stays speculative-chunk-eligible, instead of
            # snapping down and spanning two dispatch round-trips
            need = snap_to_ladder(need, self.steps, overshoot=need)
        return need

    def _plan_spec(self, n_dispatch: int):
        """Collect EVERY streaming slot whose FIRST chunk this dispatch fully
        covers, for speculative on-device chunk rendering: all their chunk
        vocodes are chained onto the decode dispatch as ONE batched vocoder
        program and fetched with the step result in a single transfer
        (engine.step_chained) — simultaneous admissions (bursty arrivals,
        high concurrency) each save a vocode dispatch round-trip.  First
        chunks only — later chunks' semantic prefix spans earlier dispatches
        and already overlaps decode on the vocode worker thread.

        Clone slots assume the first `target` emissions are semantic ids;
        CONTROLLABLE slots assume the trained emission layout
        (start_global marker, token_num globals, end marker, semantics —
        reference `cli/SparkTTS.py:222-228`) and read the speaker identity
        from the same dispatch on device.  Every row is validated against
        the fetched tokens at commit; a miss falls back to the normal path.

        Returns (entries, chain_fn) or None; each entry is
        (req_id, slot, target, sem_off, control)."""
        if not self.spec_first_chunk:
            return None
        tn = self.pipe.config.bicodec.speaker_encoder.token_num
        entries = []
        for slot, req in enumerate(self.engine.owner):
            if req is None:
                continue
            p = self.inflight.get(req)
            if (
                p is None or p.cancelled or p.chunk_queue is None
                or p.loop_increments  # an earlier increment exists (possibly
                                      # still queued for the vocode worker)
                or self._planned_ahead[slot]  # an in-flight dispatch already
                                      # covers (part of) this stream's head
            ):
                continue
            control = p.gender is not None
            if control:
                off = tn + 2  # start marker + globals + end marker first
            elif p.global_tokens is not None:
                off = 0
            else:
                continue
            target = p.stream_target
            if entries and target != entries[0][2]:
                continue  # one shared (batch, t_pad) program per chain
            budget = int(self.engine.budget[slot]) - self._planned_ahead[slot]
            if 0 < off + target <= min(n_dispatch, budget):
                entries.append((req, slot, target, off, control))
        if not entries:
            return None
        n_spec, batch = self._spec_batch(len(entries), entries[0][2], n_dispatch)
        if n_spec < 1:
            return None
        entries = entries[:n_spec]
        chain = self.pipe.spec_vocode_chain_multi(
            [
                (slot, target, off,
                 None if control else self.inflight[req].global_tokens)
                for req, slot, target, off, control in entries
            ],
            batch,
        )
        return entries, chain

    def _spec_batch(self, n: int, target: int, n_dispatch: int):
        """(n_spec, batch) for a chained spec of `n` eligible slots: how many
        to actually spec and the padded batch of the single chain program.
        Only ALREADY-COMPILED (batch, target, dispatch) chain signatures are
        used — a cold one would stall the decode dispatch chain on an XLA
        compile — so slots beyond the largest warm batch ride the normal
        vocode path while the wanted size compiles in the background
        ((0, 0) = no warm signature at all: skip speculation this dispatch)."""
        # register the spec window length as SEEN for the follow-up-chunk
        # drain shapes (spec'd first chunks never reach a vocode drain)
        _voc_state(self.pipe)["sizes_seen"].add(max(target, 1))
        t_pad = -(-max(target, 1) // self.pipe.vocode_bucket) * self.pipe.vocode_bucket
        warm_set = _voc_state(self.pipe).setdefault("spec_warm", set())
        sizes = [1] + [b for b in VOCODE_BATCH_LADDER if b <= max(self.engine.max_slots, 2)]
        warm = [b for b in sizes if (b, target, t_pad, n_dispatch) in warm_set]
        want = next((b for b in sizes if b >= n), sizes[-1])
        if (want, target, t_pad, n_dispatch) not in warm_set:
            if self.fused_warm == "sync":
                # steady-state measurement / test policy: compile inline
                # instead of racing a background warm against the run
                warm_spec_chain(
                    self.pipe, self.engine.max_slots, want, target, n_dispatch
                )
                warm.append(want)
            else:
                self._warm_spec_chain_bg(want, target, n_dispatch)
        cover = [b for b in warm if b >= n]
        if cover:
            return n, cover[0]
        if warm:
            return warm[-1], warm[-1]
        return 0, 0

    def _warm_spec_chain_bg(self, batch: int, target: int, n_dispatch: int):
        """Background-compile the speculative-chain program for this
        (batch, target, bucketed window, dispatch) signature; until it
        lands, first chunks ride the (already warm) normal vocode path."""
        st = _voc_state(self.pipe)
        t_pad = -(-max(target, 1) // self.pipe.vocode_bucket) * self.pipe.vocode_bucket
        key = (batch, target, t_pad, n_dispatch)
        warm_set = st.setdefault("spec_warm", set())
        warming = st.setdefault("spec_warming", set())
        if key in warm_set or key in warming:
            return
        warming.add(key)

        def go():
            try:
                warm_spec_chain(
                    self.pipe, self.engine.max_slots, batch, target, n_dispatch
                )
            except Exception:
                logger.exception("spec chain warm %s failed", key)
            finally:
                warming.discard(key)

        threading.Thread(target=go, daemon=True, name=f"spec-warm-{batch}x{target}").start()

    def _apply_specs(self, spec, chained: np.ndarray, increments) -> set:
        """Validate each speculative first chunk against the fetched tokens;
        on success push the pre-rendered wav and do the stream bookkeeping
        inline.  Returns the req ids consumed (the normal vocode path skips
        those increments).  A row misses when EOS fired inside its window —
        or, for a controllable stream, when the emission deviated from the
        trained layout — then its slice of the chained render is garbage and
        the normal path renders the valid prefix exactly."""
        entries, _ = spec
        tok = self.pipe.tokenizer
        tn = self.pipe.config.bicodec.speaker_encoder.token_num
        up = self.pipe._wave_upsample
        start_id = tok.token_id("<|start_global_token|>")
        end_id = tok.token_id("<|end_global_token|>")
        consumed: set = set()
        off_samp = 0
        for req_id, slot, target, off, control in entries:
            bits = chained[off_samp : off_samp + target * up]
            off_samp += target * up
            p = self.inflight.get(req_id)
            new = increments.get(req_id)
            if p is None or p.cancelled or new is None or len(new) < off + target:
                continue
            new = np.asarray(new)
            head = new[off : off + target]
            if not (
                (head >= tok.semantic_base)
                & (head < tok.semantic_base + tok.n_semantic)
            ).all():
                continue
            if control:
                globs = new[1 : 1 + tn]
                if not (
                    new[0] == start_id
                    and new[1 + tn] == end_id
                    and (
                        (globs >= tok.global_base)
                        & (globs < tok.global_base + tok.n_global)
                    ).all()
                ):
                    continue
                # the chained render used exactly these ids as the speaker
                p.global_tokens = (globs - tok.global_base).astype(np.int32)[None, :]
            wav = bits.view(np.float32).copy()
            # raw_buf stays empty: clone specs require global_tokens known,
            # and a validated control spec extracted them right here
            p.stream_buf.extend(extract_semantic_ids(tok, new).tolist())
            p.stream_emitted = target
            p.stream_target = next(p.stream_schedule)
            p.chunk_queue.put_nowait(wav)
            p.loop_increments += 1
            consumed.add(req_id)
            self.stats["spec_chunks"] = self.stats.get("spec_chunks", 0) + 1
            # the ladder-snapped dispatch may have over-covered the first
            # chunk: hand the (already-booked) remainder to the vocode worker
            # as an empty increment so any follow-up chunk it completes is
            # emitted NOW, exactly when the plain path would emit it
            if p.stream_base + len(p.stream_buf) >= p.stream_emitted + p.stream_target:
                self._vocode_q.put_nowait((p, np.zeros(0, np.int32), False, False))
        return consumed

    def _prep_cache_hit_row(self, pending: _Pending):
        """Voice-cache-hit clone admission prepared as a batched-admission
        row, or None when this pending doesn't qualify (miss, control mode,
        globals-only continuation, codec on another device).  Raising
        _check_fits errors propagate to the caller per pending."""
        if (
            pending.speaker_globals is not None
            or pending.gender is not None
            or not self.device_admission
        ):
            return None
        cached = self.pipe.voice_cache_get(self.pipe.voice_cache_key(pending.prompt_wav))
        if cached is None:
            return None
        g_dev, s_dev, n_sem_true = cached
        use_sem = n_sem_true if pending.prompt_text is not None else 0
        scaffold, prompt_len, g_off, s_off, t_pad = self._clone_scaffold(
            g_dev.shape[1], use_sem, pending
        )
        self._check_fits(t_pad, pending)
        return dict(
            global_t=g_dev,
            semantic=s_dev,
            scaffold=scaffold,
            g_off=g_off,
            s_off=s_off,
            n_sem=use_sem,
            prompt_len=prompt_len,
            max_new_tokens=pending.max_new_tokens,
            temperature=pending.temperature,
            top_p=pending.top_p,
        )

    def _prep_fused_row(self, pending: _Pending):
        """First-time (cache-miss) clone admission prepared as a batched
        fused-admission row, or None when it doesn't qualify."""
        if (
            pending.speaker_globals is not None
            or pending.gender is not None
            or not self.device_admission
            or not self.fused_admission
        ):
            return None
        vkey = self.pipe.voice_cache_key(pending.prompt_wav)
        fn, tok_args, n_sem_true, s_pad = self.pipe.tokenize_host_prep(
            pending.prompt_wav
        )
        use_sem = n_sem_true if pending.prompt_text is not None else 0
        n_glob = self.pipe.config.bicodec.speaker_encoder.token_num
        scaffold, prompt_len, g_off, s_off, t_pad = self._clone_scaffold(
            n_glob, use_sem, pending
        )
        self._check_fits(t_pad, pending)
        return dict(
            tok_args=tok_args,
            tokenize_fn=fn,
            s_pad=s_pad,
            n_sem_true=n_sem_true,
            vkey=vkey,
            scaffold=scaffold,
            g_off=g_off,
            s_off=s_off,
            n_sem=use_sem,
            prompt_len=prompt_len,
            max_new_tokens=pending.max_new_tokens,
            temperature=pending.temperature,
            top_p=pending.top_p,
        )

    def _admit_burst(self, pendings: list) -> list:
        """Admit a BURST of simultaneously-waiting requests as batched
        device programs (VERDICT r04 item 3: admission prefill is
        weight-streaming-bound, so a 16-stream burst's admission compute
        collapses ~B-fold when batched):

        * voice-cache-HIT clone groups sharing one (n_glob, S_pad, t_pad)
          signature → `submit_assembled_batch` (B assemblies + ONE prefill);
        * first-time clone groups sharing one (wav bucket, t_pad) signature
          → `submit_fused_batch` (batch audio tokenize + assembly + ONE
          prefill), with per-row voice-cache fills.

        Only ALREADY-COMPILED batch signatures are used outside
        fused_warm="sync" (cold ones start a background AOT warm and this
        burst falls back to the single path).  Returns the pendings NOT
        admitted here, in arrival order."""
        from sparktts_tpu.lm.continuous import ADMIT_BATCH_LADDER

        eng = self.engine
        if len(pendings) < 2 or not hasattr(eng, "submit_assembled_batch"):
            return pendings
        groups: Dict[tuple, list] = {}
        passthrough = {id(p) for p in pendings}
        for p in pendings:
            try:
                row = self._prep_cache_hit_row(p)
                kind = "asm"
                if row is None and not self.engine.mesh:
                    row = self._prep_fused_row(p)
                    kind = "fus"
            except Exception as e:
                self._fail_pending(p, e)
                passthrough.discard(id(p))
                continue
            if row is None:
                continue
            if kind == "asm":
                sig = (
                    "asm",
                    row["global_t"].shape[-1],
                    row["semantic"].shape[-1],
                    len(row["scaffold"]),
                )
            else:
                _, _, wav, mask, ref = row["tok_args"]
                sig = (
                    "fus", wav.shape[-1], mask.shape[-1], ref.shape[-1],
                    row["s_pad"], len(row["scaffold"]),
                )
            groups.setdefault(sig, []).append((p, row))
        busy = any(o is not None for o in eng.owner)
        for sig, items in groups.items():
            if len(items) < 2:
                continue
            b = next(
                (x for x in ADMIT_BATCH_LADDER if x >= len(items)),
                ADMIT_BATCH_LADDER[-1],
            )
            items = items[:b]
            rows = [row for _, row in items]
            t_pad = len(rows[0]["scaffold"])
            if sig[0] == "asm":
                asig = sig[1:]
                assemble_fn = self.pipe._assemble_fn_batch(t_pad, asig[1])
                ready = eng.assembled_batch_ready(b, *asig)
                warm_key = eng.assembled_batch_key(b, *asig)
                warm = lambda a=assemble_fn, b_=b, s=asig: (  # noqa: E731
                    eng.warm_assembled_batch(a, b_, *s)
                )
                submit = lambda: (  # noqa: E731
                    eng.submit_assembled_batch(assemble_fn, rows), None, None
                )
            else:
                assemble_fn = self.pipe._assemble_fn_batch(t_pad, rows[0]["s_pad"])
                tokenize_fn = rows[0]["tokenize_fn"]
                ready = eng.fused_batch_ready(b, rows[0]["tok_args"], t_pad)
                warm_key = eng.fused_batch_key(b, rows[0]["tok_args"], t_pad)
                warm = lambda tf=tokenize_fn, a=assemble_fn, b_=b, ta=rows[0]["tok_args"], tp=t_pad: (  # noqa: E731
                    eng.warm_fused_batch(tf, a, b_, ta, tp)
                )
                submit = lambda: eng.submit_fused_batch(tokenize_fn, assemble_fn, rows)  # noqa: E731
            if not ready:
                if self.fused_warm == "sync":
                    warm()
                else:
                    self._start_warm(warm_key, warm)
                    continue  # this burst rides the single path; next batches
            t0 = time.perf_counter()
            try:
                out = submit()
                req_ids, global_t, semantic = (
                    out if sig[0] == "fus" else (out[0], None, None)
                )
            except Exception as e:
                logger.exception("batched admission failed; failing its pendings")
                for p, _ in items:
                    self._fail_pending(p, e)
                    passthrough.discard(id(p))
                continue
            dt = time.perf_counter() - t0
            for i, ((p, row), req_id) in enumerate(zip(items, req_ids)):
                self.stage_stats.record("queue_wait", t0 - p.enqueue_time)
                self.stage_stats.record("admit_prefill", dt / len(items))
                if sig[0] == "asm":
                    p.global_tokens = row["global_t"]
                else:
                    g_row, s_row = global_t[i : i + 1], semantic[i : i + 1]
                    p.global_tokens = g_row
                    self.pipe.voice_cache_put(
                        row["vkey"], (g_row, s_row, row["n_sem_true"])
                    )
                self.inflight[req_id] = p
                passthrough.discard(id(p))
                if busy:
                    self.stats["admitted_midflight"] += 1
                busy = True
            self._last_concurrent = time.perf_counter()
            stat = "voice_cache_admissions" if sig[0] == "asm" else "fused_admissions"
            self.stats[stat] = self.stats.get(stat, 0) + len(items)
            self.stats["batched_admissions"] = (
                self.stats.get("batched_admissions", 0) + len(items)
            )
        return [p for p in pendings if id(p) in passthrough]

    def _try_admit(self, pending: _Pending, engine_idle: bool) -> bool:
        """Admit one request; returns False when admission was deferred
        (paged backpressure).  A deferral with an IDLE engine is a hard
        failure — the request alone exceeds the pool."""
        busy = any(o is not None for o in self.engine.owner)
        try:
            t0 = time.perf_counter()
            self._admit(pending)
            self.stage_stats.record("admit_prefill", time.perf_counter() - t0)
            if busy:
                self.stats["admitted_midflight"] += 1
                self._last_concurrent = time.perf_counter()
            return True
        except AdmissionDeferred as e:
            if engine_idle:
                logger.error("request exceeds page pool even alone: %s", e)
                self._fail_pending(pending, e)
                return True
            self.stats["deferrals"] += 1
            self._deferred.append(pending)
            return False
        except Exception as e:
            logger.exception("admission failed")
            self._fail_pending(pending, e)
            return True

    async def _admit_while_fetching(self, fetch_fut):
        """Admit arrivals WHILE a decode fetch blocks its worker thread.
        A newly admitted request's tokenize/prefill dispatches enqueue
        BEHIND the in-flight decode program on device (JAX dispatch is
        async), so a mid-decode arrival joins the very next dispatch instead
        of first waiting out the fetch and then serializing its prefill —
        on the tunneled TPU this takes an average half-dispatch plus one
        prefill (~100+ ms) off mid-flight first-chunk latency."""
        while not fetch_fut.done():
            if self.engine.free_slots() <= 0 or self._deferred:
                # no capacity, or paged backpressure (deferred admissions
                # retry only after commit frees pages/slots): just wait
                await asyncio.wait({fetch_fut})
                return
            getter = asyncio.ensure_future(self.waiting.get())
            try:
                await asyncio.wait(
                    {fetch_fut, getter}, return_when=asyncio.FIRST_COMPLETED
                )
            except asyncio.CancelledError:
                # server.stop() cancelled the loop task: don't leak a
                # pending queue getter into the dying event loop
                getter.cancel()
                raise
            if not getter.done():
                getter.cancel()
                try:
                    pending = await getter  # won the race with the cancel
                except asyncio.CancelledError:
                    # distinguish the getter's own cancellation (fetch done:
                    # normal exit) from server.stop() cancelling THIS task at
                    # this await — swallowing the latter would resume the
                    # loop and hang stop() forever on `await task`
                    task = asyncio.current_task()
                    if task is not None and task.cancelling():
                        raise
                    return
            else:
                pending = getter.result()
            # drain any arrivals that landed in the same instant so a true
            # burst admits through ONE batched prefill (_admit_burst); the
            # yield lets sibling producers' pending puts land first
            await asyncio.sleep(0)
            burst = [pending]
            while (
                self.engine.free_slots() - len(burst) > 0
                and not self.waiting.empty()
            ):
                burst.append(self.waiting.get_nowait())
            for p in self._admit_burst(burst):
                self._try_admit(p, engine_idle=False)

    def _deliver_step(self, increments, chained, spec, before):
        """Host-side delivery of a COMMITTED step: dispatch-sizing token
        accounting, the speculative inline first chunk, vocode handoff for
        streaming consumers, and finishes.  Pure host bookkeeping — also
        safe from the loop task's cancellation handler."""
        # loop-thread token accounting for dispatch sizing (see
        # _Pending.loop_tokens) — for EVERY increment, including one a
        # speculative chunk will consume below
        for req_id, new_tokens in increments.items():
            p = self.inflight.get(req_id)
            if p is not None:
                p.loop_tokens += len(new_tokens)
        # validated speculative first chunks were already rendered inside
        # the decode dispatch — push them inline; everything else goes to
        # the vocode worker as usual
        spec_reqs = (
            self._apply_specs(spec, chained, increments)
            if spec is not None and chained is not None
            else set()
        )
        # streaming consumers get chunks as soon as their schedule fills
        # (vocoded on the worker thread, overlapping the next dispatch)
        for req_id, new_tokens in increments.items():
            if req_id in spec_reqs:
                continue
            pending = self.inflight.get(req_id)
            if pending is not None and pending.chunk_queue is not None:
                pending.loop_increments += 1
                self._vocode_q.put_nowait((pending, new_tokens, False, False))
        for req_id in set(self.engine.finished) - before:
            self._finish(req_id, self.engine.finished.pop(req_id))

    def _dispatch_one(self):
        """Enqueue one adaptively-sized decode dispatch (+ its speculative
        first-chunk chain) and book it in the planned-token ledger.  Returns
        (handle, spec, t0) or None when no dispatch is useful (no active
        slot, or every active slot's budget is covered in flight)."""
        req_steps = self._requested_steps()
        if req_steps is None:
            return None
        spec = self._plan_spec(snap_to_ladder(req_steps, self.engine.max_dispatch))
        t0 = time.perf_counter()
        handle = self.engine.step_begin(req_steps, spec[1] if spec else None)
        if handle is None:
            return None
        n_snapped = handle[2]
        for slot, req in enumerate(handle[3]):
            if req is not None:
                self._planned_ahead[slot] += n_snapped
        return handle, spec, t0

    def _commit_one(self, entry, fetched):
        """Commit one fetched dispatch: release its planned-token bookings,
        do the engine bookkeeping, deliver chunks/finishes."""
        handle, spec, t0 = entry
        n_snapped = handle[2]
        for slot, req in enumerate(handle[3]):
            if req is not None:
                self._planned_ahead[slot] = max(
                    self._planned_ahead[slot] - n_snapped, 0
                )
        before = set(self.engine.finished)
        increments, chained = self.engine.step_commit(handle, fetched)
        self.stage_stats.record("decode_dispatch", time.perf_counter() - t0)
        self._deliver_step(increments, chained, spec, before)

    def _drain_window_blocking(self, window: deque, cfut):
        """Commit every in-flight dispatch during shutdown (blocking fetches
        on this thread; they complete as soon as the device programs do).
        The dispatches have already advanced the device cache, so the host
        bookkeeping MUST still commit — otherwise a stop()/start() restart
        resumes with these dispatches' tokens missing from the buffers and,
        on the paged engine, tokens_seen undercounting page needs (silent KV
        corruption).  Steps are also DELIVERED, not just committed: a stream
        surviving the restart must not lose this audio (silent gap)."""
        for i, entry in enumerate(window):
            try:
                if i == 0 and cfut is not None:
                    fetched = cfut.result(timeout=120)
                else:
                    fetched = self.engine.step_fetch(entry[0])
                self._commit_one(entry, fetched)
            except Exception:
                logger.exception("step commit during shutdown failed")
        window.clear()

    async def _loop(self):
        # in-flight dispatch window (oldest first).  dispatch_depth > 1
        # enqueues the next decode dispatch BEFORE blocking on the previous
        # one's fetch, so the device never idles a relay round-trip between
        # micro-batches; the _planned_ahead ledger keeps sizing and spec
        # planning honest about work that is dispatched but uncommitted.
        window: deque = deque()
        # a fresh loop has no in-flight dispatches — clear any bookings a
        # failed shutdown drain left behind (stop()/start() restart)
        self._planned_ahead = [0] * len(self._planned_ahead)
        while True:
            # admit as many waiting requests as slots (and page reservations)
            # allow; deferred requests retry first to keep arrival order.
            # Simultaneously-waiting bursts go through _admit_burst first so
            # same-signature voice-cache hits share ONE batched prefill.
            n_free = self.engine.free_slots()
            if n_free > 0 and (self._deferred or not self.waiting.empty()):
                burst = []
                while len(burst) < n_free and (self._deferred or not self.waiting.empty()):
                    burst.append(
                        self._deferred.popleft() if self._deferred
                        else self.waiting.get_nowait()
                    )
                leftover = self._admit_burst(burst)
                for i, pending in enumerate(leftover):
                    idle = all(o is None for o in self.engine.owner) and not window
                    if not self._try_admit(pending, engine_idle=idle):
                        # backpressured: _try_admit re-queued `pending`; the
                        # rest must follow it in arrival order
                        self._deferred.extend(leftover[i + 1:])
                        break

            # deliver any finishes a cancelled mid-step commit left behind
            # (the commit-on-cancel path below delivers too, but if ITS
            # delivery failed these would otherwise strand their consumers
            # forever after a stop()/start() restart)
            for req_id in [r for r in self.engine.finished if r in self.inflight]:
                self._finish(req_id, self.engine.finished.pop(req_id))

            if all(o is None for o in self.engine.owner) and not window:
                # idle: wait for the next request without burning CPU; the
                # yield lets the REST of a simultaneous burst land so it
                # admits through one batched prefill (_admit_burst)
                pending = await self.waiting.get()
                await asyncio.sleep(0)
                burst = [pending]
                while (
                    self.engine.free_slots() - len(burst) > 0
                    and not self.waiting.empty()
                ):
                    burst.append(self.waiting.get_nowait())
                leftover = self._admit_burst(burst)
                for p in leftover:
                    idle = all(o is None for o in self.engine.owner)
                    self._try_admit(p, engine_idle=idle and len(burst) == 1)
                continue

            cfut = None
            try:
                # top up the in-flight window, then fetch the oldest
                # dispatch on a worker thread and admit arrivals meanwhile
                while len(window) < self.dispatch_depth:
                    entry = self._dispatch_one()
                    if entry is None:
                        break
                    window.append(entry)
                if not window:
                    # active slots exist but all budgets are covered in
                    # flight — nothing to dispatch OR fetch (cannot happen:
                    # covered budgets imply an uncommitted handle).  Guard
                    # against a logic drift by yielding.
                    await asyncio.sleep(0)
                    continue
                entry = window.popleft()
                cfut = self._fetch_pool.submit(self.engine.step_fetch, entry[0])
                try:
                    fetch_fut = asyncio.wrap_future(cfut)
                    await self._admit_while_fetching(fetch_fut)
                    fetched = await fetch_fut
                except asyncio.CancelledError:
                    # stop() cancelled the loop mid-step: commit EVERY
                    # in-flight dispatch (see _drain_window_blocking)
                    window.appendleft(entry)
                    self._drain_window_blocking(window, cfut)
                    raise
                self._commit_one(entry, fetched)
            except Exception as e:
                # an engine failure must not kill the serving loop: fail every
                # inflight request loudly and keep accepting new work
                logger.exception("engine step failed; failing inflight requests")
                for req_id in list(self.inflight):
                    self._fail_pending(self.inflight.pop(req_id), e)
                for slot, owner in enumerate(self.engine.owner):
                    if owner is not None:
                        self.engine.release_slot(slot)
                # the in-flight window is unrecoverable state: drop it and
                # clear its ledger bookings
                window.clear()
                self._planned_ahead = [0] * len(self._planned_ahead)
                self.stats["failures"] = self.stats.get("failures", 0) + 1
                continue
            # reap requests whose streaming consumer went away: free the
            # decode slot instead of synthesizing for nobody
            for req_id, p in list(self.inflight.items()):
                if p.cancelled:
                    self.inflight.pop(req_id)
                    if req_id in self.engine.owner:
                        self.engine.release_slot(self.engine.owner.index(req_id))
                    self.engine.finished.pop(req_id, None)
            if "pages_in_use" in self.stats:
                self.stats["pages_in_use"] = self.engine.pages_in_use()
                self.stats["pages_free"] = len(self.engine.free_pages)
            try:
                await asyncio.sleep(0)
            except asyncio.CancelledError:
                # stop() landed between iterations while the window still
                # holds dispatched-but-uncommitted work — same commit
                # obligation as the mid-fetch cancel above
                self._drain_window_blocking(window, None)
                raise
