"""Continuous-batching TTS server: the production serving architecture.

Couples the inflight-batching LM engine (`lm/continuous.py`) with the codec:
requests join the running decode batch the moment a slot frees (no
batch-formation barrier like `serve/server.py`), tokens stream out per decode
micro-batch, and finished/chunked token runs are vocoded while the LM keeps
decoding — the TPU alternates LM-step and vocoder programs, so both stay hot.

This is the role TRT-LLM's inflight batching + Triton's decoupled transactions
play in the reference deployment (SURVEY.md §3.5), in one asyncio loop.
"""

from __future__ import annotations

import asyncio
import logging
import time
from dataclasses import dataclass, field
from typing import AsyncIterator, Dict, Optional

import numpy as np

from sparktts_tpu.prompt import (
    build_clone_prompt,
    build_control_prompt,
    extract_global_ids,
    extract_semantic_ids,
)

logger = logging.getLogger(__name__)


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
    global_tokens: Optional[np.ndarray] = None
    enqueue_time: float = field(default_factory=time.perf_counter)
    # streaming mode: chunks go to this queue instead of one final future
    chunk_queue: Optional[asyncio.Queue] = None
    stream_buf: list = field(default_factory=list)
    stream_emitted: int = 0
    stream_target: int = 0
    stream_schedule: Optional[object] = None
    cancelled: bool = False  # consumer abandoned the stream mid-flight


class ContinuousTTSServer:
    """Asyncio server with per-step request admission."""

    def __init__(
        self,
        pipeline,
        max_slots: int = 8,
        cache_len: Optional[int] = None,
        steps_per_dispatch: int = 16,
        default_max_new_tokens: Optional[int] = None,
        paged: bool = False,
        page_size: int = 256,
        n_pages: Optional[int] = None,
    ):
        self.pipe = pipeline
        self.steps = steps_per_dispatch
        self.default_max_new = default_max_new_tokens or pipeline.max_new_tokens
        cache_len = cache_len or (pipeline.prompt_bucket * 4 + self.default_max_new)
        # one engine serves clone AND controllable requests, so use the
        # superset constraint (semantic + global ranges + control markers +
        # EOS) — still <8% of the full vocab
        vocab_slice, extra_ids = pipeline.guided_constraint("control")
        common = dict(
            prompt_pad=pipeline.prompt_bucket,
            eos_ids=tuple(pipeline.tokenizer.eos_ids),
            pad_id=pipeline.tokenizer.pad_id,
            cache_dtype=pipeline.lm_dtype,
            vocab_slice=vocab_slice,
            extra_ids=extra_ids,
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
            # default pool: half the dense worst case — the paged engine's
            # point is that requests only hold ceil(written/page) pages
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
                **common,
            )
        self.waiting: asyncio.Queue = asyncio.Queue()
        self.inflight: Dict[int, _Pending] = {}
        self._task: Optional[asyncio.Task] = None
        self.stats = {"requests": 0, "completed": 0, "admitted_midflight": 0}
        if paged:
            # live page-pool gauges (KV memory follows load, not slot count)
            self.stats["pages_in_use"] = 0
            self.stats["pages_free"] = len(self.engine.free_pages)

    async def start(self):
        if self._task is None:
            self._task = asyncio.create_task(self._loop())

    async def stop(self):
        if self._task is not None:
            self._task.cancel()
            try:
                await self._task
            except asyncio.CancelledError:
                pass
            self._task = None

    async def synthesize(
        self,
        text: str,
        prompt_wav: Optional[np.ndarray] = None,
        prompt_text: Optional[str] = None,
        gender: Optional[str] = None,
        pitch: Optional[str] = None,
        speed: Optional[str] = None,
        max_new_tokens: Optional[int] = None,
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
    ) -> AsyncIterator[np.ndarray]:
        """Async generator of waveform chunks (growing-chunk schedule,
        reference `spark_tts/1/model.py:347-385`) while the request shares the
        continuous decode batch with everything else."""
        from sparktts_tpu.serve.streaming import chunk_sizes

        fut = asyncio.get_running_loop().create_future()
        q: asyncio.Queue = asyncio.Queue()
        schedule = chunk_sizes(self.pipe.config.streaming)
        pending = _Pending(
            text=text,
            prompt_wav=prompt_wav,
            prompt_text=prompt_text,
            gender=gender,
            pitch=pitch,
            speed=speed,
            max_new_tokens=max_new_tokens or self.default_max_new,
            future=fut,
            chunk_queue=q,
            stream_target=next(schedule),
            stream_schedule=schedule,
        )
        self.stats["requests"] += 1
        await self.waiting.put(pending)
        try:
            while True:
                chunk = await q.get()
                if chunk is None:
                    break
                yield chunk
        except GeneratorExit:
            # consumer closed the stream early (e.g. HTTP client dropped):
            # mark the request so the loop frees its decode slot
            pending.cancelled = True
            raise
        # surface admission/engine failures to the consumer (the future is
        # otherwise never awaited on the streaming path)
        if fut.done() and not fut.cancelled() and fut.exception() is not None:
            raise fut.exception()

    # ------------------------------------------------------------------

    def _emit_stream_chunks(self, pending: _Pending, new_tokens: np.ndarray, final: bool):
        """Vocode buffered semantic tokens per the chunk schedule and push
        waveform chunks to the consumer queue.  The wave for [0, emitted+n)
        is recomputed with full left context and only the new tail is pushed —
        keeps chunk boundaries continuous without client-side cross-fade."""
        tok = self.pipe.tokenizer
        sem = extract_semantic_ids(tok, new_tokens)
        pending.stream_buf.extend(sem.tolist())

        def push(upto: int):
            sem_ids = np.asarray(pending.stream_buf[:upto], np.int32)
            if pending.global_tokens is None:
                token_num = self.pipe.config.bicodec.speaker_encoder.token_num
                g = extract_global_ids(tok, new_tokens)
                if g.size < token_num:
                    g = np.pad(g, (0, token_num - g.size))
                pending.global_tokens = g[None, :token_num]
            wav = self.pipe.detokenize(pending.global_tokens, sem_ids[None, :])
            start = pending.stream_emitted * self.pipe._wave_upsample
            pending.chunk_queue.put_nowait(wav[start:])
            pending.stream_emitted = upto

        while len(pending.stream_buf) >= pending.stream_emitted + pending.stream_target:
            push(pending.stream_emitted + pending.stream_target)
            pending.stream_target = next(pending.stream_schedule)
        if final:
            if len(pending.stream_buf) > pending.stream_emitted:
                push(len(pending.stream_buf))
            pending.chunk_queue.put_nowait(None)

    def _admit(self, pending: _Pending) -> Optional[int]:
        tok = self.pipe.tokenizer
        if pending.gender is not None:
            ids = build_control_prompt(tok, pending.text, pending.gender, pending.pitch, pending.speed)
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
        req_id = self.engine.submit(ids, max_new_tokens=pending.max_new_tokens)
        self.inflight[req_id] = pending
        return req_id

    def _finish(self, req_id: int, tokens: np.ndarray):
        pending = self.inflight.pop(req_id)
        tok = self.pipe.tokenizer
        if pending.chunk_queue is not None:
            self._emit_stream_chunks(pending, np.zeros(0, np.int32), final=True)
            self.stats["completed"] += 1
            if not pending.future.done():
                pending.future.set_result(np.zeros(0, np.float32))
            return
        sem = extract_semantic_ids(tok, tokens)
        if pending.gender is not None:
            token_num = self.pipe.config.bicodec.speaker_encoder.token_num
            g = extract_global_ids(tok, tokens)
            if g.size < token_num:
                g = np.pad(g, (0, token_num - g.size))
            pending.global_tokens = g[None, :token_num]
        if sem.size == 0:
            wav = np.zeros(0, np.float32)
        else:
            wav = self.pipe.detokenize(pending.global_tokens, sem[None, :])
        self.stats["completed"] += 1
        if not pending.future.done():
            pending.future.set_result(wav)

    def _fail_pending(self, pending: "_Pending", exc: Exception):
        """Propagate a failure to a request whichever way it is waiting:
        offline consumers await the future; streaming consumers read the
        chunk queue (and re-raise the future's exception after the None
        sentinel)."""
        if not pending.future.done():
            pending.future.set_exception(exc)
        if pending.chunk_queue is not None:
            pending.chunk_queue.put_nowait(None)

    async def _loop(self):
        while True:
            # admit as many waiting requests as slots allow
            admitted_any = False
            while self.engine.free_slots() > 0 and not self.waiting.empty():
                pending = self.waiting.get_nowait()
                try:
                    busy = any(o is not None for o in self.engine.owner)
                    self._admit(pending)
                    admitted_any = True
                    if busy:
                        self.stats["admitted_midflight"] += 1
                except Exception as e:
                    logger.exception("admission failed")
                    self._fail_pending(pending, e)

            if all(o is None for o in self.engine.owner):
                # idle: wait for the next request without burning CPU
                pending = await self.waiting.get()
                try:
                    self._admit(pending)
                except Exception as e:
                    logger.exception("admission failed")
                    self._fail_pending(pending, e)
                continue

            # advance the running batch one micro-batch of steps (in a thread
            # so the event loop keeps accepting requests)
            before = set(self.engine.finished)
            try:
                increments = await asyncio.get_running_loop().run_in_executor(
                    None, self.engine.step, self.steps
                )
            except Exception as e:
                # an engine failure (e.g. page-pool exhaustion) must not kill
                # the serving loop: fail every inflight request loudly and
                # keep accepting new work
                logger.exception("engine step failed; failing inflight requests")
                for req_id in list(self.inflight):
                    self._fail_pending(self.inflight.pop(req_id), e)
                for slot, owner in enumerate(self.engine.owner):
                    if owner is not None:
                        self.engine.release_slot(slot)
                self.stats["failures"] = self.stats.get("failures", 0) + 1
                continue
            # streaming consumers get chunks as soon as their schedule fills
            for req_id, new_tokens in increments.items():
                pending = self.inflight.get(req_id)
                if pending is not None and pending.chunk_queue is not None:
                    self._emit_stream_chunks(pending, new_tokens, final=False)
            for req_id in set(self.engine.finished) - before:
                self._finish(req_id, self.engine.finished.pop(req_id))
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
            await asyncio.sleep(0)
