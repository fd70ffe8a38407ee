"""Streaming synthesis: growing-chunk schedule + cross-fade.

Reproduces the reference's Triton BLS streaming design (reference
`runtime/triton_trtllm/model_repo/spark_tts/1/model.py:347-399`: chunk grows
1 s → ×8 per chunk → capped 30 s, 0.1 s overlap) and the client-side linear
cross-fade (reference `client_grpc.py:391-416`).  On TPU the LLM decodes in
fixed micro-batches of steps (`decode_chunk`, one XLA dispatch per
micro-batch) overlapping with vocoder invocations on the host thread.
"""

from __future__ import annotations

import math
from typing import Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sparktts_tpu.config import StreamingConfig
from sparktts_tpu.lm.generate import decode_chunk, prefill
from sparktts_tpu.lm.qwen import aligned_cache_len, init_kv_cache
from sparktts_tpu.prompt import extract_semantic_ids


def chunk_sizes(cfg: StreamingConfig) -> Iterator[int]:
    """Token chunk schedule (reference `spark_tts/1/model.py:350-375`)."""
    chunk = math.ceil(cfg.audio_chunk_duration * cfg.frame_rate)
    max_chunk = math.ceil(cfg.max_audio_chunk_duration * cfg.frame_rate)
    while True:
        yield chunk
        chunk = min(max_chunk, int(chunk * cfg.audio_chunk_size_scale_factor))


def overlap_tokens(cfg: StreamingConfig) -> int:
    return math.ceil(cfg.audio_chunk_overlap_duration * cfg.frame_rate)


def _emit_with_tail(tail, wav: np.ndarray, overlap_samples: int) -> tuple:
    """Low-latency chunk emission: fade the held-back tail of the previous
    chunk into this chunk's head, emit everything except this chunk's own
    tail (held for the next fade).  Unlike emitting whole chunks one behind
    (the reference client's approach, `client_grpc.py:391-416`), only
    `overlap` samples of latency are added."""
    ov = overlap_samples
    if tail is not None and ov > 0 and len(wav) >= ov and len(tail) >= ov:
        fade_out = np.linspace(1.0, 0.0, ov, dtype=np.float32)
        fade_in = np.linspace(0.0, 1.0, ov, dtype=np.float32)
        head = tail[-ov:] * fade_out + wav[:ov] * fade_in
        wav = np.concatenate([head.astype(wav.dtype), wav[ov:]])
    if ov > 0 and len(wav) > ov:
        return wav[-ov:], wav[:-ov]
    return None, wav


def cross_fade(prev: np.ndarray, nxt: np.ndarray, overlap_samples: int) -> tuple:
    """Linear cross-fade between consecutive chunks (reference
    `client_grpc.py:391-416`).  Returns (emit_now, carry) where carry is the
    faded head of `nxt` already merged — caller emits `emit_now` and keeps
    streaming `nxt[overlap:]` logic internally."""
    if overlap_samples == 0 or len(prev) == 0:
        return prev, nxt
    ov = min(overlap_samples, len(prev), len(nxt))
    fade_out = np.linspace(1.0, 0.0, ov, dtype=np.float32)
    fade_in = np.linspace(0.0, 1.0, ov, dtype=np.float32)
    merged = prev.copy()
    merged[-ov:] = prev[-ov:] * fade_out + nxt[:ov] * fade_in
    return merged, nxt[ov:]


class StreamingSynthesizer:
    """Token-streaming TTS: yields waveform chunks as the LLM decodes.

    Wraps a `SparkTTSPipeline`; the decode loop runs in fixed micro-batches
    (`steps_per_dispatch` tokens per XLA call) with host-side EOS checks
    between dispatches, while finished token chunks are vocoded and
    cross-faded into the output stream.
    """

    def __init__(self, pipeline, streaming_cfg: Optional[StreamingConfig] = None, steps_per_dispatch: int = 25):
        self.pipe = pipeline
        self.cfg = streaming_cfg or pipeline.config.streaming
        self.steps = steps_per_dispatch

    def stream(
        self,
        text: str,
        prompt_speech_path=None,
        prompt_text: Optional[str] = None,
        gender: Optional[str] = None,
        pitch: Optional[str] = None,
        speed: Optional[str] = None,
        temperature: float = 0.8,
        top_k: int = 50,
        top_p: float = 0.95,
        max_new_tokens: Optional[int] = None,
        seed: int = 0,
    ) -> Iterator[np.ndarray]:
        from sparktts_tpu.prompt import build_clone_prompt, build_control_prompt

        pipe = self.pipe
        tok = pipe.tokenizer
        if gender is not None:
            ids = build_control_prompt(tok, text, gender, pitch, speed)
            global_token_ids = None
        else:
            global_token_ids, semantic_token_ids = pipe.tokenize_audio(prompt_speech_path)
            ids = build_clone_prompt(
                tok,
                text,
                global_token_ids,
                semantic_token_ids if prompt_text is not None else None,
                prompt_text,
            )

        max_new = max_new_tokens or pipe.max_new_tokens
        t_pad = ((len(ids) + pipe.prompt_bucket - 1) // pipe.prompt_bucket) * pipe.prompt_bucket
        input_ids = np.full((1, t_pad), tok.pad_id, np.int32)
        mask = np.zeros((1, t_pad), bool)
        input_ids[0, t_pad - len(ids) :] = ids
        mask[0, t_pad - len(ids) :] = True

        schedule = chunk_sizes(self.cfg)
        ov_tokens = overlap_tokens(self.cfg)
        target = next(schedule)

        # dispatch sizes: the FIRST dispatch covers exactly the first chunk
        # (first-audio latency), later ones are large (throughput); a fixed
        # size set keeps the XLA compile cache to three decode programs.  The
        # cache carries one dispatch of slack so the final dispatch never
        # needs clamping to the budget residue (an off-menu n_steps would
        # compile a fresh program mid-stream); overshoot tokens are discarded
        # host-side instead.
        first_dispatch = target
        big_dispatch = max(self.steps, 100)
        slack = max(first_dispatch, big_dispatch)
        cache = init_kv_cache(
            pipe.config.llm, 1,
            aligned_cache_len(t_pad + max_new + slack), pipe.lm_dtype,
        )
        vocab_slice, extra_ids = pipe.guided_constraint(
            "control" if gender is not None else "clone"
        )
        # measured on v5e: separate prefill + decode dispatches beat a fused
        # prefill+first-chunk program for first-chunk latency (307 → 219 ms)
        state = prefill(
            pipe.llm_params,
            pipe.config.llm,
            jnp.asarray(input_ids),
            jnp.asarray(mask),
            cache,
            jax.random.PRNGKey(seed),
            temperature,
            top_k,
            top_p,
            use_flash=getattr(pipe, "use_flash", False),
            vocab_slice=vocab_slice,
            extra_ids=extra_ids,
        )

        token_buf: List[int] = []
        pending: List[np.ndarray] = []  # raw LLM ids not yet vocoded
        tail: Optional[np.ndarray] = None  # overlap samples held for fading
        total_steps = 0
        done = False

        def vocode(sem_ids: np.ndarray) -> np.ndarray:
            nonlocal global_token_ids
            if global_token_ids is None:
                # controllable mode: the globals are at the head of the RAW
                # emitted stream (never sem_ids — those are codec-space and
                # would alias into the wrong id range)
                from sparktts_tpu.prompt import padded_global_tokens

                raw = (
                    np.concatenate(pending)
                    if pending
                    else np.zeros(0, np.int32)
                )
                global_token_ids = padded_global_tokens(
                    tok, raw, pipe.config.bicodec.speaker_encoder.token_num
                )
            return pipe.detokenize(global_token_ids, sem_ids[None, :])

        # derive the sample overlap from the TOKEN overlap and the model's
        # true token→sample ratio — computing it from wall-clock duration ×
        # sample rate desynchronizes the two whenever cfg.frame_rate doesn't
        # match the codec (the fade guard then silently emits duplicated
        # seam audio)
        overlap_samples = ov_tokens * pipe._wave_upsample

        while not done and total_steps < max_new:
            need = max(1, target - len(token_buf))
            if total_steps == 0:
                n = first_dispatch
            elif need <= self.steps:
                n = self.steps
            else:
                n = big_dispatch
            state, toks, valid = decode_chunk(
                pipe.llm_params,
                pipe.config.llm,
                state,
                t_pad,
                n,
                temperature,
                top_k,
                top_p,
                tuple(tok.eos_ids),
                tok.pad_id,
                vocab_slice=vocab_slice,
                extra_ids=extra_ids,
            )
            # one host round trip for both arrays; the explicit valid mask
            # replaces the old `last emission == pad` done-proxy, which ate
            # tokens whenever pad_id was a legitimately sampled id
            toks_h, valid_h = jax.device_get((toks, valid))
            raw = toks_h[0][valid_h[0]]
            # discard overshoot beyond the token budget (the dispatch size is
            # from the fixed menu; the cache has slack for the extra writes)
            raw = raw[: max_new - total_steps]
            total_steps += n
            pending.append(raw)
            done = not bool(valid_h[0][-1]) or total_steps >= max_new
            sem = extract_semantic_ids(tok, raw)
            token_buf.extend(sem.tolist())

            while len(token_buf) >= target:
                chunk_tokens = np.asarray(token_buf[:target], np.int32)
                wav = vocode(chunk_tokens)
                token_buf = token_buf[target - ov_tokens :]
                target = next(schedule)
                tail, emit = _emit_with_tail(tail, wav, overlap_samples)
                if len(emit):
                    yield emit

        if token_buf:
            wav = vocode(np.asarray(token_buf, np.int32))
            tail, emit = _emit_with_tail(tail, wav, overlap_samples)
            if len(emit):
                yield emit
        if tail is not None and len(tail):
            yield tail
