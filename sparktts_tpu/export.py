"""AOT model export: serialized StableHLO artifacts.

Parity role: the reference's deployment artifacts are 6 ONNX graphs with
fp32/fp16/int8 variants (`export_sparktts_onnx.py:1182-1205`).  The TPU-native
equivalent is `jax.export` — each jitted program (weights embedded as
constants) serializes to a portable StableHLO blob that reloads and executes
without the Python model code.  The graph partitioning mirrors the
reference's: mel / audio-tokenize / speaker-tokenize / vocoder / LLM.

Precision variants: pass bf16 or int8-quantized param trees (lm/quant.py) —
the artifact inherits whatever precision the params carry.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_program(fn, args, path: str | Path) -> None:
    """Trace fn(*args), serialize to `path` (StableHLO bytes)."""
    exported = jax_export.export(jax.jit(fn))(*args)
    Path(path).write_bytes(exported.serialize())


def load_program(path: str | Path):
    """Load a serialized program; returns a callable."""
    exported = jax_export.deserialize(Path(path).read_bytes())
    return exported.call


def export_pipeline_artifacts(
    pipeline,
    out_dir: str | Path,
    wav_seconds: float = 6.0,
    vocoder_tokens: int = 500,
    prompt_len: int = 128,
    decode_len: int = 512,
) -> Dict[str, str]:
    """Export the deployment graph set for a pipeline (weights embedded).

    Graphs (reference export partitioning, `export_sparktts_onnx.py`; the LLM
    pair plays the role of the reference's text-generation-with-past export):
      mel            — ref wav → mel spectrogram
      audio_tokenize — wav + ref wav → (semantic, global) tokens
      vocoder        — (semantic, global) tokens → waveform
      lm_prefill     — prompt ids + mask → last-position logits + KV cache
                       sized prompt_len + decode_len (decode headroom)
      lm_decode      — (token, position, cache, write_pos) → next logits +
                       updated cache — one AR step; the consumer samples
    """
    from sparktts_tpu.codec.bicodec import bicodec_detokenize, bicodec_tokenize
    from sparktts_tpu.dsp.mel import make_mel_basis, mel_spectrogram
    from sparktts_tpu.lm.qwen import init_kv_cache, prefill_inputs, qwen_forward
    from sparktts_tpu.nn.wav2vec2 import wav2vec2_features

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    cfg = pipeline.config
    sr = cfg.sample_rate
    manifest: Dict[str, str] = {}

    # mel
    basis = make_mel_basis(cfg.bicodec.mel_params)
    ref_len = int(cfg.ref_segment_duration * sr) // cfg.latent_hop_length * cfg.latent_hop_length
    export_program(
        lambda wav: mel_spectrogram(wav, basis),
        (jnp.zeros((1, ref_len), jnp.float32),),
        out / "mel.hlo",
    )
    manifest["mel"] = "mel.hlo"

    # audio tokenize (wav2vec2 + encoder + FVQ + speaker)
    wav_len = int(wav_seconds * sr)
    w2v, bc = pipeline.w2v_params, pipeline.bicodec_params

    def tokenize(wav, ref_wav):
        feat = wav2vec2_features(w2v, wav, cfg.wav2vec2)
        return bicodec_tokenize(bc, cfg.bicodec, feat, ref_wav)

    export_program(
        tokenize,
        (jnp.zeros((1, wav_len), jnp.float32), jnp.zeros((1, ref_len), jnp.float32)),
        out / "audio_tokenize.hlo",
    )
    manifest["audio_tokenize"] = "audio_tokenize.hlo"

    # vocoder
    def vocode(semantic, global_t):
        return bicodec_detokenize(bc, cfg.bicodec, semantic, global_t)

    export_program(
        vocode,
        (
            jnp.zeros((1, vocoder_tokens), jnp.int32),
            jnp.zeros((1, cfg.bicodec.speaker_encoder.token_num), jnp.int32),
        ),
        out / "vocoder.hlo",
    )
    manifest["vocoder"] = "vocoder.hlo"

    # LM prefill (logits for the last position + populated cache).  The
    # cache carries decode_len of headroom — a prompt-length cache would be
    # full on return and the artifact could never generate a token.
    llm = pipeline.llm_params
    cache_len = prompt_len + decode_len

    def lm_prefill(ids, mask):
        cache = init_kv_cache(cfg.llm, ids.shape[0], cache_len, pipeline.lm_dtype)
        positions, bias = prefill_inputs(mask, cache_len)
        logits, cache = qwen_forward(llm, cfg.llm, ids, positions, cache, 0, bias)
        # plain arrays (not the KVCache NamedTuple): jax.export serializes
        # only registered pytree node types
        return logits[:, -1], cache.k, cache.v

    export_program(
        lm_prefill,
        (jnp.zeros((1, prompt_len), jnp.int32), jnp.ones((1, prompt_len), bool)),
        out / "lm_prefill.hlo",
    )
    manifest["lm_prefill"] = "lm_prefill.hlo"

    # LM single-token decode step over that cache: feed the previously
    # sampled token at cache slot `write_pos` (int32 scalar), get the next
    # logits.  start (B,) carries the left-pad offsets from the prefill mask.
    def lm_decode(tok, position, start, k, v, write_pos):
        from sparktts_tpu.lm.qwen import KVCache

        logits, cache = qwen_forward(
            llm, cfg.llm, tok[:, None], position[:, None], KVCache(k=k, v=v),
            write_pos, None, decode_window=(start, write_pos),
        )
        return logits[:, -1], cache.k, cache.v

    kv_shape = (
        cfg.llm.num_hidden_layers, 1, cache_len,
        cfg.llm.num_key_value_heads, cfg.llm.head_dim,
    )
    export_program(
        lm_decode,
        (
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros(kv_shape, pipeline.lm_dtype),
            jnp.zeros(kv_shape, pipeline.lm_dtype),
            jnp.zeros((), jnp.int32),
        ),
        out / "lm_decode.hlo",
    )
    manifest["lm_decode"] = "lm_decode.hlo"

    with open(out / "manifest.json", "w") as f:
        json.dump(
            {
                "graphs": manifest,
                "sample_rate": sr,
                "wav_len": wav_len,
                "ref_len": ref_len,
                "vocoder_tokens": vocoder_tokens,
                "prompt_len": prompt_len,
                "decode_len": decode_len,
            },
            f,
            indent=2,
        )
    return manifest
