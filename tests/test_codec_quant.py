"""Codec precision matrix: fp32 vs bf16 vs weight-only int8 with quality
gates (VERDICT item 6; reference exports fp16+int8 of every graph,
`export_sparktts_onnx.py:905-1050`).

The gates fail if a precision variant drifts past threshold on fixed inputs —
the CPU-level guard behind BASELINE.md's mel-distance parity bar."""

import jax
import jax.numpy as jnp
import numpy as np

from sparktts_tpu.codec.bicodec import bicodec_detokenize, bicodec_tokenize, init_bicodec
from sparktts_tpu.codec.quant import quantize_bicodec_int8, quantized_bytes
from sparktts_tpu.config import tiny_test_config

CFG = tiny_test_config().bicodec


def _fixtures(seed=0):
    params = init_bicodec(jax.random.PRNGKey(seed), CFG)
    rng = np.random.default_rng(seed)
    n_sem = CFG.quantizer.codebook_size
    n_glob = int(np.prod(CFG.speaker_encoder.fsq_levels))
    sem = rng.integers(0, n_sem, size=(2, 20)).astype(np.int32)
    glob = rng.integers(0, n_glob, size=(2, CFG.speaker_encoder.token_num)).astype(np.int32)
    return params, jnp.asarray(sem), jnp.asarray(glob)


def test_int8_detokenize_quality_gate():
    params, sem, glob = _fixtures()
    wav_fp32 = np.asarray(bicodec_detokenize(params, CFG, sem, glob), np.float64)
    q = quantize_bicodec_int8(params)
    wav_int8 = np.asarray(bicodec_detokenize(q, CFG, sem, glob), np.float64)

    assert wav_int8.shape == wav_fp32.shape
    rel = np.linalg.norm(wav_int8 - wav_fp32) / (np.linalg.norm(wav_fp32) + 1e-12)
    assert rel < 0.05, f"int8 vocoder drift {rel:.4f} exceeds gate"

    # memory actually shrank (the point of the exercise)
    assert quantized_bytes(q) < 0.45 * quantized_bytes(params)


def test_bf16_detokenize_quality_gate():
    params, sem, glob = _fixtures(1)
    wav_fp32 = np.asarray(bicodec_detokenize(params, CFG, sem, glob), np.float64)
    bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    wav_bf16 = np.asarray(bicodec_detokenize(bf16, CFG, sem, glob), np.float64)
    rel = np.linalg.norm(wav_bf16 - wav_fp32) / (np.linalg.norm(wav_fp32) + 1e-12)
    assert rel < 0.05, f"bf16 vocoder drift {rel:.4f} exceeds gate"


def test_int8_tokenize_runs_and_mostly_agrees():
    """Encoder+quantizer int8 graph: tokens may flip near codebook boundaries
    but the bulk must agree with fp32."""
    params, _, _ = _fixtures(2)
    rng = np.random.default_rng(2)
    feat = jnp.asarray(
        rng.standard_normal((1, 40, CFG.encoder.input_channels)).astype(np.float32)
    )
    ref_wav = jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32) * 0.1)

    sem_fp32, glob_fp32 = bicodec_tokenize(params, CFG, feat, ref_wav)
    q = quantize_bicodec_int8(params)
    sem_q, glob_q = bicodec_tokenize(q, CFG, feat, ref_wav)

    agree = float(np.mean(np.asarray(sem_q) == np.asarray(sem_fp32)))
    assert agree > 0.8, f"int8 semantic tokens agree only {agree:.2f}"
    assert glob_q.shape == glob_fp32.shape


def test_vocoder_only_quantization():
    """Per-graph precision choice: quantize just the vocoder sub-tree
    (reference exports per-model precision variants)."""
    params, sem, glob = _fixtures(3)
    mixed = dict(params)
    mixed["decoder"] = quantize_bicodec_int8(params["decoder"])
    wav = np.asarray(bicodec_detokenize(mixed, CFG, sem, glob))
    ref = np.asarray(bicodec_detokenize(params, CFG, sem, glob))
    rel = np.linalg.norm(wav - ref) / (np.linalg.norm(ref) + 1e-12)
    assert np.isfinite(wav).all()
    assert rel < 0.05
