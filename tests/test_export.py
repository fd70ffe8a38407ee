"""AOT export tests: serialize → deserialize → identical outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparktts_tpu import export as EXP
from sparktts_tpu.pipeline import SparkTTSPipeline


@pytest.fixture(scope="module")
def pipe():
    return SparkTTSPipeline(max_new_tokens=8, prompt_bucket=32)


def test_export_roundtrip_simple(tmp_path):
    w = jax.random.normal(jax.random.PRNGKey(0), (16, 16))

    def fn(x):
        return jnp.tanh(x @ w)

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    EXP.export_program(fn, (x,), tmp_path / "f.hlo")
    loaded = EXP.load_program(tmp_path / "f.hlo")
    np.testing.assert_allclose(np.asarray(loaded(x)), np.asarray(fn(x)), rtol=1e-6)


def test_export_pipeline_artifacts(pipe, tmp_path):
    manifest = EXP.export_pipeline_artifacts(
        pipe, tmp_path, wav_seconds=1.0, vocoder_tokens=16, prompt_len=32,
        decode_len=8,
    )
    assert set(manifest) == {"mel", "audio_tokenize", "vocoder", "lm_prefill", "lm_decode"}
    for rel in manifest.values():
        assert (tmp_path / rel).stat().st_size > 0

    # vocoder artifact executes and matches the live pipeline
    vocode = EXP.load_program(tmp_path / "vocoder.hlo")
    sem = jnp.asarray(
        np.random.default_rng(0).integers(0, 64, size=(1, 16)), jnp.int32
    )
    glob = jnp.zeros((1, pipe.config.bicodec.speaker_encoder.token_num), jnp.int32)
    wav_art = np.asarray(vocode(sem, glob))
    from sparktts_tpu.codec.bicodec import bicodec_detokenize

    wav_live = np.asarray(bicodec_detokenize(pipe.bicodec_params, pipe.config.bicodec, sem, glob))
    np.testing.assert_allclose(wav_art, wav_live, rtol=1e-5, atol=1e-5)


def test_exported_lm_generates_greedily(pipe, tmp_path):
    """The exported lm_prefill + lm_decode pair must be able to actually
    GENERATE: greedy tokens from the artifacts match the live generate loop
    (regression: the prefill cache used to have zero decode headroom)."""
    manifest = EXP.export_pipeline_artifacts(
        pipe, tmp_path, wav_seconds=1.0, vocoder_tokens=16, prompt_len=16,
        decode_len=6,
    )
    assert "lm_decode" in manifest
    prefill_fn = EXP.load_program(tmp_path / "lm_prefill.hlo")
    decode_fn = EXP.load_program(tmp_path / "lm_decode.hlo")

    rng = np.random.default_rng(1)
    t, n_new = 16, 6
    ids = rng.integers(5, pipe.config.llm.vocab_size - 5, size=(1, t)).astype(np.int32)
    mask = np.ones((1, t), bool)

    logits, k, v = prefill_fn(jnp.asarray(ids), jnp.asarray(mask))
    start = jnp.zeros((1,), jnp.int32)  # no left padding in this prompt
    toks = [int(np.asarray(logits).argmax(-1)[0])]
    for i in range(n_new - 1):
        logits, k, v = decode_fn(
            jnp.asarray([toks[-1]], jnp.int32),
            jnp.asarray([t + i], jnp.int32),
            start,
            k, v,
            jnp.asarray(t + i, jnp.int32),
        )
        toks.append(int(np.asarray(logits).argmax(-1)[0]))

    from sparktts_tpu.lm.generate import generate

    ref, _ = generate(
        pipe.llm_params, pipe.config.llm, jnp.asarray(ids), jnp.asarray(mask),
        jax.random.PRNGKey(0), max_new_tokens=n_new, cache_len=t + n_new,
        eos_ids=(), pad_id=0, greedy=True, cache_dtype=pipe.lm_dtype,
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref)[0])
