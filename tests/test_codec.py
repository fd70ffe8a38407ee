"""Codec unit tests: shape contracts and round-trip invariants, mirroring the
reference's inline smoke tests (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparktts_tpu.codec import fsq as FSQ
from sparktts_tpu.codec.bicodec import (
    bicodec_detokenize,
    bicodec_forward,
    bicodec_tokenize,
    init_bicodec,
)
from sparktts_tpu.codec.feat_decoder import feat_decoder_apply, init_feat_decoder
from sparktts_tpu.codec.feat_encoder import feat_encoder_apply, init_feat_encoder
from sparktts_tpu.codec.fvq import fvq_detokenize, fvq_forward, fvq_tokenize, init_fvq
from sparktts_tpu.codec.speaker_encoder import (
    init_speaker_encoder,
    speaker_encoder_detokenize,
    speaker_encoder_forward,
    speaker_encoder_tokenize,
)
from sparktts_tpu.codec.wave_generator import init_wave_generator, wave_generator_apply
from sparktts_tpu.config import (
    DecoderConfig,
    EncoderConfig,
    QuantizerConfig,
    SpeakerEncoderConfig,
    WaveGeneratorConfig,
    tiny_test_config,
)

KEY = jax.random.PRNGKey(0)


def test_fsq_roundtrip_codes_indices():
    levels = (4, 4, 4, 4, 4, 4)
    z = jax.random.normal(KEY, (2, 8, len(levels)))
    codes, indices = FSQ.fsq_forward(z, levels)
    codes2 = FSQ.fsq_indices_to_codes(indices, levels)
    np.testing.assert_allclose(np.asarray(codes), np.asarray(codes2), atol=1e-6)
    assert indices.dtype == jnp.int32
    assert int(indices.max()) < int(np.prod(levels))


def test_fsq_codes_cover_all_indices():
    levels = (4, 4, 4)
    n = int(np.prod(levels))
    idx = jnp.arange(n)
    codes = FSQ.fsq_indices_to_codes(idx, levels)
    back = FSQ.fsq_codes_to_indices(codes, levels)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))


def test_residual_fsq_forward_matches_output_from_indices():
    # the reference's own invariant (residual_fsq.py:385-435)
    levels = (4, 4, 4, 4, 4, 4)
    dim, nq = 16, 1
    p = FSQ.init_residual_fsq(KEY, levels, nq, dim)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, dim))
    zq, indices = FSQ.residual_fsq_apply(p, x, levels, nq)
    zq2 = FSQ.residual_fsq_output_from_indices(p, indices, levels, nq)
    np.testing.assert_allclose(np.asarray(zq), np.asarray(zq2), rtol=1e-5, atol=1e-5)


def test_residual_fsq_multi_quantizer():
    levels = (8, 8, 8)
    dim, nq = 12, 3
    p = FSQ.init_residual_fsq(KEY, levels, nq, dim)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 6, dim))
    zq, indices = FSQ.residual_fsq_apply(p, x, levels, nq)
    assert indices.shape == (2, 6, nq)
    zq2 = FSQ.residual_fsq_output_from_indices(p, indices, levels, nq)
    np.testing.assert_allclose(np.asarray(zq), np.asarray(zq2), rtol=1e-5, atol=1e-5)


def test_fvq_roundtrip():
    cfg = QuantizerConfig(input_dim=32, codebook_size=64, codebook_dim=8)
    p = init_fvq(KEY, cfg)
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 10, 32))
    ids = fvq_tokenize(p, z)
    assert ids.shape == (2, 10)
    z_q = fvq_detokenize(p, ids)
    assert z_q.shape == (2, 10, 32)
    out = fvq_forward(p, z)
    # forward's z_q equals detokenize of forward's indices
    np.testing.assert_allclose(
        np.asarray(out["z_q"]), np.asarray(fvq_detokenize(p, out["indices"])), atol=1e-6
    )


def test_feat_encoder_shape():
    # mirror of reference feat_encoder.py:91-105 scaled down
    cfg = EncoderConfig(
        input_channels=64, vocos_dim=32, vocos_intermediate_dim=64,
        vocos_num_layers=2, out_channels=48, sample_ratios=(2, 2),
    )
    p = init_feat_encoder(KEY, cfg)
    x = jax.random.normal(jax.random.PRNGKey(4), (3, 50, 64))
    y = feat_encoder_apply(p, x, cfg)
    assert y.shape == (3, 12, 48)  # 50 → 25 → 12


def test_feat_decoder_shape_with_condition():
    # mirror of reference feat_decoder.py:98-115 scaled down
    cfg = DecoderConfig(
        input_channels=64, vocos_dim=32, vocos_intermediate_dim=64,
        vocos_num_layers=2, out_channels=48, condition_dim=48, sample_ratios=(2, 2),
    )
    p = init_feat_decoder(KEY, cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (3, 50, 64))
    c = jax.random.normal(jax.random.PRNGKey(6), (3, 48))
    y = feat_decoder_apply(p, x, cfg, cond=c)
    assert y.shape == (3, 200, 48)  # 50 → 100 → 200


def test_wave_generator_upsamples_by_prod_rates():
    cfg = WaveGeneratorConfig(input_channel=48, channels=64, rates=(4, 2), kernel_sizes=(8, 4))
    p = init_wave_generator(KEY, cfg)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 20, 48))
    y = wave_generator_apply(p, x, cfg)
    assert y.shape == (2, 20 * 8, 1)
    assert np.abs(np.asarray(y)).max() <= 1.0


def test_speaker_encoder_tokenize_detokenize_consistency():
    cfg = tiny_test_config().bicodec.speaker_encoder
    p = init_speaker_encoder(KEY, cfg)
    mels = jax.random.normal(jax.random.PRNGKey(8), (2, 40, cfg.input_dim))
    x_vec, d_vec = speaker_encoder_forward(p, mels, cfg)
    assert x_vec.shape == (2, cfg.out_dim)
    assert d_vec.shape == (2, cfg.out_dim)
    ids = speaker_encoder_tokenize(p, mels, cfg)
    assert ids.shape == (2, cfg.token_num)
    d_vec2 = speaker_encoder_detokenize(p, ids, cfg)
    # quantized path: d_vector from forward must equal detokenize(tokenize)
    np.testing.assert_allclose(np.asarray(d_vec), np.asarray(d_vec2), rtol=1e-4, atol=1e-4)


def test_bicodec_forward_matches_tokenize_detokenize():
    # the reference's own end-to-end invariant (bicodec.py:225-247)
    cfg = tiny_test_config().bicodec
    p = init_bicodec(KEY, cfg)
    b, t50 = 2, 48
    hop = cfg.mel_params.hop_length
    feat = jax.random.normal(jax.random.PRNGKey(9), (b, t50, cfg.encoder.input_channels))
    ref_wav = 0.1 * jax.random.normal(jax.random.PRNGKey(10), (b, 320 * t50))

    out = bicodec_forward(p, cfg, feat, ref_wav)
    semantic, global_t = bicodec_tokenize(p, cfg, feat, ref_wav)
    # encoder downsamples 48 by 4 → 12 tokens
    assert semantic.shape == (b, t50 // 4)
    assert global_t.shape == (b, cfg.speaker_encoder.token_num)

    wav = bicodec_detokenize(p, cfg, semantic, global_t)
    np.testing.assert_allclose(np.asarray(out["recons"]), np.asarray(wav), rtol=1e-4, atol=1e-4)


def test_bicodec_detokenize_jits():
    cfg = tiny_test_config().bicodec
    p = init_bicodec(KEY, cfg)
    fn = jax.jit(lambda pp, s, g: bicodec_detokenize(pp, cfg, s, g))
    semantic = jnp.zeros((1, 12), dtype=jnp.int32)
    global_t = jnp.zeros((1, cfg.speaker_encoder.token_num), dtype=jnp.int32)
    wav = fn(p, semantic, global_t)
    upsample = int(np.prod(cfg.decoder.rates)) * int(np.prod(cfg.prenet.sample_ratios))
    assert wav.shape == (1, 12 * upsample)
