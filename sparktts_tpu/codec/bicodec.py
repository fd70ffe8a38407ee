"""BiCodec: the composite neural speech codec.

TPU rebuild of reference `sparktts/models/bicodec.py:31-221`.  The composite
holds pure functions over a single params pytree; `tokenize` and `detokenize`
are designed to be jitted as whole programs (the reference's ONNX export
partitions the model the same way, `export_sparktts_onnx.py`).

Canonical shapes (channels-last):
  feat            (B, T50, 1024)   wav2vec2 features at 50 Hz
  ref_wav         (B, T16k)        6 s reference clip
  semantic tokens (B, T50) int32
  global tokens   (B, token_num) int32
  wav             (B, T16k)        output waveform
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax

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
from sparktts_tpu.config import BiCodecConfig
from sparktts_tpu.dsp.mel import make_mel_basis, mel_spectrogram


def init_bicodec(key, cfg: BiCodecConfig):
    keys = jax.random.split(key, 6)
    return {
        "encoder": init_feat_encoder(keys[0], cfg.encoder),
        "quantizer": init_fvq(keys[1], cfg.quantizer),
        "speaker_encoder": init_speaker_encoder(keys[2], cfg.speaker_encoder),
        "prenet": init_feat_decoder(keys[3], cfg.prenet),
        "postnet": init_feat_decoder(keys[4], cfg.postnet),
        "decoder": init_wave_generator(keys[5], cfg.decoder),
    }


def bicodec_tokenize(
    p, cfg: BiCodecConfig, feat: jax.Array, ref_wav: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """(feat, ref_wav) → (semantic_tokens (B, T), global_tokens (B, N))
    (reference `bicodec.py:151-169`)."""
    basis = make_mel_basis(cfg.mel_params)
    mel = mel_spectrogram(ref_wav, basis)  # (B, T_mel, n_mels)
    z = feat_encoder_apply(p["encoder"], feat, cfg.encoder)
    semantic_tokens = fvq_tokenize(p["quantizer"], z)
    global_tokens = speaker_encoder_tokenize(p["speaker_encoder"], mel, cfg.speaker_encoder)
    return semantic_tokens, global_tokens


def bicodec_detokenize(
    p, cfg: BiCodecConfig, semantic_tokens: jax.Array, global_tokens: jax.Array
) -> jax.Array:
    """(semantic (B, T), global (B, N)) → waveform (B, T * hop)
    (reference `bicodec.py:171-189`)."""
    z_q = fvq_detokenize(p["quantizer"], semantic_tokens)
    d_vector = speaker_encoder_detokenize(p["speaker_encoder"], global_tokens, cfg.speaker_encoder)
    x = feat_decoder_apply(p["prenet"], z_q, cfg.prenet, cond=d_vector)
    x = x + d_vector[:, None, :]
    wav = wave_generator_apply(p["decoder"], x, cfg.decoder)
    return wav[..., 0]  # (B, T, 1) → (B, T)


def detokenize_receptive_field(cfg: BiCodecConfig) -> int:
    """One-sided receptive field of `bicodec_detokenize`, in input latent
    frames (rounded up).

    The detokenize path is purely convolutional — FVQ/FSQ lookups and the
    d-vector conditioning are per-frame or global constants — so an output
    sample at time t depends on input frames [t - RF, t + RF] only.  A
    streaming server can therefore vocode a token window with RF frames of
    left context and emit a tail that is sample-identical to a full-prefix
    recompute (serve/continuous_server.py), turning per-chunk vocode cost
    from O(stream length) into O(chunk + RF).

    Accounting (upper bound; `up` is the cumulative upsampling factor of the
    domain a conv runs in, relative to the detokenize input frame rate):
    a conv with one-sided reach of r samples in a ×up domain reaches r/up
    input frames.  VocosBackbone = embed conv k7 + num_layers dwconv k7
    (nn/vocos.py); SamplingBlock upsamplers reach ≲1 frame of their own
    input; WaveGenerator blocks = transposed conv (k, s) + 3 residual units
    k7 with dilations 1/3/9 (codec/wave_generator.py).
    """
    import math

    def vocos_rf(num_layers: int) -> float:
        return 3.0 + 3.0 * num_layers

    rf = 0.0
    up = 1.0
    pre = cfg.prenet
    for ratio in pre.sample_ratios:
        if ratio > 1:
            # sampler deconv (nn/sampling.py): k = 2·ratio, pad = ⌈ratio/2⌉,
            # stride = ratio → one-sided reach (k − 1 − pad)/ratio frames of
            # its own input: 1.0 at ratio 2 but 1.25 at 4, 1.375 at 8 — NOT
            # a constant 1 (undercounting here silently breaks the windowed
            # streaming vocode's bit-equality for large-ratio configs)
            pad = ratio // 2 + ratio % 2
            rf += ((2 * ratio - 1 - pad) / ratio) / up
            up *= ratio
        rf += vocos_rf(2) / up  # per-stage 2-layer backbone
    rf += vocos_rf(pre.vocos_num_layers) / up
    dec = cfg.decoder
    rf += 3.0 / up  # conv_in k7
    for k, s in zip(dec.kernel_sizes, dec.rates):
        rf += (k / s) / up  # transposed conv, one-sided bound
        up *= s
        rf += (3.0 * (1 + 3 + 9)) / up  # residual units k7, d = 1/3/9
    rf += 3.0 / up  # conv_out k7
    return int(math.ceil(rf))


def bicodec_forward(
    p, cfg: BiCodecConfig, feat: jax.Array, ref_wav: jax.Array
) -> Dict[str, jax.Array]:
    """Training-style forward returning reconstruction and stats
    (reference `bicodec.py:113-149`, eval path)."""
    basis = make_mel_basis(cfg.mel_params)
    mel = mel_spectrogram(ref_wav, basis)
    z = feat_encoder_apply(p["encoder"], feat, cfg.encoder)
    vq = fvq_forward(p["quantizer"], z)
    x_vector, d_vector = speaker_encoder_forward(p["speaker_encoder"], mel, cfg.speaker_encoder)

    x = feat_decoder_apply(p["prenet"], vq["z_q"], cfg.prenet, cond=d_vector)
    pred_feat = feat_decoder_apply(p["postnet"], x, cfg.postnet)
    x = x + d_vector[:, None, :]
    wav_recon = wave_generator_apply(p["decoder"], x, cfg.decoder)[..., 0]

    return {
        "recons": wav_recon,
        "pred_feat": pred_feat,
        "x_vector": x_vector,
        "d_vector": d_vector,
        "perplexity": vq["perplexity"],
        "cluster_size": vq["active_num"],
        "semantic_indices": vq["indices"],
    }
