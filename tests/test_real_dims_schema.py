"""Real-checkpoint schema pinning at the published Spark-TTS-0.5B dimensions.

No Spark-TTS weights exist in this environment, so the conversion path is
pinned against the next-best authority: the REFERENCE code itself,
instantiated at the published 0.5B dims from a checked-in replica of the
checkpoint's config.yaml (tests/fixtures/spark_tts_0.5b/).  This guarantees

  * the config.yaml schema → dataclass plumbing produces exactly the dims the
    rest of the stack was built for,
  * `convert_bicodec` consumes EVERY key of the reference state dict at real
    dims (so a key-name or shape mismatch vs the published checkpoint can
    only come from the checkpoint disagreeing with the reference code that
    ships it), mirroring the reference's non-strict load reporting
    (reference `bicodec.py:100-106`),
  * the full codec runs tokenize → detokenize at real dims through the jitted
    path.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if not os.path.isdir(os.path.join(REF, "sparktts")):
    pytest.skip("reference tree unavailable", allow_module_level=True)
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402

from sparktts_tpu import checkpoint as ckpt  # noqa: E402
from sparktts_tpu.codec.bicodec import init_bicodec  # noqa: E402
from sparktts_tpu.config import (  # noqa: E402
    BiCodecConfig,
    QwenConfig,
    Wav2Vec2Config,
    bicodec_config_from_dict,
    load_spark_config,
    load_yaml_config,
)

FIXTURE = Path(__file__).parent / "fixtures" / "spark_tts_0.5b"


def test_checkpoint_yaml_produces_builtin_defaults():
    """The checked-in 0.5B config.yaml replica must round-trip through the
    loader into exactly the dataclass defaults the whole stack assumes — if
    the published checkpoint schema and our defaults ever drift, this is the
    test that says so."""
    cfg = load_spark_config(FIXTURE)
    assert cfg.bicodec == BiCodecConfig()
    assert cfg.llm == QwenConfig()
    assert cfg.wav2vec2 == Wav2Vec2Config()
    assert cfg.sample_rate == 16000
    assert cfg.latent_hop_length == 320
    assert cfg.ref_segment_duration == 6
    assert cfg.volume_normalize is True
    # consistency the checkpoint relies on: vocoder upsampling == latent hop
    up = 1
    for r in cfg.bicodec.decoder.rates:
        up *= r
    assert up == cfg.latent_hop_length


class _TrackedState(dict):
    """State-dict wrapper recording which keys the converter read."""

    def __init__(self, base):
        super().__init__(base)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def _reference_bicodec_state_at_real_dims() -> dict:
    """Instantiate the six reference torch modules exactly the way
    BiCodec.load_from_checkpoint does (reference `bicodec.py:80-88`) at the
    published dims, and return the composite-prefixed state dict (the
    composite itself needs torchaudio for its mel buffer, absent here)."""
    from sparktts.modules.encoder_decoder.feat_decoder import Decoder
    from sparktts.modules.encoder_decoder.feat_encoder import Encoder
    from sparktts.modules.encoder_decoder.wave_generator import WaveGenerator
    from sparktts.modules.speaker.speaker_encoder import SpeakerEncoder
    from sparktts.modules.vq.factorized_vector_quantize import (
        FactorizedVectorQuantize,
    )

    at = load_yaml_config(FIXTURE / "BiCodec" / "config.yaml")["audio_tokenizer"]
    torch.manual_seed(0)
    modules = {
        "encoder": Encoder(**at["encoder"]),
        "quantizer": FactorizedVectorQuantize(**at["quantizer"]),
        "speaker_encoder": SpeakerEncoder(**at["speaker_encoder"]),
        "prenet": Decoder(**at["prenet"]),
        "postnet": Decoder(**at["postnet"]),
        "decoder": WaveGenerator(**at["decoder"]),
    }
    sd = {}
    for name, mod in modules.items():
        for k, v in mod.state_dict().items():
            sd[f"{name}.{k}"] = v.detach().cpu().numpy()
    return sd


# buffers the inference converter legitimately skips: training-time EMA /
# BN batch counters (the reference's own non-strict load tolerates exactly
# this class of key, bicodec.py:100-106)
_ALLOWED_UNCONSUMED_SUFFIXES = (
    ".num_batches_tracked",
    "quantizer.cluster_size",
)


def test_reference_state_dict_fully_consumed_at_real_dims():
    sd = _reference_bicodec_state_at_real_dims()
    cfg = bicodec_config_from_dict(
        load_yaml_config(FIXTURE / "BiCodec" / "config.yaml")
    )
    tracked = _TrackedState(sd)
    params = ckpt.convert_bicodec(tracked, cfg)

    leftovers = {
        k
        for k in set(tracked) - tracked.read
        if not any(k.endswith(s) or k == s for s in _ALLOWED_UNCONSUMED_SUFFIXES)
    }
    assert not leftovers, f"checkpoint keys not consumed: {sorted(leftovers)[:20]}"

    # converted tree must be shape-identical to the random-init tree the
    # rest of the stack builds for this config
    init = init_bicodec(jax.random.PRNGKey(0), cfg)
    conv_shapes = jax.tree.map(lambda x: tuple(np.shape(x)), params)
    init_shapes = jax.tree.map(lambda x: tuple(np.shape(x)), init)
    assert conv_shapes == init_shapes


def test_codec_runs_at_real_dims():
    """tokenize → detokenize through the jitted codec at the published dims
    (converted reference weights, 0.4 s of audio)."""
    import jax.numpy as jnp

    from sparktts_tpu.codec.bicodec import bicodec_detokenize, bicodec_tokenize

    sd = _reference_bicodec_state_at_real_dims()
    cfg = bicodec_config_from_dict(
        load_yaml_config(FIXTURE / "BiCodec" / "config.yaml")
    )
    params = jax.tree.map(jnp.asarray, ckpt.convert_bicodec(_TrackedState(sd), cfg))

    rng = np.random.default_rng(0)
    t_frames = 20  # 0.4 s at 50 Hz
    feats = jnp.asarray(rng.standard_normal((1, t_frames, 1024)), jnp.float32)
    ref_wav = jnp.asarray(rng.standard_normal((1, 16000)), jnp.float32) * 0.1

    sem, glob = bicodec_tokenize(params, cfg, feats, ref_wav)
    assert sem.shape == (1, t_frames)
    assert glob.shape == (1, cfg.speaker_encoder.token_num)
    assert int(sem.max()) < cfg.quantizer.codebook_size
    n_codes = 1
    for lv in cfg.speaker_encoder.fsq_levels:
        n_codes *= lv
    assert int(glob.max()) < n_codes

    wav = bicodec_detokenize(params, cfg, sem, glob)
    up = 1
    for r in cfg.decoder.rates:
        up *= r
    assert wav.shape[-1] == t_frames * up
    assert np.isfinite(np.asarray(wav)).all()
