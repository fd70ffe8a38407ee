"""Configuration tree for the Spark-TTS TPU stack.

A single dataclass hierarchy replaces the reference's three config mechanisms
(OmegaConf YAML, argparse, Triton pbtxt templates — see reference
`sparktts/utils/file.py:116-130`, `cli/inference.py:28-61`).  Model
hyper-parameters are loaded from the same checkpoint ``config.yaml`` the
reference reads (reference `sparktts/models/bicodec.py:80-88`); the embedded
defaults below mirror the published Spark-TTS-0.5B checkpoint so that the full
stack can be instantiated (random-init) without a checkpoint present.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional, Tuple


# ---------------------------------------------------------------------------
# BiCodec
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MelParams:
    """Mel-spectrogram frontend (reference `bicodec.py:191-211`)."""

    sample_rate: int = 16000
    n_fft: int = 1024
    win_length: int = 640
    hop_length: int = 320
    mel_fmin: float = 10.0
    mel_fmax: Optional[float] = None
    num_mels: int = 128


@dataclass(frozen=True)
class EncoderConfig:
    """Feat encoder (reference `feat_encoder.py:26-87`)."""

    input_channels: int = 1024
    vocos_dim: int = 384
    vocos_intermediate_dim: int = 2048
    vocos_num_layers: int = 12
    out_channels: int = 1024
    sample_ratios: Tuple[int, ...] = (1, 1)


@dataclass(frozen=True)
class DecoderConfig:
    """Feat decoder used for prenet/postnet (reference `feat_decoder.py:26-94`)."""

    input_channels: int = 1024
    vocos_dim: int = 384
    vocos_intermediate_dim: int = 2048
    vocos_num_layers: int = 12
    out_channels: int = 1024
    condition_dim: Optional[int] = None
    sample_ratios: Tuple[int, ...] = (1, 1)
    use_tanh_at_final: bool = False


@dataclass(frozen=True)
class WaveGeneratorConfig:
    """DAC-style vocoder (reference `wave_generator.py:56-88`)."""

    input_channel: int = 1024
    channels: int = 1536
    rates: Tuple[int, ...] = (8, 5, 4, 2)
    kernel_sizes: Tuple[int, ...] = (16, 11, 8, 4)
    d_out: int = 1


@dataclass(frozen=True)
class QuantizerConfig:
    """Factorized VQ (reference `factorized_vector_quantize.py:36-68`)."""

    input_dim: int = 1024
    codebook_size: int = 8192
    codebook_dim: int = 8
    commitment: float = 0.25
    codebook_loss_weight: float = 2.0
    decay: float = 0.99
    threshold_ema_dead_code: float = 0.2


@dataclass(frozen=True)
class SpeakerEncoderConfig:
    """Speaker encoder (reference `speaker_encoder.py:44-69`)."""

    input_dim: int = 128          # mel bins
    out_dim: int = 1024           # x-vector / d-vector dim
    latent_dim: int = 128
    token_num: int = 32
    fsq_levels: Tuple[int, ...] = (4, 4, 4, 4, 4, 4)
    fsq_num_quantizers: int = 1
    # ECAPA internals (reference `ecapa_tdnn.py:242-250`: GLOB_c512 factory)
    ecapa_channels: int = 512
    # Perceiver internals (reference `speaker_encoder.py:58-60`)
    perceiver_dim_context: int = 512 * 3
    perceiver_depth: int = 2
    perceiver_dim_head: int = 64
    perceiver_heads: int = 8
    perceiver_ff_mult: int = 4


@dataclass(frozen=True)
class BiCodecConfig:
    mel_params: MelParams = field(default_factory=MelParams)
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    quantizer: QuantizerConfig = field(default_factory=QuantizerConfig)
    prenet: DecoderConfig = field(
        default_factory=lambda: DecoderConfig(condition_dim=1024)
    )
    postnet: DecoderConfig = field(
        default_factory=lambda: DecoderConfig(vocos_num_layers=6, out_channels=128)
    )
    decoder: WaveGeneratorConfig = field(default_factory=WaveGeneratorConfig)
    speaker_encoder: SpeakerEncoderConfig = field(default_factory=SpeakerEncoderConfig)


# ---------------------------------------------------------------------------
# wav2vec2 feature extractor
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Wav2Vec2Config:
    """wav2vec2-large-xlsr-53 (HF config.json fields we need).

    The reference uses HF `Wav2Vec2Model` with output_hidden_states and mixes
    hidden states 11/14/16 (reference `audio_tokenizer.py:85-99`).
    """

    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = True
    feat_extract_norm: str = "layer"   # xlsr-53 uses per-conv LayerNorm
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    layer_norm_eps: float = 1e-5
    do_stable_layer_norm: bool = True
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    feat_proj_layer_norm: bool = True
    # which hidden states feed the codec encoder
    hidden_state_mix: Tuple[int, ...] = (11, 14, 16)
    # host-side feature normalization (Wav2Vec2FeatureExtractor do_normalize)
    do_normalize: bool = True


# ---------------------------------------------------------------------------
# Qwen2.5 LM
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class QwenConfig:
    """Qwen2.5-0.5B with the Spark-TTS extended vocabulary.

    Field names follow the HF `config.json` of the checkpoint's LLM/ directory
    (reference `cli/SparkTTS.py:48-49` loads it via AutoModelForCausalLM).
    """

    vocab_size: int = 166000
    hidden_size: int = 896
    intermediate_size: int = 4864
    num_hidden_layers: int = 24
    num_attention_heads: int = 14
    num_key_value_heads: int = 2
    head_dim: int = 64
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    max_position_embeddings: int = 32768
    tie_word_embeddings: bool = True
    eos_token_id: int = 151645
    pad_token_id: int = 151643


@dataclass(frozen=True)
class SamplingConfig:
    """LLM sampling defaults (reference `cli/SparkTTS.py:166-204`)."""

    temperature: float = 0.8
    top_k: int = 50
    top_p: float = 0.95
    max_new_tokens: int = 3000


# ---------------------------------------------------------------------------
# Streaming serving (reference Triton BLS schedule, `spark_tts/1/model.py`)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class StreamingConfig:
    audio_chunk_duration: float = 1.0
    max_audio_chunk_duration: float = 30.0
    audio_chunk_size_scale_factor: float = 8.0
    audio_chunk_overlap_duration: float = 0.1
    frame_rate: int = 50


# ---------------------------------------------------------------------------
# Top-level
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SparkTTSConfig:
    sample_rate: int = 16000
    highpass_cutoff_freq: int = 40
    latent_hop_length: int = 320
    ref_segment_duration: float = 6.0
    volume_normalize: bool = True
    bicodec: BiCodecConfig = field(default_factory=BiCodecConfig)
    wav2vec2: Wav2Vec2Config = field(default_factory=Wav2Vec2Config)
    llm: QwenConfig = field(default_factory=QwenConfig)
    sampling: SamplingConfig = field(default_factory=SamplingConfig)
    streaming: StreamingConfig = field(default_factory=StreamingConfig)


# ---------------------------------------------------------------------------
# YAML loading (checkpoint config.yaml → dataclasses)
# ---------------------------------------------------------------------------


def _filter_kwargs(cls, d: Dict[str, Any]) -> Dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    out = {}
    for k, v in d.items():
        if k not in names:
            continue
        if isinstance(v, list):
            v = tuple(v)
        out[k] = v
    return out


def load_yaml_config(path: str | Path) -> Dict[str, Any]:
    """Load a checkpoint config.yaml, resolving recursive ``base_config``
    includes the way the reference does (reference `sparktts/utils/file.py:116-130`)."""
    import yaml

    path = Path(path)
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    base = cfg.pop("base_config", None)
    if base:
        base_path = Path(base)
        if not base_path.is_absolute():
            base_path = path.parent / base_path
        merged = load_yaml_config(base_path)
        merged.update(cfg)
        cfg = merged
    return cfg


def bicodec_config_from_dict(cfg: Dict[str, Any]) -> BiCodecConfig:
    """Build a BiCodecConfig from the ``audio_tokenizer`` section of the
    checkpoint config.yaml (keys match reference `bicodec.py:81-88`)."""
    at = cfg.get("audio_tokenizer", cfg)
    kw: Dict[str, Any] = {}
    if "mel_params" in at:
        kw["mel_params"] = MelParams(**_filter_kwargs(MelParams, at["mel_params"]))
    if "encoder" in at:
        kw["encoder"] = EncoderConfig(**_filter_kwargs(EncoderConfig, at["encoder"]))
    if "quantizer" in at:
        kw["quantizer"] = QuantizerConfig(**_filter_kwargs(QuantizerConfig, at["quantizer"]))
    if "prenet" in at:
        kw["prenet"] = DecoderConfig(**_filter_kwargs(DecoderConfig, at["prenet"]))
    if "postnet" in at:
        kw["postnet"] = DecoderConfig(**_filter_kwargs(DecoderConfig, at["postnet"]))
    if "decoder" in at:
        kw["decoder"] = WaveGeneratorConfig(**_filter_kwargs(WaveGeneratorConfig, at["decoder"]))
    if "speaker_encoder" in at:
        kw["speaker_encoder"] = SpeakerEncoderConfig(
            **_filter_kwargs(SpeakerEncoderConfig, at["speaker_encoder"])
        )
    return BiCodecConfig(**kw)


def qwen_config_from_dict(cfg: Dict[str, Any]) -> QwenConfig:
    """Build a QwenConfig from a HF config.json dict."""
    kw = _filter_kwargs(QwenConfig, cfg)
    if "head_dim" not in cfg and "hidden_size" in cfg and "num_attention_heads" in cfg:
        kw["head_dim"] = cfg["hidden_size"] // cfg["num_attention_heads"]
    eos = cfg.get("eos_token_id")
    if isinstance(eos, list):
        kw["eos_token_id"] = eos[0]
    return QwenConfig(**kw)


def wav2vec2_config_from_dict(cfg: Dict[str, Any]) -> Wav2Vec2Config:
    return Wav2Vec2Config(**_filter_kwargs(Wav2Vec2Config, cfg))


def load_spark_config(model_dir: str | Path) -> SparkTTSConfig:
    """Load the full SparkTTSConfig from a checkpoint directory laid out like
    the reference's pretrained_models/Spark-TTS-0.5B (config.yaml + BiCodec/ +
    LLM/ + wav2vec2-large-xlsr-53/)."""
    import json

    model_dir = Path(model_dir)
    root_kw: Dict[str, Any] = {}
    top_path = model_dir / "config.yaml"
    if top_path.exists():
        top = load_yaml_config(top_path)
        for k in (
            "sample_rate",
            "highpass_cutoff_freq",
            "latent_hop_length",
            "ref_segment_duration",
            "volume_normalize",
        ):
            if k in top:
                root_kw[k] = top[k]

    bicodec_path = model_dir / "BiCodec" / "config.yaml"
    if bicodec_path.exists():
        root_kw["bicodec"] = bicodec_config_from_dict(load_yaml_config(bicodec_path))
    elif top_path.exists() and "audio_tokenizer" in top:
        root_kw["bicodec"] = bicodec_config_from_dict(top)

    llm_cfg_path = model_dir / "LLM" / "config.json"
    if llm_cfg_path.exists():
        with open(llm_cfg_path) as f:
            root_kw["llm"] = qwen_config_from_dict(json.load(f))

    w2v_cfg_path = model_dir / "wav2vec2-large-xlsr-53" / "config.json"
    if w2v_cfg_path.exists():
        with open(w2v_cfg_path) as f:
            root_kw["wav2vec2"] = wav2vec2_config_from_dict(json.load(f))

    return SparkTTSConfig(**root_kw)


def tiny_test_config() -> SparkTTSConfig:
    """A drastically shrunk config for CPU unit tests: same topology, tiny dims."""
    return SparkTTSConfig(
        bicodec=BiCodecConfig(
            mel_params=MelParams(num_mels=32),
            encoder=EncoderConfig(
                input_channels=64,
                vocos_dim=32,
                vocos_intermediate_dim=64,
                vocos_num_layers=2,
                out_channels=48,
                sample_ratios=(2, 2),
            ),
            quantizer=QuantizerConfig(input_dim=48, codebook_size=64, codebook_dim=8),
            prenet=DecoderConfig(
                input_channels=48,
                vocos_dim=32,
                vocos_intermediate_dim=64,
                vocos_num_layers=2,
                out_channels=48,
                condition_dim=48,
                sample_ratios=(2, 2),
            ),
            postnet=DecoderConfig(
                input_channels=48,
                vocos_dim=32,
                vocos_intermediate_dim=64,
                vocos_num_layers=2,
                out_channels=32,
            ),
            decoder=WaveGeneratorConfig(
                input_channel=48, channels=64, rates=(4, 2), kernel_sizes=(8, 4)
            ),
            speaker_encoder=SpeakerEncoderConfig(
                input_dim=32,
                out_dim=48,
                latent_dim=16,
                token_num=4,
                fsq_levels=(4, 4, 4),
                ecapa_channels=64,
                perceiver_dim_context=64 * 3,
                perceiver_dim_head=8,
                perceiver_heads=2,
            ),
        ),
        wav2vec2=Wav2Vec2Config(
            conv_dim=(16, 16, 16),
            conv_kernel=(10, 3, 3),
            conv_stride=(5, 2, 2),
            hidden_size=64,
            num_hidden_layers=4,
            num_attention_heads=4,
            intermediate_size=128,
            num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4,
            hidden_state_mix=(1, 2, 3),
        ),
        llm=QwenConfig(
            vocab_size=512,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            eos_token_id=0,
            pad_token_id=1,
        ),
    )
