"""Config loading tests: YAML base_config merge, dataclass mapping, token
formatters."""

import numpy as np

from sparktts_tpu.config import (
    MelParams,
    bicodec_config_from_dict,
    load_yaml_config,
    qwen_config_from_dict,
    tiny_test_config,
)
from sparktts_tpu.utils.tokens import TokenParser


def test_yaml_base_config_merge(tmp_path):
    (tmp_path / "base.yaml").write_text("sample_rate: 16000\nvolume_normalize: true\n")
    (tmp_path / "child.yaml").write_text(
        "base_config: base.yaml\nvolume_normalize: false\nlatent_hop_length: 320\n"
    )
    cfg = load_yaml_config(tmp_path / "child.yaml")
    assert cfg["sample_rate"] == 16000          # inherited
    assert cfg["volume_normalize"] is False     # overridden
    assert cfg["latent_hop_length"] == 320


def test_bicodec_config_from_dict():
    d = {
        "audio_tokenizer": {
            "mel_params": {"sample_rate": 16000, "n_fft": 512, "num_mels": 64,
                           "win_length": 320, "hop_length": 160, "mel_fmin": 10},
            "encoder": {"input_channels": 128, "vocos_dim": 64,
                        "vocos_intermediate_dim": 256, "vocos_num_layers": 4,
                        "out_channels": 96, "sample_ratios": [2, 2]},
        }
    }
    cfg = bicodec_config_from_dict(d)
    assert cfg.mel_params.n_fft == 512
    assert cfg.encoder.sample_ratios == (2, 2)   # list → tuple
    # unspecified sections keep defaults
    assert cfg.decoder.rates == (8, 5, 4, 2)


def test_qwen_config_from_hf_dict():
    cfg = qwen_config_from_dict(
        {
            "vocab_size": 1000,
            "hidden_size": 64,
            "num_attention_heads": 4,
            "num_hidden_layers": 2,
            "eos_token_id": [7, 8],
            "unknown_field": "ignored",
        }
    )
    assert cfg.vocab_size == 1000
    assert cfg.head_dim == 16   # derived when absent
    assert cfg.eos_token_id == 7


def test_token_parser_formatters():
    assert TokenParser.task("tts") == "<|task_tts|>"
    assert TokenParser.gender("female") == "<|gender_0|>"
    assert TokenParser.mel_level("high") == "<|pitch_label_3|>"
    assert TokenParser.speed_level("very_low") == "<|speed_label_0|>"
    assert TokenParser.emotion("HAPPY") == "<|emotion_3|>"
    assert TokenParser.age("Elderly") == "<|age_4|>"
    # clamping
    assert TokenParser.mel_value(5000) == "<|pitch_value_1000|>"
    assert TokenParser.loudness_value(-5) == "<|loudness_value_0|>"


def test_tiny_config_consistency():
    cfg = tiny_test_config()
    # encoder output feeds the quantizer
    assert cfg.bicodec.encoder.out_channels == cfg.bicodec.quantizer.input_dim
    # prenet condition dim matches speaker out dim
    assert cfg.bicodec.prenet.condition_dim == cfg.bicodec.speaker_encoder.out_dim
    # mel bins match the speaker encoder input
    assert cfg.bicodec.mel_params.num_mels == cfg.bicodec.speaker_encoder.input_dim
