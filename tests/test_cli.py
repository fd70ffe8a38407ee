"""CLI entry point tests (reference `cli/inference.py` behaviors)."""

import numpy as np
import pytest

from sparktts_tpu.cli import parse_args, run_tts


@pytest.fixture(scope="module")
def prompt_wav(tmp_path_factory):
    from sparktts_tpu.io.audio import write_wav

    sr = 16000
    t = np.arange(sr) / sr
    path = tmp_path_factory.mktemp("cli") / "p.wav"
    write_wav(path, 0.3 * np.sin(2 * np.pi * 180 * t), sr)
    return str(path)


def test_parse_args_defaults():
    args = parse_args(["--text", "hi"])
    assert args.temperature == 0.8 and args.top_k == 50 and args.top_p == 0.95
    assert args.max_new_tokens == 3000


def test_cli_voice_clone(prompt_wav, tmp_path):
    args = parse_args(
        [
            "--text",
            "hello",
            "--prompt_speech_path",
            prompt_wav,
            "--save_dir",
            str(tmp_path),
            "--max_new_tokens",
            "12",
        ]
    )
    out = run_tts(args)
    assert out.endswith(".wav")
    from sparktts_tpu.io.audio import read_wav

    wav, sr = read_wav(out)
    assert sr == 16000


def test_cli_controllable(tmp_path):
    args = parse_args(
        [
            "--text",
            "hello",
            "--gender",
            "male",
            "--pitch",
            "low",
            "--speed",
            "high",
            "--save_dir",
            str(tmp_path),
            "--max_new_tokens",
            "12",
        ]
    )
    out = run_tts(args)
    assert out.endswith(".wav")
