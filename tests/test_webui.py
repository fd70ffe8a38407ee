"""WebUI tests (reference webui.py:29-269 parity surface).

Gradio is not installed in this image, so the UI graph is exercised through a
minimal stub module that records Button.click wiring — the two tab callbacks
(voice clone / voice creation) then run end-to-end against the tiny pipeline.
"""

import sys
import types

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pipe():
    from sparktts_tpu.pipeline import SparkTTSPipeline

    return SparkTTSPipeline(max_new_tokens=16, prompt_bucket=32)


@pytest.fixture(scope="module")
def prompt_wav(tmp_path_factory):
    from sparktts_tpu.io.audio import write_wav

    sr = 16000
    rng = np.random.default_rng(0)
    path = tmp_path_factory.mktemp("webui") / "prompt.wav"
    write_wav(path, (0.2 * rng.standard_normal(sr)).astype(np.float32), sr)
    return str(path)


def test_run_tts_clone_and_creation(pipe, prompt_wav, tmp_path):
    from sparktts_tpu.io.audio import read_wav
    from sparktts_tpu.webui import run_tts

    out1 = run_tts(pipe, "hello", prompt_speech=prompt_wav, save_dir=str(tmp_path))
    wav, sr = read_wav(out1)
    assert sr == pipe.sample_rate and len(wav) > 0

    out2 = run_tts(
        pipe, "hello", gender="female", pitch="moderate", speed="high",
        save_dir=str(tmp_path),
    )
    wav2, _ = read_wav(out2)
    assert len(wav2) > 0


def _make_gradio_stub(clicks):
    gr = types.ModuleType("gradio")

    class Component:
        def __init__(self, *a, **k):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class Button(Component):
        def click(self, fn, inputs=None, outputs=None):
            clicks.append((fn, inputs, outputs))

    for name in ("Blocks", "Tabs", "TabItem", "Row", "HTML", "Audio", "Textbox",
                 "Radio", "Slider"):
        setattr(gr, name, type(name, (Component,), {}))
    gr.Button = Button
    return gr


def test_build_ui_wires_two_tabs_and_callbacks_run(prompt_wav, tmp_path, monkeypatch):
    """build_ui under a stub gradio: both tab callbacks must be wired and
    produce playable wav files through the real pipeline."""
    import sparktts_tpu.webui as webui
    from sparktts_tpu.io.audio import read_wav

    clicks = []
    monkeypatch.setitem(sys.modules, "gradio", _make_gradio_stub(clicks))
    # route run_tts output into tmp_path (default save_dir is repo-relative)
    orig_run_tts = webui.run_tts
    monkeypatch.setattr(
        webui, "run_tts",
        lambda model, text, **kw: orig_run_tts(
            model, text, **{**kw, "save_dir": str(tmp_path)}
        ),
    )
    demo = webui.build_ui(model_dir=None, max_new_tokens=16)
    assert demo is not None
    assert len(clicks) == 2, "expected one click handler per tab"

    voice_clone, clone_inputs, _ = clicks[0]
    assert len(clone_inputs) == 4  # text, prompt_text, upload, record
    path = voice_clone("hi there", "", prompt_wav, None)
    wav, _ = read_wav(path)
    assert len(wav) > 0

    voice_creation, creation_inputs, _ = clicks[1]
    assert len(creation_inputs) == 4  # text, gender, pitch, speed
    path2 = voice_creation("hi there", "male", 3, 4)
    wav2, _ = read_wav(path2)
    assert len(wav2) > 0


def test_build_ui_without_gradio_raises_helpful_error(monkeypatch):
    import sparktts_tpu.webui as webui

    monkeypatch.setitem(sys.modules, "gradio", None)
    with pytest.raises(ImportError, match="gradio is not installed"):
        webui.build_ui()
