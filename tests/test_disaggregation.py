"""Disaggregated serving: the codec stack on its own device (conftest forces
8 virtual CPU devices, so device 1 plays the second chip)."""

import asyncio

import jax
import numpy as np
import pytest

from sparktts_tpu.pipeline import SparkTTSPipeline


@pytest.fixture(scope="module")
def prompt_wav(tmp_path_factory):
    from sparktts_tpu.io.audio import write_wav

    sr = 16000
    rng = np.random.default_rng(1)
    path = tmp_path_factory.mktemp("disagg") / "p.wav"
    write_wav(path, (0.2 * rng.standard_normal(sr)).astype(np.float32), sr)
    return str(path)


def test_codec_device_placement_and_equivalence(prompt_wav):
    devices = jax.devices()
    assert len(devices) >= 2, "conftest should provide 8 virtual devices"

    base = SparkTTSPipeline(max_new_tokens=16, prompt_bucket=32)
    split = SparkTTSPipeline(
        max_new_tokens=16, prompt_bucket=32, codec_device=devices[1]
    )

    # codec params live on device 1, LM params on device 0
    bc_leaf = jax.tree.leaves(split.bicodec_params)[0]
    lm_leaf = jax.tree.leaves(split.llm_params)[0]
    assert bc_leaf.devices() == {devices[1]}
    assert lm_leaf.devices() == {devices[0]}

    # end-to-end equivalence: same seed/params → identical waveform
    w0 = base.inference("device split", prompt_speech_path=prompt_wav, greedy=True)
    w1 = split.inference("device split", prompt_speech_path=prompt_wav, greedy=True)
    np.testing.assert_array_equal(w0, w1)


def test_disaggregated_continuous_server(prompt_wav):
    """The continuous server's decode (device 0) and vocode (device 1)
    dispatch to different devices; streaming output must be unchanged."""
    from sparktts_tpu.serve.continuous_server import ContinuousTTSServer

    devices = jax.devices()
    pipe = SparkTTSPipeline(
        max_new_tokens=16, prompt_bucket=32, codec_device=devices[1]
    )

    async def run():
        server = ContinuousTTSServer(pipe, max_slots=2, steps_per_dispatch=6)
        await server.start()
        wav = await server.synthesize("split serve", prompt_wav=None, gender="female",
                                      pitch="moderate", speed="moderate")
        chunks = []
        async for c in server.synthesize_streaming(
            "split stream", gender="male", pitch="moderate", speed="moderate"
        ):
            chunks.append(c)
        await server.stop()
        return wav, chunks

    wav, chunks = asyncio.new_event_loop().run_until_complete(run())
    assert np.isfinite(wav).all()
    assert len(chunks) >= 1 and all(np.isfinite(c).all() for c in chunks)
